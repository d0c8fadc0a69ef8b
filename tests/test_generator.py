"""Tests for the sequential scale-stacked generator orchestration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vid2vid_tpu.config import Options
from vid2vid_tpu.models.generator import Vid2VidGenerator, stack_time


def small_opt(**kw):
    defaults = dict(
        label_nc=6,
        use_instance=False,
        ngf=8,
        n_downsample_G=2,
        n_blocks=2,
        n_blocks_local=1,
        n_scales_spatial=1,
        n_frames_G=3,
        norm="batch",
    )
    defaults.update(kw)
    return Options(**defaults)


class TestStackTime:
    def test_matches_torch_view_order(self, rng):
        """Channel blocks must be time-major like torch's (b,t,c,h,w).view."""
        x = rng.standard_normal((2, 3, 4, 5, 6)).astype(np.float32)  # BTHWC
        got = np.asarray(stack_time(jnp.asarray(x)))
        # torch equivalent: (b,t,c,h,w) contiguous view -> (b, t*c, h, w)
        x_nchw = np.transpose(x, (0, 1, 4, 2, 3))  # b,t,c,h,w
        expected = x_nchw.reshape(2, 18, 4, 5)
        np.testing.assert_array_equal(np.transpose(got, (0, 3, 1, 2)), expected)


class TestGenerateClip:
    @pytest.mark.parametrize("n_scales", [1, 2])
    @pytest.mark.slow
    def test_shapes_and_state(self, rng, n_scales):
        opt = small_opt(n_scales_spatial=n_scales)
        gen = Vid2VidGenerator(opt)
        b, t, h, w = 1, 4, 32, 32
        params = gen.init(jax.random.key(0), b, h, w)

        labels = jnp.asarray(
            rng.integers(0, 6, size=(b, t + 2, h, w)).astype(np.int32)
        )
        enc = gen.encode_input(labels)
        assert enc.shape == (b, t + 2, h, w, 6)

        state = gen.zero_state(b, h, w)
        outs, new_state = gen.generate_clip(params, enc, state)
        assert outs.fake.shape == (b, t, h, w, 3)
        assert outs.raw.shape == (b, t, h, w, 3)
        assert outs.flow.shape == (b, t, h, w, 2)
        assert outs.weight.shape == (b, t, h, w, 1)
        assert len(new_state) == n_scales
        assert new_state[0].shape == (b, 2, h, w, 3)
        if n_scales == 2:
            assert new_state[1].shape == (b, 2, h // 2, w // 2, 3)
        # state carries the last tG-1 generated frames at the finest level
        np.testing.assert_allclose(
            np.asarray(new_state[0]),
            np.asarray(outs.fake[:, -2:]),
            atol=1e-6,
        )

    def test_sequential_dependency(self, rng):
        """Changing an early input frame must change later outputs."""
        opt = small_opt()
        gen = Vid2VidGenerator(opt)
        b, t, h, w = 1, 4, 16, 16
        params = gen.init(jax.random.key(0), b, h, w)
        labels = rng.integers(0, 6, size=(b, t + 2, h, w)).astype(np.int32)
        enc1 = gen.encode_input(jnp.asarray(labels))
        labels2 = labels.copy()
        labels2[:, 0] = (labels2[:, 0] + 1) % 6
        enc2 = gen.encode_input(jnp.asarray(labels2))

        state = gen.zero_state(b, h, w)
        o1, _ = gen.generate_clip(params, enc1, state)
        o2, _ = gen.generate_clip(params, enc2, state)
        # frame 0 sees input frame 0 -> all subsequent frames differ through
        # the recurrence
        assert np.abs(np.asarray(o1.fake[:, -1] - o2.fake[:, -1])).max() > 1e-6

    def test_chunked_equals_full(self, rng):
        """Generating 4 frames in two 2-frame chunks == one 4-frame pass."""
        opt = small_opt()
        gen = Vid2VidGenerator(opt)
        b, h, w = 1, 16, 16
        params = gen.init(jax.random.key(0), b, h, w)
        labels = jnp.asarray(rng.integers(0, 6, size=(b, 6, h, w)).astype(np.int32))
        enc = gen.encode_input(labels)

        state = gen.zero_state(b, h, w)
        full, _ = gen.generate_clip(params, enc, state)

        state_c = gen.zero_state(b, h, w)
        out1, state_c = gen.generate_clip(params, enc[:, :4], state_c)
        out2, _ = gen.generate_clip(params, enc[:, 2:], state_c)
        chunked = np.concatenate([np.asarray(out1.fake), np.asarray(out2.fake)], 1)
        np.testing.assert_allclose(
            chunked, np.asarray(full.fake), atol=1e-5
        )

    def test_no_flow_mode(self, rng):
        opt = small_opt(no_flow=True)
        gen = Vid2VidGenerator(opt)
        b, h, w = 1, 16, 16
        params = gen.init(jax.random.key(0), b, h, w)
        labels = jnp.asarray(rng.integers(0, 6, size=(b, 4, h, w)).astype(np.int32))
        enc = gen.encode_input(labels)
        outs, _ = gen.generate_clip(params, enc, gen.zero_state(b, h, w))
        assert outs.flow is None and outs.weight is None
        np.testing.assert_array_equal(np.asarray(outs.fake), np.asarray(outs.raw))

    def test_fg_mode(self, rng):
        opt = small_opt(fg=True, fg_labels=(2,), n_downsample_G=3)
        gen = Vid2VidGenerator(opt)
        b, h, w = 1, 32, 32
        params = gen.init(jax.random.key(0), b, h, w)
        labels = jnp.asarray(rng.integers(0, 6, size=(b, 4, h, w)).astype(np.int32))
        enc = gen.encode_input(labels)
        outs, _ = gen.generate_clip(params, enc, gen.zero_state(b, h, w))
        assert outs.fake.shape == (b, 2, h, w, 3)

    def test_instance_edges_channel(self, rng):
        opt = small_opt(use_instance=True)
        gen = Vid2VidGenerator(opt)
        labels = jnp.asarray(rng.integers(0, 6, size=(1, 4, 16, 16)).astype(np.int32))
        inst = jnp.asarray(rng.integers(0, 3, size=(1, 4, 16, 16)).astype(np.int32))
        enc = gen.encode_input(labels, inst)
        assert enc.shape == (1, 4, 16, 16, 7)

    @pytest.mark.slow
    def test_gradients_flow_with_bptt(self, rng):
        opt = small_opt()
        gen = Vid2VidGenerator(opt)
        b, h, w = 1, 16, 16
        params = gen.init(jax.random.key(0), b, h, w)
        labels = jnp.asarray(rng.integers(0, 6, size=(b, 5, h, w)).astype(np.int32))
        enc = gen.encode_input(labels)
        state = gen.zero_state(b, h, w)

        def loss_fn(p):
            outs, _ = gen.generate_clip(
                p, enc, state, train=True, n_frames_bp=2
            )
            return jnp.mean(outs.fake**2)

        grads = jax.grad(loss_fn)(params)
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        assert any(np.abs(np.asarray(g)).max() > 0 for g in leaves)

    def test_jit_compiles(self, rng):
        opt = small_opt(n_scales_spatial=2)
        gen = Vid2VidGenerator(opt)
        b, h, w = 1, 32, 32
        params = gen.init(jax.random.key(0), b, h, w)
        labels = jnp.asarray(rng.integers(0, 6, size=(b, 5, h, w)).astype(np.int32))
        enc = gen.encode_input(labels)
        state = gen.zero_state(b, h, w)

        fn = jax.jit(lambda p, e, s: gen.generate_clip(p, e, s))
        outs, _ = fn(params, enc, state)
        assert outs.fake.shape == (b, 3, h, w, 3)


class TestScanMatchesEagerOracle:
    @pytest.mark.slow
    def test_scan_equals_python_loop(self, rng):
        """The lax.scan orchestration must equal an independent eager
        frame-by-frame loop implementing the reference's ordering
        (reference: models/vid2vid_model_G.py:139-196)."""
        from vid2vid_tpu.ops.encode import fg_mask_from_onehot
        from vid2vid_tpu.ops.pool import build_pyramid_video

        opt = small_opt(n_scales_spatial=2, fg=True, fg_labels=(1,),
                        n_downsample_G=3)
        gen = Vid2VidGenerator(opt)
        b, t, h, w = 1, 3, 32, 32
        params = gen.init(jax.random.key(0), b, h, w)
        labels = jnp.asarray(rng.integers(0, 6, (b, t + 2, h, w)), jnp.int32)
        enc = gen.encode_input(labels)
        state = gen.zero_state(b, h, w)

        outs, _ = gen.generate_clip(params, enc, state)

        # eager oracle with its own buffer bookkeeping
        tG, nS = 3, 2
        a_pyr = build_pyramid_video(enc, nS)
        bufs = [list(jnp.split(s, tG - 1, axis=1)) for s in state]
        fakes = []
        for ti in range(t):
            coarse = None
            for s in range(nS):
                si = nS - 1 - s
                win = a_pyr[si][:, ti : ti + tG]
                hh, ww = win.shape[2], win.shape[3]
                lab = jnp.transpose(win, (0, 2, 3, 1, 4)).reshape(b, hh, ww, -1)
                prev = jnp.concatenate(
                    [f[:, 0] for f in bufs[si]], axis=-1
                )
                mask = fg_mask_from_onehot(win[:, tG - 1], opt.fg_labels)
                if s == 0:
                    out = gen.scales[0].apply(
                        params["G0"], lab, prev, mask, False, False
                    )
                else:
                    out = gen.scales[1].apply(
                        params["G1"], lab, prev, coarse, mask, False, False
                    )
                coarse = out
                bufs[si] = bufs[si][1:] + [out.img_final[:, None]]
            fakes.append(out.img_final)

        oracle = jnp.stack(fakes, axis=1)
        np.testing.assert_allclose(
            np.asarray(outs.fake), np.asarray(oracle), atol=2e-5
        )


@pytest.mark.slow
class TestStreamingClip:
    """generate_clip_streaming == encode_input + generate_clip, exactly."""

    @pytest.mark.parametrize("n_scales,use_inst,fg", [
        (1, False, False), (2, True, True),
    ])
    def test_matches_precomputed(self, rng, n_scales, use_inst, fg):
        opt = small_opt(
            n_scales_spatial=n_scales, use_instance=use_inst,
            fg=fg, fg_labels=(2,),
        )
        gen = Vid2VidGenerator(opt)
        b, t, h, w = 1, 4, 32, 32
        params = gen.init(jax.random.key(0), b, h, w)
        tG = opt.n_frames_G
        labels = jnp.asarray(
            rng.integers(0, 6, (b, t + tG - 1, h, w)), jnp.int32
        )
        inst = (
            jnp.asarray(rng.integers(0, 3, (b, t + tG - 1, h, w)), jnp.int32)
            if use_inst else None
        )
        state = gen.zero_state(b, h, w)

        enc = gen.encode_input(labels, inst)
        outs_ref, st_ref = gen.generate_clip(params, enc, state)
        outs_str, st_str = gen.generate_clip_streaming(
            params, labels, inst, state
        )
        np.testing.assert_allclose(
            np.asarray(outs_str.fake), np.asarray(outs_ref.fake), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(outs_str.raw), np.asarray(outs_ref.raw), atol=1e-6
        )
        for a, bb in zip(jax.tree.leaves(st_str), jax.tree.leaves(st_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-6)

    def test_engine_raw_clip(self, rng):
        from vid2vid_tpu.models.inference import InferenceEngine

        opt = small_opt(n_scales_spatial=2, use_instance=True, isTrain=False)
        eng = InferenceEngine(opt)
        b, t, h, w = 1, 3, 32, 32
        params = eng.init(jax.random.key(0), b, h, w)
        tG = opt.n_frames_G
        labels = jnp.asarray(
            rng.integers(0, 6, (b, t + tG - 1, h, w)), jnp.int32
        )
        inst = jnp.asarray(rng.integers(0, 3, (b, t + tG - 1, h, w)), jnp.int32)
        state = eng.initial_state(b, h, w)
        outs_ref, _ = eng.generate_clip(params, eng.encode(labels, inst), state)
        outs_raw, _ = eng.generate_clip_raw(params, labels, inst, state)
        np.testing.assert_allclose(
            np.asarray(outs_raw.fake), np.asarray(outs_ref.fake), atol=1e-6
        )
