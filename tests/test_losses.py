"""Tests: loss functions, temporal skipped-frame indexing, loss engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vid2vid_tpu.config import Options
from vid2vid_tpu.losses import gan_loss, masked_l1, multiscale_l1
from vid2vid_tpu.models.loss_engine import LossEngine
from vid2vid_tpu.models.temporal import (
    skipped_frames,
    skipped_frames_sparse,
    skipped_flows,
)


def list_oracle(chunks, t_scales, td):
    """Independent list-based simulation of the reference's buffer slicing
    (reference: models/vid2vid_model_D.py:275-289) for index verification."""
    all_idx: list[int] = []
    results = []
    max_prev = td ** (t_scales - 1) * (td - 1)
    for chunk in chunks:
        all_idx = all_idx + list(chunk)
        length, n_new = len(all_idx), len(chunk)
        per_scale = []
        for s in range(t_scales):
            tds = td**s
            span = tds * (td - 1)
            n_groups = min(length - span, n_new)
            groups = []
            for t in range(0, max(n_groups, 0), td):
                sel = (
                    all_idx[-span - 1 :: tds]
                    if t == 0
                    else all_idx[-span - t - 1 : -t : tds]
                )
                groups.append(sel)
            per_scale.append(groups)
        results.append(per_scale)
        if length > max_prev:
            all_idx = all_idx[-max_prev:]
    return results


class TestSkippedFrames:
    @pytest.mark.parametrize("t_scales,td,n_load,n_total", [
        (3, 3, 6, 30),
        (2, 3, 4, 12),
        (3, 2, 2, 16),
    ])
    def test_matches_reference_slicing(self, t_scales, td, n_load, n_total):
        chunks = [
            list(range(i, i + n_load)) for i in range(0, n_total, n_load)
        ]
        expected = list_oracle(chunks, t_scales, td)

        b_all = None
        for ci, chunk in enumerate(chunks):
            frames = jnp.asarray(chunk, jnp.float32).reshape(1, n_load, 1, 1, 1)
            frames = jnp.broadcast_to(frames, (1, n_load, 2, 2, 1))
            b_all, skipped = skipped_frames(b_all, frames, t_scales, td)
            for s in range(t_scales):
                exp_groups = expected[ci][s]
                if not exp_groups:
                    assert skipped[s] is None
                    continue
                got = np.asarray(skipped[s][:, :, 0, 0, 0]).reshape(-1, td)
                exp = np.asarray(exp_groups, np.float32)
                np.testing.assert_array_equal(got, exp)

    def test_buffer_trim(self):
        frames = jnp.zeros((1, 10, 2, 2, 1))
        b_all, _ = skipped_frames(None, frames, 3, 3)
        assert b_all.shape[1] == 10  # not yet above max_prev=18
        b_all, _ = skipped_frames(b_all, frames, 3, 3)
        assert b_all.shape[1] == 18

    def test_sparse_groups_are_strided(self):
        """Sparse variant: scale-s groups must have stride td^s in frame ids."""
        td, t_scales, n_load = 3, 2, 6
        b_all = [None] * t_scales
        seen = {s: [] for s in range(t_scales)}
        for start in range(0, 18, n_load):
            ids = jnp.arange(start, start + n_load, dtype=jnp.float32)
            frames = jnp.broadcast_to(
                ids.reshape(1, n_load, 1, 1, 1), (1, n_load, 2, 2, 1)
            )
            b_all, skipped = skipped_frames_sparse(
                b_all, frames, t_scales, td, n_load, start
            )
            for s in range(t_scales):
                if skipped[s] is not None:
                    g = np.asarray(skipped[s][:, :, 0, 0, 0])
                    for row in g:
                        diffs = np.diff(row)
                        assert (diffs == td**s).all(), (s, row)
                        seen[s].append(row)
        assert seen[0] and seen[1]

    def test_skipped_flows_scale0(self):
        td, t_scales = 3, 2
        flow = jnp.arange(6, dtype=jnp.float32).reshape(1, 6, 1, 1, 1)
        flow = jnp.broadcast_to(flow, (1, 6, 2, 2, 2))
        conf = jnp.ones((1, 6, 2, 2, 1))
        fa, ca, fs, cs = skipped_flows(None, None, flow, conf, t_scales, td)
        assert fs[0].shape == (2, td - 1, 2, 2, 2)
        assert cs[0].shape == (2, td - 1, 2, 2, 1)


class TestLossFns:
    def test_masked_l1(self):
        a = jnp.ones((1, 4, 4, 3))
        b = jnp.zeros((1, 4, 4, 3))
        m = jnp.zeros((1, 4, 4, 1)).at[:, :2].set(1.0)
        np.testing.assert_allclose(float(masked_l1(a, b, m)), 0.5, atol=1e-6)

    def test_gan_loss_ls(self):
        pred = [[jnp.full((1, 4, 4, 1), 0.5)]]
        np.testing.assert_allclose(float(gan_loss(pred, True)), 0.25, atol=1e-6)
        np.testing.assert_allclose(float(gan_loss(pred, False)), 0.25, atol=1e-6)

    def test_gan_loss_multiscale_sums(self):
        pred = [[jnp.zeros((1, 4, 4, 1))], [jnp.zeros((1, 2, 2, 1))]]
        np.testing.assert_allclose(float(gan_loss(pred, True)), 2.0, atol=1e-6)

    def test_hinge_mode(self):
        pred = [[jnp.full((1, 2, 2, 1), -2.0)]]
        assert float(gan_loss(pred, True, "hinge")) == 3.0
        assert float(gan_loss(pred, True, "hinge", for_discriminator=False)) == 2.0

    def test_multiscale_l1(self):
        a = jnp.ones((1, 8, 8, 1))
        b = jnp.zeros((1, 8, 8, 1))
        np.testing.assert_allclose(
            float(multiscale_l1(a, b, n_scales=3)), 1.75, atol=1e-6
        )


def small_engine_opt(**kw):
    defaults = dict(
        label_nc=6,
        output_nc=3,
        ndf=8,
        num_D=2,
        n_layers_D=2,
        n_frames_D=3,
        n_scales_temporal=1,
        n_scales_spatial=1,
        norm="batch",
        fineSize=64,
        no_vgg=False,
    )
    defaults.update(kw)
    return Options(**defaults)


class TestLossEngine:
    def _tensors(self, rng, n=2, h=32, w=32):
        f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
        return dict(
            real_a=f32(n, h, w, 6),
            real_b=f32(n, h, w, 3),
            fake_b=f32(n, h, w, 3),
            fake_b_raw=f32(n, h, w, 3),
            real_b_prev=f32(n, h, w, 3),
            fake_b_prev=f32(n, h, w, 3),
            flow=f32(n, h, w, 2),
            weight=f32(n, h, w, 1),
            flow_ref=f32(n, h, w, 2),
            conf_ref=jnp.ones((n, h, w, 1)),
        )

    @pytest.mark.slow
    def test_generator_losses_finite_and_graded(self, rng):
        opt = small_engine_opt()
        eng = LossEngine(opt)
        params = eng.init(jax.random.key(0), 32, 32)
        t = self._tensors(rng)

        def total(fake_b, flow):
            losses = eng.generator_losses(
                params, t["real_a"], t["real_b"], fake_b, t["fake_b_raw"],
                t["real_b_prev"], t["fake_b_prev"], flow, t["weight"],
                t["flow_ref"], t["conf_ref"],
            )
            return LossEngine.total_g_loss(losses, [])

        loss = total(t["fake_b"], t["flow"])
        assert np.isfinite(float(loss))
        g_fake, g_flow = jax.grad(total, argnums=(0, 1))(t["fake_b"], t["flow"])
        assert np.abs(np.asarray(g_fake)).max() > 0
        assert np.abs(np.asarray(g_flow)).max() > 0

    def test_expected_loss_keys(self, rng):
        opt = small_engine_opt()
        eng = LossEngine(opt)
        params = eng.init(jax.random.key(0), 32, 32)
        t = self._tensors(rng)
        losses = eng.generator_losses(
            params, t["real_a"], t["real_b"], t["fake_b"], t["fake_b_raw"],
            t["real_b_prev"], t["fake_b_prev"], t["flow"], t["weight"],
            t["flow_ref"], t["conf_ref"],
        )
        assert set(losses) == {
            "G_VGG", "G_GAN", "G_GAN_Feat", "G_Warp", "F_Flow", "F_Warp", "W",
        }
        dl = eng.discriminator_losses(
            params, t["real_a"], t["real_b"], t["fake_b"], t["fake_b_raw"]
        )
        assert set(dl) == {"D_real", "D_fake"}

    def test_d_losses_grad_wrt_d_only(self, rng):
        opt = small_engine_opt()
        eng = LossEngine(opt)
        params = eng.init(jax.random.key(0), 32, 32)
        t = self._tensors(rng)

        def d_total(d_params, fake_b):
            p = dict(params)
            p["D"] = d_params
            losses = eng.discriminator_losses(
                p, t["real_a"], t["real_b"], fake_b, None
            )
            return LossEngine.total_d_loss(losses)

        gd, gf = jax.grad(d_total, argnums=(0, 1))(params["D"], t["fake_b"])
        assert any(np.abs(np.asarray(x)).max() > 0 for x in jax.tree.leaves(gd))
        # fake path is detached inside — no gradient to the generator side
        assert np.abs(np.asarray(gf)).max() == 0

    def test_temporal_losses(self, rng):
        opt = small_engine_opt()
        eng = LossEngine(opt)
        params = eng.init(jax.random.key(0), 32, 32)
        f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
        real_g, fake_g = f32(4, 3, 32, 32, 3), f32(4, 3, 32, 32, 3)
        flow_g = f32(4, 2, 32, 32, 2)
        gl = eng.temporal_g_losses(params, 0, real_g, fake_g, flow_g)
        dl = eng.temporal_d_losses(params, 0, real_g, fake_g, flow_g)
        assert np.isfinite(float(gl["G_T_GAN"]))
        assert np.isfinite(float(dl["D_T_real"]))

    def test_no_flow_variant(self, rng):
        opt = small_engine_opt(no_vgg=True)
        eng = LossEngine(opt)
        params = eng.init(jax.random.key(0), 32, 32)
        t = self._tensors(rng)
        losses = eng.generator_losses(
            params, t["real_a"], t["real_b"], t["fake_b"], None,
            t["real_b_prev"], t["fake_b_prev"], None, None,
            t["flow_ref"], t["conf_ref"],
        )
        assert float(losses["F_Flow"]) == 0.0
        assert float(losses["G_VGG"]) == 0.0


class TestFaceDiscriminator:
    def _engine(self):
        opt = small_engine_opt(
            add_face_disc=True, label_nc=0, input_nc=3, fineSize=32, num_D=2
        )
        eng = LossEngine(opt)
        params = eng.init(jax.random.key(0), 32, 32)
        return eng, params

    def test_face_region_found(self, rng):
        eng, params = self._engine()
        real_a = jnp.zeros((1, 32, 32, 3)).at[:, 10:20, 12:22, 2].set(1.0)
        found, y0, x0 = eng.face_region(real_a)
        assert bool(found)
        # 8x8 crop centered near (15, 17), clamped to valid range
        assert 0 <= int(y0) <= 24 and 0 <= int(x0) <= 24

    def test_face_losses_zero_when_absent(self, rng):
        eng, params = self._engine()
        f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
        real_a = jnp.full((2, 32, 32, 3), -1.0)  # no face signal
        losses = eng.discriminator_losses(
            params, real_a, f32(2, 32, 32, 3), f32(2, 32, 32, 3), None
        )
        assert float(losses["D_f_real"]) == 0.0
        assert float(losses["D_f_fake"]) == 0.0

    def test_face_losses_active_and_graded(self, rng):
        eng, params = self._engine()
        f32 = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
        real_a = jnp.zeros((2, 32, 32, 3)).at[:, 8:24, 8:24, 2].set(1.0)
        real_b = f32(2, 32, 32, 3)
        fake_b = f32(2, 32, 32, 3)

        def g_total(fb):
            losses = eng.generator_losses(
                params, real_a, real_b, fb, None, real_b, real_b,
                None, None, f32(2, 32, 32, 2), jnp.ones((2, 32, 32, 1)),
            )
            return losses["G_f_GAN"] + losses["G_f_GAN_Feat"]

        val = float(g_total(fake_b))
        assert np.isfinite(val) and val != 0.0
        grad = jax.grad(g_total)(fake_b)
        assert np.abs(np.asarray(grad)).max() > 0
