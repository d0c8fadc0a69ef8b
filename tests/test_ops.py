"""Parity tests for core ops against torch-CPU oracles.

torch here is used purely as a numerical oracle for standard operator
semantics (grid_sample, avg_pool2d, interpolate) that the reference relied
on — none of the reference's code is involved.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vid2vid_tpu.ops import (
    avg_pool_2x2,
    avg_pool_3x3s2,
    build_pyramid,
    channel_norm,
    correlation_ref,
    fg_mask_from_onehot,
    flow_warp,
    instance_edges,
    label_one_hot,
    resize_bilinear,
)


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


class TestFlowWarp:
    @pytest.mark.parametrize("h,w", [(8, 8), (13, 17), (32, 64)])
    def test_matches_torch_grid_sample(self, rng, h, w):
        b, c = 2, 3
        img = rng.standard_normal((b, c, h, w)).astype(np.float32)
        flow = (rng.standard_normal((b, 2, h, w)) * 3).astype(np.float32)

        # torch oracle: the reference's get_grid + grid_sample construction
        # (normalized [-1,1] linspace grid + flow / ((size-1)/2), border,
        # align_corners=True).
        hor = torch.linspace(-1.0, 1.0, w).view(1, 1, 1, w).expand(b, 1, h, w)
        ver = torch.linspace(-1.0, 1.0, h).view(1, 1, h, 1).expand(b, 1, h, w)
        grid = torch.cat([hor, ver], 1)
        tflow = torch.from_numpy(flow)
        tflow = torch.cat(
            [tflow[:, 0:1] / ((w - 1.0) / 2.0), tflow[:, 1:2] / ((h - 1.0) / 2.0)],
            dim=1,
        )
        final_grid = (grid + tflow).permute(0, 2, 3, 1)
        expected = F.grid_sample(
            torch.from_numpy(img),
            final_grid,
            mode="bilinear",
            padding_mode="border",
            align_corners=True,
        ).numpy()

        got = flow_warp(
            jnp.asarray(to_nhwc(img)), jnp.asarray(to_nhwc(flow))
        )
        # tolerance: the torch oracle round-trips through the normalized
        # [-1,1] grid; our direct pixel-space form differs by float rounding.
        np.testing.assert_allclose(to_nchw(np.asarray(got)), expected, atol=5e-5)

    def test_zero_flow_is_identity(self, rng):
        img = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
        out = flow_warp(img, jnp.zeros((1, 16, 16, 2), jnp.float32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_large_flow_clamps_to_border(self, rng):
        img = jnp.asarray(rng.standard_normal((1, 8, 8, 1)).astype(np.float32))
        flow = jnp.full((1, 8, 8, 2), 100.0)
        out = flow_warp(img, flow)
        np.testing.assert_allclose(
            np.asarray(out)[0, :, :, 0], np.asarray(img)[0, -1, -1, 0], atol=1e-6
        )

    def test_gradients_flow(self, rng):
        img = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
        flow = jnp.asarray(
            (rng.standard_normal((1, 8, 8, 2)) * 0.5).astype(np.float32)
        )
        g_img, g_flow = jax.grad(
            lambda i, f: jnp.sum(flow_warp(i, f) ** 2), argnums=(0, 1)
        )(img, flow)
        assert np.isfinite(np.asarray(g_img)).all()
        assert np.isfinite(np.asarray(g_flow)).all()
        assert np.abs(np.asarray(g_flow)).max() > 0


class TestPooling:
    @pytest.mark.parametrize("h,w", [(8, 8), (14, 18), (31, 33)])
    def test_avg_pool_3x3s2_matches_torch(self, rng, h, w):
        x = rng.standard_normal((2, 5, h, w)).astype(np.float32)
        expected = F.avg_pool2d(
            torch.from_numpy(x), 3, stride=2, padding=1, count_include_pad=False
        ).numpy()
        got = avg_pool_3x3s2(jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(to_nchw(np.asarray(got)), expected, atol=1e-5)

    def test_avg_pool_2x2_matches_torch(self, rng):
        x = rng.standard_normal((2, 3, 16, 20)).astype(np.float32)
        expected = F.avg_pool2d(torch.from_numpy(x), 2, stride=2).numpy()
        got = avg_pool_2x2(jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(to_nchw(np.asarray(got)), expected, atol=1e-5)

    def test_pyramid_shapes(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 64, 128, 3)).astype(np.float32))
        pyr = build_pyramid(x, 3)
        assert [p.shape for p in pyr] == [
            (1, 64, 128, 3),
            (1, 32, 64, 3),
            (1, 16, 32, 3),
        ]


class TestEncode:
    def test_one_hot(self):
        labels = jnp.array([[[0, 1], [2, 1]]])
        oh = label_one_hot(labels, 3)
        assert oh.shape == (1, 2, 2, 3)
        np.testing.assert_array_equal(
            np.asarray(oh[0, :, :, 1]), np.array([[0, 1], [0, 1]], np.float32)
        )

    def test_instance_edges_matches_reference_semantics(self, rng):
        inst = np.zeros((1, 6, 6), np.int32)
        inst[0, :3, :3] = 1
        # torch oracle of the reference's 4-neighbor comparison
        t = torch.from_numpy(inst)[:, None].float()
        edge = torch.zeros_like(t, dtype=torch.uint8)
        edge[:, :, :, 1:] |= (t[:, :, :, 1:] != t[:, :, :, :-1]).byte()
        edge[:, :, :, :-1] |= (t[:, :, :, 1:] != t[:, :, :, :-1]).byte()
        edge[:, :, 1:, :] |= (t[:, :, 1:, :] != t[:, :, :-1, :]).byte()
        edge[:, :, :-1, :] |= (t[:, :, 1:, :] != t[:, :, :-1, :]).byte()
        expected = edge.float().numpy()[:, 0]

        got = instance_edges(jnp.asarray(inst))
        np.testing.assert_array_equal(np.asarray(got), expected)

    def test_fg_mask(self):
        oh = label_one_hot(jnp.array([[[0, 26], [26, 1]]]), 35)
        mask = fg_mask_from_onehot(oh, [26])
        assert mask.shape == (1, 2, 2, 1)
        np.testing.assert_array_equal(
            np.asarray(mask[0, :, :, 0]), np.array([[0, 1], [1, 0]], np.float32)
        )


class TestResize:
    @pytest.mark.parametrize("shape,target", [((7, 9), (14, 18)), ((16, 16), (8, 8))])
    def test_matches_torch_bilinear(self, rng, shape, target):
        x = rng.standard_normal((2, 3) + shape).astype(np.float32)
        expected = F.interpolate(
            torch.from_numpy(x), size=target, mode="bilinear", align_corners=False
        ).numpy()
        got = resize_bilinear(jnp.asarray(to_nhwc(x)), *target)
        np.testing.assert_allclose(
            to_nchw(np.asarray(got)), expected, atol=1e-4, rtol=1e-4
        )


class TestCorrelation:
    def test_matches_naive_oracle(self, rng):
        b, h, w, c = 1, 6, 7, 4
        md, s2 = 4, 2  # small config: rad 2, 5x5 grid
        f1 = rng.standard_normal((b, h, w, c)).astype(np.float32)
        f2 = rng.standard_normal((b, h, w, c)).astype(np.float32)

        rad = md // s2
        n = 2 * rad + 1
        f2p = np.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
        expected = np.zeros((b, h, w, n * n), np.float32)
        for tj in range(-rad, rad + 1):
            for ti in range(-rad, rad + 1):
                tc = (tj + rad) * n + (ti + rad)
                dy, dx = tj * s2, ti * s2
                shifted = f2p[:, md + dy : md + dy + h, md + dx : md + dx + w]
                expected[..., tc] = (f1 * shifted).sum(-1) / c

        got = correlation_ref(
            jnp.asarray(f1), jnp.asarray(f2), max_displacement=md, stride2=s2
        )
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)

    def test_flownetc_config_shape(self, rng):
        f1 = jnp.asarray(rng.standard_normal((1, 8, 10, 16)).astype(np.float32))
        out = correlation_ref(f1, f1)
        assert out.shape == (1, 8, 10, 441)
        # zero displacement channel is the squared mean of f1 with itself
        np.testing.assert_allclose(
            np.asarray(out[..., 441 // 2]),
            np.asarray(jnp.mean(f1 * f1, -1)),
            atol=1e-5,
        )


class TestChannelNorm:
    def test_matches_formula(self, rng):
        x = rng.standard_normal((2, 4, 5, 7)).astype(np.float32)
        got = channel_norm(jnp.asarray(x))
        expected = np.sqrt((x**2).sum(-1, keepdims=True))
        np.testing.assert_allclose(np.asarray(got), expected, atol=1e-5)


class TestWarpVariantsAgree:
    def test_all_warp_formulations_bit_agree(self, rng):
        from vid2vid_tpu.ops.warp import (
            flow_warp_im2col,
            flow_warp_patch,
            flow_warp_ref,
        )

        img = jnp.asarray(rng.standard_normal((2, 24, 40, 3)).astype(np.float32))
        flow = jnp.asarray(
            (rng.standard_normal((2, 24, 40, 2)) * 9).astype(np.float32)
        )
        ref = np.asarray(flow_warp_ref(img, flow))
        np.testing.assert_allclose(
            np.asarray(flow_warp_patch(img, flow)), ref, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(flow_warp_im2col(img, flow)), ref, atol=1e-6
        )

    def test_custom_vjp_matches_ref_autodiff(self, rng):
        """flow_warp's patch-formulation backward == autodiff of the ref warp.

        flow_warp routes its backward through flow_warp_patch's VJP (the
        im2col backward NaNs TPU training at the 1024x1024 crop config —
        see ops/warp.py docstring). This pins the custom backward to the
        plain autodiff gradients, including out-of-bounds flows where the
        border clamp zeroes the flow gradient.
        """
        from vid2vid_tpu.ops.warp import flow_warp_ref

        img = jnp.asarray(rng.standard_normal((2, 12, 20, 3)).astype(np.float32))
        flow = np.asarray(
            (rng.standard_normal((2, 12, 20, 2)) * 5).astype(np.float32)
        )
        flow[0, :3, :3, 0] = 50.0  # clamped far out of bounds
        flow[1, -3:, -3:, 1] = -50.0
        flow = jnp.asarray(flow)
        ct = jnp.asarray(rng.standard_normal((2, 12, 20, 3)).astype(np.float32))

        def loss(fn, i, f):
            return jnp.sum(fn(i, f) * ct)

        g_ref = jax.grad(lambda i, f: loss(flow_warp_ref, i, f), (0, 1))(img, flow)
        g_got = jax.grad(lambda i, f: loss(flow_warp, i, f), (0, 1))(img, flow)
        np.testing.assert_allclose(
            np.asarray(g_got[0]), np.asarray(g_ref[0]), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(g_got[1]), np.asarray(g_ref[1]), atol=2e-5
        )

    def test_large_f32_dispatches_away_from_im2col(self, monkeypatch):
        """Regression for the round-5 TPU miscompile: flow_warp's im2col
        gather returns ~20% NaN for FLOAT32 images at H*W >= ~1024^2 on
        v5e (f32 512x512 and all bf16 shapes are clean; bisected live —
        ops/warp.py::_use_patch_forward). The miscompile is TPU-only so
        CPU cannot reproduce the NaNs; what CPU CAN pin is the dispatch:
        large-f32 must route to the patch formulation, bf16 and small-f32
        must keep the fast im2col path.
        """
        from vid2vid_tpu.ops import warp as W

        assert W._use_patch_forward((1, 1024, 1024, 3), jnp.float32)
        assert W._use_patch_forward((2, 2048, 1024, 3), jnp.float32)
        assert not W._use_patch_forward((1, 512, 512, 3), jnp.float32)
        assert not W._use_patch_forward((1, 2048, 1024, 3), jnp.bfloat16)
        assert not W._use_patch_forward((1, 256, 512, 3), jnp.float32)

        def poison(image, flow):  # stands in for the TPU miscompile
            return jnp.full(image.shape, jnp.nan, image.dtype)

        monkeypatch.setattr(W, "flow_warp_im2col", poison)
        big = jnp.zeros((1, 520, 520, 3), jnp.float32)  # > 512*512 px
        out = W.flow_warp(big, jnp.zeros((1, 520, 520, 2), jnp.float32))
        assert bool(jnp.isfinite(out).all()), "large f32 must avoid im2col"
        small = jnp.zeros((1, 8, 8, 3), jnp.float32)
        out = W.flow_warp(small, jnp.zeros((1, 8, 8, 2), jnp.float32))
        assert bool(jnp.isnan(out).all()), "small f32 should still use im2col"


class TestConv7Pallas:
    def test_interpret_matches_xla(self, rng):
        from vid2vid_tpu.ops.conv7_pallas import conv7_pallas_padded

        x = jnp.asarray(rng.standard_normal((1, 16, 128, 20)).astype(np.float32))
        k = jnp.asarray(
            (rng.standard_normal((7, 7, 20, 12)) * 0.05).astype(np.float32)
        )
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        want = jax.lax.conv_general_dilated(
            xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        got = conv7_pallas_padded(xp, k, block_rows=8, block_cols=64,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_conv7_reflect_fallback_and_grads(self, rng):
        """On CPU conv7_reflect uses the XLA path; grads flow through the
        custom VJP and equal the plain conv's grads."""
        from vid2vid_tpu.ops.conv7_pallas import (
            _conv7_reflect_xla,
            conv7_reflect,
        )

        x = jnp.asarray(rng.standard_normal((1, 12, 16, 5)).astype(np.float32))
        k = jnp.asarray(
            (rng.standard_normal((7, 7, 5, 4)) * 0.05).astype(np.float32)
        )
        np.testing.assert_allclose(
            np.asarray(conv7_reflect(x, k)),
            np.asarray(_conv7_reflect_xla(x, k)),
            atol=1e-6,
        )
        gx, gk = jax.grad(lambda x, k: jnp.sum(conv7_reflect(x, k) ** 2),
                          argnums=(0, 1))(x, k)
        wx, wk = jax.grad(
            lambda x, k: jnp.sum(_conv7_reflect_xla(x, k) ** 2), argnums=(0, 1)
        )(x, k)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(wx), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(wk), atol=1e-4)


class TestOnehotStem:
    def test_gather_formulation_matches_dense_conv(self, rng):
        """onehot_conv7 == dense 7x7 conv over the explicit one-hot stack
        (the SURVEY-hard-part-4 implicit-stem study, ops/onehot_stem.py)."""
        from vid2vid_tpu.ops.onehot_stem import dense_kernel_to_tables, onehot_conv7

        nc, t, co, h, w = 5, 3, 8, 12, 16
        labels = rng.integers(0, nc, (2, h, w, t)).astype(np.int32)
        kernel = rng.standard_normal((7, 7, t * nc, co)).astype(np.float32) * 0.1

        onehot = jax.nn.one_hot(labels, nc, dtype=jnp.float32)  # (B,H,W,T,nc)
        onehot = onehot.reshape(2, h, w, t * nc)
        dense = jax.lax.conv_general_dilated(
            onehot, jnp.asarray(kernel), (1, 1), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = onehot_conv7(
            jnp.asarray(labels), dense_kernel_to_tables(jnp.asarray(kernel), nc, t)
        )
        np.testing.assert_allclose(np.asarray(dense), np.asarray(got), atol=1e-5)


class TestTapstack:
    def test_matches_dense_conv(self, rng):
        """conv7_tapstack == VALID lax.conv on the same padded input, for
        the head shapes (small Co) and a generic one."""
        from vid2vid_tpu.ops.tapstack import conv7_tapstack

        for ci, co in [(80, 9), (13, 3), (32, 6)]:
            xp = jnp.asarray(
                rng.standard_normal((2, 14 + 6, 18 + 6, ci)).astype(np.float32)
            )
            k = jnp.asarray(
                (rng.standard_normal((7, 7, ci, co)) * 0.1).astype(np.float32)
            )
            want = jax.lax.conv_general_dilated(
                xp, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            got = conv7_tapstack(xp, k)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4,
                err_msg=f"ci={ci} co={co}",
            )

    def test_grad_matches_dense_conv(self, rng):
        from vid2vid_tpu.ops.tapstack import conv7_tapstack

        xp = jnp.asarray(rng.standard_normal((1, 12, 16, 8)).astype(np.float32))
        k = jnp.asarray((rng.standard_normal((7, 7, 8, 3)) * 0.1).astype(np.float32))

        def f_dense(xp, k):
            return jnp.sum(
                jax.lax.conv_general_dilated(
                    xp, k, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) ** 2
            )

        def f_tap(xp, k):
            return jnp.sum(conv7_tapstack(xp, k) ** 2)

        gx_d, gk_d = jax.grad(f_dense, (0, 1))(xp, k)
        gx_t, gk_t = jax.grad(f_tap, (0, 1))(xp, k)
        np.testing.assert_allclose(np.asarray(gx_t), np.asarray(gx_d), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk_t), np.asarray(gk_d), atol=1e-4)
