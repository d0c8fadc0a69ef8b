"""Parity tests for the 3x3 im2col-K Pallas kernel (`ops/conv3_pallas.py`).

The kernel is an in-tree measured study (standalone win, end-to-end
negative — see the module docstring / PERF.md), not the production conv
path. On CPU `conv3_padded` falls back to the XLA conv, so the Pallas
body itself is exercised here through interpret mode at small shapes;
the TPU path runs the identical kernel code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vid2vid_tpu.ops.conv3_pallas import (
    conv3_fused_padded,
    conv3_padded,
    conv3_pallas_padded,
    pick_blocks,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _xla(xp, k):
    return jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


class TestConv3Pallas:
    def test_interpret_matches_xla(self, rng):
        for (h, w, ci, co, br, tw) in [
            (8, 32, 128, 16, 8, 32),
            (16, 64, 128, 128, 8, 32),
            (8, 32, 256, 64, 8, 32),
        ]:
            xp = jnp.asarray(
                rng.standard_normal((2, h + 2, w + 2, ci)).astype(np.float32)
            )
            k = jnp.asarray(
                (rng.standard_normal((3, 3, ci, co)) * 0.1).astype(np.float32)
            )
            got = conv3_pallas_padded(xp, k, br, tw, interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(_xla(xp, k)), atol=2e-4, rtol=1e-4,
                err_msg=f"{h}x{w} {ci}->{co}",
            )

    def test_dispatch_fallback_matches_xla(self, rng):
        # CPU backend: conv3_padded must route to XLA and be exact; odd
        # channel counts must also fall back regardless of backend
        for ci in (8, 128):
            xp = jnp.asarray(
                rng.standard_normal((1, 10, 18, ci)).astype(np.float32)
            )
            k = jnp.asarray(
                (rng.standard_normal((3, 3, ci, 12)) * 0.1).astype(np.float32)
            )
            np.testing.assert_allclose(
                np.asarray(conv3_padded(xp, k)),
                np.asarray(_xla(xp, k)),
                atol=1e-5,
            )

    def test_vjp_matches_xla(self, rng):
        xp = jnp.asarray(rng.standard_normal((1, 10, 18, 8)).astype(np.float32))
        k = jnp.asarray((rng.standard_normal((3, 3, 8, 4)) * 0.1).astype(np.float32))

        gx, gk = jax.grad(lambda xp, k: jnp.sum(conv3_padded(xp, k) ** 2), (0, 1))(
            xp, k
        )
        gx_w, gk_w = jax.grad(lambda xp, k: jnp.sum(_xla(xp, k) ** 2), (0, 1))(
            xp, k
        )
        np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_w), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_w), atol=1e-4)

    def test_fused_epilogue_matches_xla(self, rng):
        """conv + affine (+ residual) (+ relu) fused kernel == the composed
        XLA expression — the eval-mode resblock step (norm folded to
        scale/offset)."""
        h, w, ci, co, br, tw = 8, 32, 128, 128, 8, 32
        xp = jnp.asarray(
            rng.standard_normal((2, h + 2, w + 2, ci)).astype(np.float32)
        )
        k = jnp.asarray(
            (rng.standard_normal((3, 3, ci, co)) * 0.1).astype(np.float32)
        )
        scale = jnp.asarray(
            (1.0 + 0.1 * rng.standard_normal(co)).astype(np.float32)
        )
        offset = jnp.asarray(
            (0.1 * rng.standard_normal(co)).astype(np.float32)
        )
        res = jnp.asarray(rng.standard_normal((2, h, w, co)).astype(np.float32))

        for relu in (False, True):
            for residual in (None, res):
                want = _xla(xp, k) * scale + offset
                if residual is not None:
                    want = want + residual
                if relu:
                    want = jnp.maximum(want, 0.0)
                got = conv3_fused_padded(
                    xp, k, scale, offset, residual=residual, relu=relu,
                    block_rows=br, block_cols=tw, interpret=True,
                )
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(want), atol=2e-4, rtol=1e-4,
                    err_msg=f"relu={relu} residual={residual is not None}",
                )

    def test_pick_blocks(self):
        assert pick_blocks(1024, 512, 128, 128) is not None
        assert pick_blocks(64, 32, 1024, 1024) is not None
        assert pick_blocks(64, 32, 120, 80) is None  # Ci not 128-multiple
        br, tw = pick_blocks(64, 32, 1024, 1024)
        assert 64 % br == 0 and 32 % tw == 0
