"""Exactness tests for the space-to-depth packed convolution."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vid2vid_tpu.ops.packed_conv import (
    depth_to_space,
    pack_conv_kernel,
    packed_conv,
    space_to_depth,
)


class TestS2D:
    def test_round_trip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x)
        )


class TestPackedConv:
    @pytest.mark.parametrize("k,ci,co", [(7, 5, 4), (3, 8, 6), (5, 3, 3)])
    def test_matches_direct_conv(self, rng, k, ci, co):
        x = jnp.asarray(rng.standard_normal((2, 16, 20, ci)).astype(np.float32))
        kern = rng.standard_normal((k, k, ci, co)).astype(np.float32)
        p = k // 2
        ref = jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect"),
            jnp.asarray(kern), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = packed_conv(x, jnp.asarray(pack_conv_kernel(kern)), k, "reflect")
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-4)

    def test_zero_pad_mode(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 2)).astype(np.float32))
        kern = rng.standard_normal((3, 3, 2, 2)).astype(np.float32)
        ref = jax.lax.conv_general_dilated(
            x, jnp.asarray(kern), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = packed_conv(x, jnp.asarray(pack_conv_kernel(kern)), 3, "zero")
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=1e-5)
