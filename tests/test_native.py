"""Native C++ kernel parity vs the JAX ops (three-way oracle check)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vid2vid_tpu.native import (
    channel_norm_native,
    correlation_native,
    flow_warp_native,
)
from vid2vid_tpu.ops import channel_norm, correlation_ref, flow_warp


class TestNativeParity:
    def test_correlation(self, rng):
        f1 = rng.standard_normal((1, 6, 8, 4)).astype(np.float32)
        f2 = rng.standard_normal((1, 6, 8, 4)).astype(np.float32)
        native = correlation_native(f1, f2, max_displacement=4, stride2=2)
        ours = np.asarray(
            correlation_ref(jnp.asarray(f1), jnp.asarray(f2), 4, 2)
        )
        np.testing.assert_allclose(native, ours, atol=1e-5)

    def test_flow_warp(self, rng):
        img = rng.standard_normal((2, 8, 9, 3)).astype(np.float32)
        flow = (rng.standard_normal((2, 8, 9, 2)) * 3).astype(np.float32)
        native = flow_warp_native(img, flow)
        ours = np.asarray(flow_warp(jnp.asarray(img), jnp.asarray(flow)))
        np.testing.assert_allclose(native, ours, atol=1e-5)

    def test_channel_norm(self, rng):
        x = rng.standard_normal((1, 5, 6, 7)).astype(np.float32)
        native = channel_norm_native(x)
        ours = np.asarray(channel_norm(jnp.asarray(x)))
        np.testing.assert_allclose(native, ours, atol=1e-5)
