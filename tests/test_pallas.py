"""Pallas kernel parity tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vid2vid_tpu.ops.correlation import correlation_ref
from vid2vid_tpu.ops.correlation_pallas import correlation_pallas


class TestCorrelationPallas:
    def test_matches_reference(self, rng):
        f1 = jnp.asarray(rng.standard_normal((1, 24, 32, 8)).astype(np.float32))
        f2 = jnp.asarray(rng.standard_normal((1, 24, 32, 8)).astype(np.float32))
        ref = correlation_ref(f1, f2)
        got = correlation_pallas(f1, f2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_vertical_zero_padding(self, rng):
        """Rows displaced outside the image must contribute exact zeros."""
        f1 = jnp.ones((1, 8, 32, 4))
        f2 = jnp.ones((1, 8, 32, 4))
        out = np.asarray(correlation_pallas(f1, f2, interpret=True))
        # at y=0, dy=-20 (tc row 0) every sample is out of range
        assert (out[0, 0, :, :21] == 0).all()
        # center displacement (dy=0,dx=0) on all-ones inputs = 1.0
        np.testing.assert_allclose(out[0, 4, 16, 220], 1.0, atol=1e-6)
