"""Pooling / pyramid ops.

The reference builds all its spatial pyramids with
`nn.AvgPool2d(3, stride=2, padding=1, count_include_pad=False)`
(reference: models/base_model.py:122-134, models/networks.py:400,652) and the
VGG-loss downsampler with `nn.AvgPool2d(2, stride=2, count_include_pad=False)`
(reference: models/networks.py:782).

count_include_pad=False means border windows divide by the number of *valid*
taps, not the full window size — we reproduce that with a ones-count
reduce_window.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _avg_pool(
    x: jax.Array, window: int, stride: int, pad: int, count_include_pad: bool
) -> jax.Array:
    """NHWC average pool matching torch.nn.AvgPool2d semantics."""
    dims = (1, window, window, 1)
    strides = (1, stride, stride, 1)
    padding = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    # init value must be a concrete scalar so XLA specializes this to the
    # differentiable reduce-window-sum form (a traced zero breaks autodiff).
    init = x.dtype.type(0)
    summed = jax.lax.reduce_window(x, init, jax.lax.add, dims, strides, padding)
    if count_include_pad or pad == 0:
        return summed / jnp.asarray(window * window, x.dtype)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(ones, init, jax.lax.add, dims, strides, padding)
    # the count map has no useful gradient; keep it out of the tangent graph
    return summed / jax.lax.stop_gradient(counts)


def avg_pool_3x3s2(x: jax.Array) -> jax.Array:
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False), NHWC."""
    return _avg_pool(x, window=3, stride=2, pad=1, count_include_pad=False)


def avg_pool_2x2(x: jax.Array) -> jax.Array:
    """AvgPool2d(2, stride=2, count_include_pad=False), NHWC."""
    return _avg_pool(x, window=2, stride=2, pad=0, count_include_pad=True)


def build_pyramid(x: jax.Array, n_scales: int) -> list[jax.Array]:
    """[finest, ..., coarsest] pyramid by repeated 3x3/s2 averaging (NHWC).

    Index 0 is the input resolution, matching the reference's `build_pyr`
    ordering (reference: models/base_model.py:122-134).
    """
    pyr = [x]
    for _ in range(1, n_scales):
        pyr.append(avg_pool_3x3s2(pyr[-1]))
    return pyr


def build_pyramid_video(x: jax.Array, n_scales: int) -> list[jax.Array]:
    """Pyramid over a (B, T, H, W, C) video, pooling each frame."""
    b, t = x.shape[:2]
    flat = x.reshape((b * t,) + x.shape[2:])
    pyr = build_pyramid(flat, n_scales)
    return [p.reshape((b, t) + p.shape[1:]) for p in pyr]
