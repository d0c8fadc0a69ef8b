"""Image resizing helpers.

The FlowNet wrapper resizes inputs to a multiple of 64 with
`nn.Upsample(mode='bilinear')` under PyTorch 0.4, whose default is
align_corners=False (half-pixel centers) — matching jax.image.resize's
"linear" method (reference: models/flownet.py:46-58).
"""

from __future__ import annotations

import jax


def resize_bilinear(x: jax.Array, height: int, width: int) -> jax.Array:
    """Bilinear resize of an NHWC batch to (height, width).

    Half-pixel-center convention (align_corners=False), matching torch 0.4's
    `nn.Upsample(mode='bilinear')` default.
    """
    shape = x.shape[:-3] + (height, width, x.shape[-1])
    # antialias=False: torch's bilinear interpolate is a pure 2-tap sample
    # even when downscaling (no area filtering).
    return jax.image.resize(x, shape, method="linear", antialias=False)


def make_divisible(size: int, base: int) -> int:
    """Largest multiple of `base` that is <= size (the reference's //base*base)."""
    return size // base * base


def scale_flow(flow: jax.Array, height: int, width: int) -> jax.Array:
    """Resize a flow field and rescale its magnitudes accordingly.

    The reference rescales by old_h/new_h only (both axes by the height ratio,
    reference: models/flownet.py:57) — we match that exactly.
    """
    old_h = flow.shape[-3]
    resized = resize_bilinear(flow, height, width)
    return resized * (height / old_h)
