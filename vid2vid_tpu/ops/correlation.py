"""Correlation (cost volume) op — the FlowNetC matching layer.

Reference semantics (reference CUDA kernel:
models/flownet2_pytorch/networks/correlation_package/correlation_cuda_kernel.cu:73-147):
with pad_size=20, kernel_size=1, max_displacement=20, stride1=1, stride2=2,

  out[b, tc, y, x] = mean_c( f1[b, c, y, x] * f2[b, c, y+dy, x+dx] )

for displacements (dy, dx) = (tj*2, ti*2), tj,ti in [-10, 10], with f2
zero-padded, and channel index tc = (tj+10)*21 + (ti+10)  (dy-major).

We keep NHWC and express the displacement sweep as a `lax.scan` over the 441
offsets — each step is a dynamic-slice + fused multiply-reduce, which XLA
pipelines well; a Pallas kernel can replace it behind the same signature.
FlowNetC applies LeakyReLU(0.1) after this op (that stays in the network).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnames=("max_displacement", "stride2")
)
def correlation_ref(
    f1: jax.Array,
    f2: jax.Array,
    max_displacement: int = 20,
    stride2: int = 2,
) -> jax.Array:
    """Cost volume between two NHWC feature maps.

    Args:
      f1, f2: (B, H, W, C) feature maps.
      max_displacement: maximum pixel displacement (also the zero-pad width).
      stride2: stride over the displacement grid.

    Returns:
      (B, H, W, D*D) with D = 2*(max_displacement//stride2)+1; channel layout
      is dy-major then dx, matching the reference CUDA kernel.
    """
    b, h, w, c = f1.shape
    rad = max_displacement // stride2
    n_disp = 2 * rad + 1
    pad = max_displacement

    f2p = jnp.pad(f2, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    inv_c = jnp.asarray(1.0 / c, f1.dtype)

    def body(_, idx):
        # offset into the padded map: pad + (i - rad)*stride2 = i*stride2 when
        # pad == rad*stride2 (true for the FlowNetC configuration); keep the
        # general form for other parameterizations.
        dy = (idx // n_disp - rad) * stride2 + pad
        dx = (idx % n_disp - rad) * stride2 + pad
        shifted = jax.lax.dynamic_slice(f2p, (0, dy, dx, 0), (b, h, w, c))
        corr = jnp.sum(f1 * shifted, axis=-1) * inv_c
        return None, corr

    _, out = jax.lax.scan(body, None, jnp.arange(n_disp * n_disp))
    return jnp.transpose(out, (1, 2, 3, 0))


def correlation(
    f1: jax.Array,
    f2: jax.Array,
    max_displacement: int = 20,
    stride2: int = 2,
) -> jax.Array:
    """Dispatching wrapper (XLA today; Pallas kernel slots in here)."""
    return correlation_ref(f1, f2, max_displacement, stride2)
