"""Tap-stacked 7x7 convolution for tiny output widths (the output heads).

The generators' fused output heads are 7x7 convs with Co = 9 (3 img + 2
flow + 1 weight + 3 fg channels; reference: models/networks.py:205-213
final convs). On the MXU a conv contraction pads N=Co to 128, so Co=9
runs at ~7% fill — measured 26.5 ms at 2048x1024 for 296 useful GFLOP
(PERF.md). Reassociating the sum fixes the shape: compute, per pixel, ALL
49 tap contributions at once as a 1x1 matmul

    z[p, (tap, o)] = sum_c x_pad[p, c] * K[tap, c, o]        (N = 49*Co)

then reduce over taps by summing 49 statically-shifted thin slices

    out[y, x, o] = sum_tap z[y + ky(tap), x + kx(tap), tap*Co + o].

The matmul now runs at (Ci/128)*(49*Co/512) fill instead of Co/128, and
the shift-reduce is a pure fusion that reads each z element's own Co
channels once (~2x z bytes of HBM traffic). Same math, same params —
`FusedConv7` dispatches here for small Co (see nn/composite.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv7_tapstack(xp: jax.Array, kernel: jax.Array, k: int = 7) -> jax.Array:
    """VALID kxk convolution of a pre-padded input, tap-stacked.

    Args:
      xp: (B, H + k - 1, W + k - 1, Ci) padded input (any padding mode —
        the caller pads, exactly as for the lax.conv path).
      kernel: (k, k, Ci, Co) HWIO kernel.
      k: spatial kernel size.

    Returns:
      (B, H, W, Co), equal to
      `lax.conv_general_dilated(xp, kernel, (1, 1), "VALID")`.
    """
    kh, kw, ci, co = kernel.shape
    assert kh == k and kw == k, (kernel.shape, k)
    b, hp, wp, _ = xp.shape
    h, w = hp - (k - 1), wp - (k - 1)
    # (k, k, Ci, Co) -> (Ci, k*k*Co), tap-major columns
    kflat = kernel.transpose(2, 0, 1, 3).reshape(ci, k * k * co)
    z = jax.lax.dot_general(
        xp, kflat, (((3,), (0,)), ((), ()))
    )  # (B, Hp, Wp, k*k*Co)
    # accumulate the 49-term tap reduction in f32: the dense conv rounds
    # once after its full MXU accumulation, so chained bf16 adds here would
    # diverge from it; an f32 accumulator in the fusion costs no traffic
    out = jnp.zeros((b, h, w, co), jnp.float32)
    for tap in range(k * k):
        ky, kx = tap // k, tap % k
        out = out + jax.lax.slice(
            z,
            (0, ky, kx, tap * co),
            (b, ky + h, kx + w, (tap + 1) * co),
        ).astype(jnp.float32)
    return out.astype(z.dtype)
