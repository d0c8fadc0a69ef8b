"""Space-to-depth packed convolution — exact KxK/stride-1 conv reshaping.

Packing 2x2 pixel blocks into channels (space-to-depth) re-expresses a
KxK stride-1 conv as a (K//2+1)-tap conv over a quarter-resolution,
4x-channel tensor — identical math with fewer kernel taps and channel
counts that fill the MXU better.

Exactness: `pack_conv_kernel` rearranges the original HWIO kernel into the
packed kernel such that

    depth_to_space(conv_valid(space_to_depth(pad(x)), K')) ==
        conv_valid(pad(x), K)

bit-for-bit in f32 (same dot-product terms, reassociated only across the
2x2 phase grouping).

Measured on v5e (bf16, amortized): the packing does NOT pay for the
generator's full-resolution stems (7x7 114->80 @2048x1024: packed
36.4 ms vs plain XLA 29.3 ms — the repack relayouts cost more than the
saved passes), and wins modestly on the tiny-output heads (80->9: packed
21.4 ms vs 26.5 ms). It is therefore NOT wired into the composite
generators' FusedConv7 (see ops/conv7_pallas.py for the kernel that is);
it remains available as a building block and is parity-tested in
tests/test_packed_conv.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel idx = ((a*2+b)*C + c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jax.Array) -> jax.Array:
    """Inverse of space_to_depth."""
    b, hh, wh, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, hh, wh, 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, hh * 2, wh * 2, c)


def packed_kernel_extent(k: int) -> int:
    """Spatial extent of the packed kernel for an odd KxK stride-1 conv.

    Py = (ky + a - a')/2 with ky in [0, K-1], a-a' in {-1,0,1} and the sum
    even -> Py in [0, (K-1+1)/2] = [0, (K+1)//2 - 1], extent (K+1)//2.
    """
    return (k + 1) // 2


def pack_conv_kernel(kernel: np.ndarray) -> np.ndarray:
    """HWIO (K, K, Ci, Co) -> packed (S, S, 4Ci, 4Co), S = (K+1)//2 + 1.

    Derivation: with the input symmetric-padded by p = K//2 (so padded
    coordinates start at 0), output pixel (2Y+a, 2X+b) reads padded input
    (2Y+a+ky, 2X+b+kx) = packed ((Y+Py, a'), (X+Px, b')) with
    ky = 2Py + a' - a (valid in [0, K-1]); entries outside are zero.
    """
    k, _, ci, co = kernel.shape
    s = packed_kernel_extent(k)
    packed = np.zeros((s, s, 4 * ci, 4 * co), kernel.dtype)
    for a in range(2):
        for b in range(2):
            for ap in range(2):
                for bp in range(2):
                    for py in range(s):
                        ky = 2 * py + ap - a
                        if not 0 <= ky < k:
                            continue
                        for px in range(s):
                            kx = 2 * px + bp - b
                            if not 0 <= kx < k:
                                continue
                            packed[
                                py, px,
                                (ap * 2 + bp) * ci : (ap * 2 + bp + 1) * ci,
                                (a * 2 + b) * co : (a * 2 + b + 1) * co,
                            ] = kernel[ky, kx]
    return packed


def packed_conv(
    x: jax.Array, packed_kernel: jax.Array, k: int, pad_mode: str = "reflect"
) -> jax.Array:
    """Exact KxK stride-1 conv with K//2 reflect/zero padding, packed form.

    Requires even H, W (true throughout vid2vid: all sizes are /32).
    """
    p = k // 2
    pads = ((0, 0), (p, p), (p, p), (0, 0))
    if pad_mode == "reflect":
        x = jnp.pad(x, pads, mode="reflect")
    else:
        x = jnp.pad(x, pads)
    xp = space_to_depth(x)
    out = jax.lax.conv_general_dilated(
        xp,
        packed_kernel.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return depth_to_space(out)
