"""Pallas TPU kernel study: stride-1 KxK (K=7) convolution at high resolution.

The composite generators' full-resolution stems and output heads
(reference: models/networks.py:163,181-186 — ReflectionPad2d(3) +
Conv2d(k=7)) are the largest single convs in the 2048x1024 frame. This
module implements the conv as a Pallas kernel that reads each input tile
into VMEM once and accumulates the K*K taps as shifted (rows, cols, Ci) x
(Ci, Co) matmuls on the MXU, with the K column shifts hoisted out of the
tap loop (a sublane-offset slice costs a relayout copy; doing it K*K
times made the first cut copy-bound).

Measured result on v5e (bf16, amortized over a 16-deep scan, 2026-08):

  shape @2048x1024            this kernel   XLA conv   MXU-shape floor
  stem 114->80                   25.8 ms     29.3 ms      ~17 ms
  head 80->9                     25.7 ms     26.2 ms      ~14 ms
  img-stem 6->80                 25.7 ms      6.5 ms       —

The kernel is parity-exact (bit-identical to the XLA conv in f32 accum)
but does NOT meaningfully beat XLA, and loses badly at small Ci where
XLA switches algorithms. Control experiments pinned down why every
formulation converges to ~25 ms: a probe kernel doing the same 49
dot_generals on halo-free Blocked input (no slices, no shifts, wrong
result / right cost) also runs at ~25 ms, i.e. the cost IS the matmul
schedule under shape padding — Ci=114 pads to 128 lanes and Co=80 pads
to 128 columns, capping MXU utilization at ~55%. Folding the kx taps
into one K*Ci=896 contraction (7 matmuls instead of 49, accumulation
inside the MXU) measured the same 25.9 ms; a multi-dim-contraction
variant is rejected by Mosaic ('lhs contracting dims must be of size 1').
Since XLA sits within ~15% of the same floor and fuses the bias/norm/relu
epilogues for free, the production path (nn/composite.py FusedConv7)
uses the XLA conv; this kernel remains as the measured baseline so future
work starts from data, not hope.

Contract: `x` must already be spatially padded by K//2 (reflect or zero —
caller's choice), H % block_rows == 0 and W % block_cols == 0. Output is
bit-identical to `lax.conv_general_dilated(x_padded, k, VALID)` up to f32
accumulation order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas.core import Element


def _conv_kernel(x_ref, k_ref, o_ref, *, K: int, BR: int, TW: int):
    x = x_ref[0]  # (BR+K-1, TW_in, Ci) — TW_in = TW+K-1 rounded up to 128s
    ci = x.shape[-1]
    co = k_ref.shape[-1]
    # K column shifts hoisted out of the tap loop (see module docstring);
    # the (ky, kx) loop then slices only leading dims — free views.
    xks = jnp.stack(
        [jax.lax.slice_in_dim(x, kx, kx + TW, axis=1) for kx in range(K)]
    )  # (K, BR+K-1, TW, Ci)
    acc = jnp.zeros((BR, TW, co), jnp.float32)
    dn = (((2,), (0,)), ((), ()))
    for ky in range(K):
        for kx in range(K):
            xs = jax.lax.slice(
                xks, (kx, ky, 0, 0), (kx + 1, ky + BR, TW, ci)
            )[0]
            acc += jax.lax.dot_general(
                xs, k_ref[ky, kx], dn, preferred_element_type=jnp.float32
            )
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_rows", "block_cols", "interpret")
)
def conv7_pallas_padded(
    xp: jax.Array,
    kernel: jax.Array,
    block_rows: int = 8,
    block_cols: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """VALID KxK stride-1 conv of a pre-padded NHWC input.

    xp: (B, H+K-1, W+K-1, Ci); kernel: (K, K, Ci, Co).
    Returns (B, H, W, Co) in xp.dtype.
    """
    k = kernel.shape[0]
    b, hp, wp, ci = xp.shape
    h, w = hp - (k - 1), wp - (k - 1)
    co = kernel.shape[-1]
    br, tw = block_rows, block_cols
    assert h % br == 0 and w % tw == 0, (h, w, br, tw)

    # Mosaic requires the input block's second-minor dim be a multiple of
    # 128 (or the full array dim): round the tw + k - 1 halo window up and
    # over-pad the array so every block read stays in bounds; the kernel
    # only consumes the first tw + k - 1 columns of each block.
    tw_in = -(-(tw + k - 1) // 128) * 128
    if wp < (w - tw) + tw_in:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, (w - tw) + tw_in - wp), (0, 0)))

    grid = (b, h // br, w // tw)
    return pl.pallas_call(
        functools.partial(_conv_kernel, K=k, BR=br, TW=tw),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (Element(1), Element(br + k - 1), Element(tw_in),
                 Element(ci)),
                lambda bi, yi, xi: (bi, yi * br, xi * tw, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, k, ci, co), lambda bi, yi, xi: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, br, tw, co), lambda bi, yi, xi: (bi, yi, xi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), xp.dtype),
        # v5e has 128 MiB VMEM/core but Mosaic's scoped-allocation default
        # is 16 MiB; the shifted input copies + f32 accumulator need more
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(xp, kernel)


def _pick_blocks(h: int, w: int, ci: int, co: int, k: int):
    """Largest (block_rows, block_cols) whose VMEM working set fits.

    Dominant allocations: the K column-shifted input copies
    (K*(br+k-1)*tw*ci bf16, built once per tile), the double-buffered
    input tile, and the f32 accumulator. Budget against the 96 MB scoped
    limit with headroom; returns None when no divisor-aligned tiling fits.
    """
    for br in (16, 8):
        if h % br:
            continue
        for tw in (1024, 512, 256, 128):
            if w % tw:
                continue
            tw_in = -(-(tw + k - 1) // 128) * 128
            in_bytes = (br + k - 1) * tw_in * ci * 2
            shift_bytes = k * (br + k - 1) * tw * ci * 2
            acc_bytes = br * tw * max(co, 128) * 4
            total = 2 * in_bytes + shift_bytes + 3 * acc_bytes
            if total <= 64 * 1024 * 1024:
                return br, tw
    return None


def _conv7_reflect_xla(x: jax.Array, kernel: jax.Array) -> jax.Array:
    k = kernel.shape[0]
    p = k // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, kernel.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv7_reflect_fwd_impl(x: jax.Array, kernel: jax.Array) -> jax.Array:
    k = kernel.shape[0]
    p = k // 2
    b, h, w, ci = x.shape
    co = kernel.shape[-1]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    blocks = _pick_blocks(h, w, ci, co, k) if on_tpu else None
    if blocks is not None and h * w >= 256 * 256:
        xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        return conv7_pallas_padded(
            xp, kernel.astype(x.dtype), blocks[0], blocks[1]
        )
    return _conv7_reflect_xla(x, kernel)


@jax.custom_vjp
def conv7_reflect(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """ReflectionPad(K//2) + KxK stride-1 conv via the Pallas kernel.

    NOT the production path — measured at parity with (stem) or slower
    than (small-Ci) the XLA conv on v5e; see the module docstring for the
    numbers. Kept callable end-to-end so the parity/performance claims
    stay reproducible. Backward is the VJP of the mathematically identical
    XLA formulation (pallas_call has no automatic AD).
    """
    return _conv7_reflect_fwd_impl(x, kernel)


def _conv7_fwd(x, kernel):
    return _conv7_reflect_fwd_impl(x, kernel), (x, kernel)


def _conv7_bwd(res, dy):
    x, kernel = res
    _, vjp = jax.vjp(_conv7_reflect_xla, x, kernel)
    return vjp(dy)


conv7_reflect.defvjp(_conv7_fwd, _conv7_bwd)
