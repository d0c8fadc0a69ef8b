"""Whole-respair Pallas kernel: one enhancer residual block (BOTH 3x3
convs), reflect padding, eval-mode norm affines, ReLU and the residual add
in a SINGLE pallas_call — the round-5 traffic lever PERF.md's roofline
ranks #1.

What one respair computes (reference: models/networks.py:554-593, the
ResnetBlock pair `_FusedResPair` runs on the enhancer's concatenated
img+flow branches; eval-mode norm folds to a per-channel affine):

    h   = relu(conv3x3(reflect_pad(x, 1)) * a0 + b0)
    out = x + conv3x3(reflect_pad(h, 1)) * a1 + b1

History of this lever (PERF.md, rounds 3-4): routing the bare conv through
Pallas regressed end-to-end because `pallas_call` is a fusion barrier —
bias/norm/relu/residual became separate HBM round-trips. The round-3 fix
(`conv3_fused_padded`) moved the epilogue inside the kernel but still ran
TWO pallas calls per respair with `reflect_pad(h)` materialized between
them and `reflect_pad(x)` materialized before each: per respair the
boundary cost was ~4 extra full-res materializations, and the end-to-end
bench regressed 4.79 -> 3.40 fps despite a 1.6x standalone win.

This kernel removes every one of those boundary crossings:

  - ONE pallas_call per respair: the intermediate `h` lives in a VMEM
    scratch and never touches HBM.
  - The input arrives once, through `pad_respair`: reflect-pad 1 plus one
    extra garbage row/col per side, so each grid block can read its
    (br+4, tw+4) halo window with plain Element indexing and conv1 can
    compute `h` on the (br+2, tw+2) halo region conv2 needs. XLA fuses
    the PRODUCER (the enhancer's `d + coarse_feat` adds and the img/flow
    concat) into the pad copy, so `x` itself is never materialized
    separately — the "producer consumed at the kernel boundary" ask.
  - `reflect_pad(h, 1)` at the image border is exact: blocks at the image
    edge overwrite the garbage-derived halo rows/cols of `h` with the
    true reflected rows (row fix before column fix reproduces the corner
    semantics of a 2-D reflect pad).
  - The residual add reads the interior of the SAME input block — no
    second operand.

Traffic per respair at the enhancer shapes: write xpp (fused producer) +
read xpp (+halo overlap) + write out = ~3.1 map-traffics, vs ~5 for the
fused XLA chain and ~7.5 for the round-3 two-call arrangement.

Contract: bf16/f32 NHWC, C % 128 == 0, H % block_rows == 0,
W % block_cols == 0. Eval-mode only (no VJP — the production call site
`_FusedResPair` gates on `not train`).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas.core import Element


def pad_respair(x: jax.Array) -> jax.Array:
    """reflect_pad(x, 1) + one garbage (zero) row/col per side.

    Row/col layout of the result (B, H+4, W+4, C):
      index 0    = garbage (only ever read into halo lanes that edge
                   blocks overwrite in-kernel)
      index 1    = reflect value (x[1])
      2 .. N+1   = x
      index N+2  = reflect value (x[N-2])
      index N+3  = garbage

    Kept as one jnp.pad expression so XLA fuses the producer chain
    (d + coarse_feat adds, img/flow concat) into this single write.
    """
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jnp.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)))


def _respair_kernel(
    x_ref, k0_ref, k1_ref, ab_ref, o_ref, xcat_ref, h_ref, *,
    BR: int, TW: int, NY: int, NX: int,
):
    """One residual block over a (BR, TW) output tile.

    x_ref:  (1, BR+4, tw_in, C) — pad_respair window, rows/cols offset by
            (yi*BR, xi*TW) so local (i, j) = global padded (yi*BR+i, ...).
    k0/k1:  (3, 3C, C) im2col-rearranged kernels (kx-major lanes).
    ab_ref: (4, C) f32 — rows: a0, b0, a1, b1 (affine = eval norm + bias).
    xcat:   (BR+4, TWH, 3C) scratch — reused for both convs' column taps.
    h_ref:  (BR+2, TWH, C) scratch — the VMEM-resident intermediate.
    """
    x = x_ref[0]
    ci = x.shape[-1]
    yi = pl.program_id(1)
    xi = pl.program_id(2)
    twh = xcat_ref.shape[1]  # tw+2 rounded up for lane alignment

    # ---- conv1 on the halo region: h[a, b], a in [0,BR+2), b in [0,twh)
    for kx in range(3):
        xcat_ref[:, :, kx * ci : (kx + 1) * ci] = jax.lax.slice_in_dim(
            x, kx, kx + twh, axis=1
        )
    dn = (((2,), (0,)), ((), ()))
    acc = jnp.zeros((BR + 2, twh, ci), jnp.float32)
    for ky in range(3):
        acc += jax.lax.dot_general(
            xcat_ref[ky : ky + BR + 2], k0_ref[ky], dn,
            preferred_element_type=jnp.float32,
        )
    acc = jnp.maximum(acc * ab_ref[0] + ab_ref[1], 0.0)
    h_ref[:, :, :] = acc.astype(h_ref.dtype)

    # ---- reflect_pad(h, 1) at the image border: edge blocks overwrite the
    # garbage-derived halo with the true reflection. Rows first, then
    # columns, reproduces the 2-D pad's corner values (corner = h[1, 1]).
    @pl.when(yi == 0)
    def _():
        h_ref[0:1] = h_ref[2:3]

    @pl.when(yi == NY - 1)
    def _():
        h_ref[BR + 1 : BR + 2] = h_ref[BR - 1 : BR]

    @pl.when(xi == 0)
    def _():
        h_ref[:, 0:1] = h_ref[:, 2:3]

    @pl.when(xi == NX - 1)
    def _():
        h_ref[:, TW + 1 : TW + 2] = h_ref[:, TW - 1 : TW]

    # ---- conv2 + affine + residual (residual = interior of the input
    # block: padded (2..BR+2, 2..TW+2) is exactly x's tile)
    for kx in range(3):
        xcat_ref[: BR + 2, :TW, kx * ci : (kx + 1) * ci] = (
            jax.lax.slice_in_dim(h_ref[:, : TW + 2], kx, kx + TW, axis=1)
        )
    acc2 = jnp.zeros((BR, TW, ci), jnp.float32)
    for ky in range(3):
        acc2 += jax.lax.dot_general(
            xcat_ref[ky : ky + BR, :TW], k1_ref[ky], dn,
            preferred_element_type=jnp.float32,
        )
    acc2 = acc2 * ab_ref[2] + ab_ref[3]
    acc2 += x[2 : BR + 2, 2 : TW + 2].astype(jnp.float32)
    o_ref[0] = acc2.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_rows", "block_cols", "interpret")
)
def respair_pallas(
    xpp: jax.Array,
    k0: jax.Array,
    ab0: jax.Array,
    k1: jax.Array,
    ab1: jax.Array,
    block_rows: int = 16,
    block_cols: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """One full residual block (2 reflect-padded 3x3 convs + affines +
    ReLU + skip) of a `pad_respair`-padded input, in one Pallas pass.

    xpp: (B, H+4, W+4, C) from pad_respair; k0/k1: (3, 3, C, C);
    ab0/ab1: (scale, offset) pairs, each (C,) f32 — the eval-mode norm
    folded with the conv bias. Returns (B, H, W, C) in xpp.dtype.
    """
    b, hp, wp, ci = xpp.shape
    h, w = hp - 4, wp - 4
    assert k0.shape == k1.shape == (3, 3, ci, ci), (k0.shape, ci)
    assert ci % 128 == 0, ci
    br, tw = block_rows, block_cols
    assert h % br == 0 and w % tw == 0, (h, w, br, tw)

    k0cat = k0.astype(xpp.dtype).reshape(3, 3 * ci, ci)
    k1cat = k1.astype(xpp.dtype).reshape(3, 3 * ci, ci)
    ab = jnp.stack(
        [jnp.asarray(v, jnp.float32) for pair in (ab0, ab1) for v in pair]
    )

    # lane-align the halo window reads and the h/xcat scratch widths
    tw_in = -(-(tw + 4) // 128) * 128
    twh = -(-(tw + 2) // 8) * 8  # h computed on a few extra junk columns
    assert twh + 2 <= tw_in
    if wp < (w - tw) + tw_in:
        xpp = jnp.pad(
            xpp, ((0, 0), (0, 0), (0, (w - tw) + tw_in - wp), (0, 0))
        )

    ny, nx = h // br, w // tw
    grid = (b, ny, nx)
    return pl.pallas_call(
        functools.partial(
            _respair_kernel, BR=br, TW=tw, NY=ny, NX=nx
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (Element(1), Element(br + 4), Element(tw_in), Element(ci)),
                lambda bi, yi, xi: (bi, yi * br, xi * tw, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3 * ci, ci), lambda bi, yi, xi: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3 * ci, ci), lambda bi, yi, xi: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, ci), lambda bi, yi, xi: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, br, tw, ci), lambda bi, yi, xi: (bi, yi, xi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, ci), xpp.dtype),
        scratch_shapes=[
            pltpu.VMEM((br + 4, twh, 3 * ci), xpp.dtype),
            pltpu.VMEM((br + 2, twh, ci), xpp.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                os.environ.get("VID2VID_RESPAIR_VMEM_MB", 100)
            ) * 1024 * 1024
        ),
        interpret=interpret,
    )(xpp, k0cat, k1cat, ab)


def pick_blocks_respair(h: int, w: int, ci: int, esz: int = 2):
    """Largest (block_rows, block_cols) whose VMEM working set fits.

    Budget: double-buffered input window + xcat scratch + h scratch +
    two f32 accumulators + output + kernels, under ~80 MB.

    esz: element size of the activation dtype (2 for bf16, 4 for f32 —
    the f32 path runs on hardware too, e.g. bf16=False evals; sizing it
    as bf16 OOMs scoped VMEM at compile time, caught by the round-5
    on-chip knob verification).
    """
    if ci % 128:
        return None
    cap = os.environ.get("VID2VID_RESPAIR_BLOCKS")  # "br,tw" A/B override
    if cap:
        br, tw = (int(v) for v in cap.split(","))
        return (br, tw) if (h % br == 0 and w % tw == 0) else None
    for br in (32, 16, 8):
        if h % br:
            continue
        for tw in (512, 256, 128, 64, 32):
            if w % tw:
                continue
            tw_in = -(-(tw + 4) // 128) * 128
            twh = -(-(tw + 2) // 8) * 8
            in_b = (br + 4) * tw_in * ci * esz
            xcat_b = (br + 4) * twh * 3 * ci * esz
            h_b = (br + 2) * twh * ci * esz
            acc_b = (br + 2) * twh * ci * 4
            out_b = br * tw * ci * esz
            k_b = 2 * 9 * ci * ci * esz
            total = 2 * in_b + xcat_b + h_b + 2 * acc_b + 2 * out_b + k_b
            if total <= 80 * 1024 * 1024:
                return br, tw
    return None
