"""Pallas TPU kernel study: stride-1 3x3 convolution (im2col-K).

STATUS: measured kernel study, NOT the production path. Standalone the
kernel beats the XLA conv ~1.2-1.3x at the resblock shapes, but routing
every 3x3 stride-1 conv in `nn.Conv` through it REGRESSED the end-to-end
2048x1024 bench 4.77 -> 3.24 fps: `pallas_call` + `custom_vjp` are
fusion barriers, so XLA can no longer fuse the bias add / norm / relu
(and, in the fused enhancer blocks, the residual adds) into the conv —
each resblock gains full-activation HBM round-trips that cost more than
the MXU win. Kept in-tree as a measured baseline; see PERF.md.

`conv3_fused_padded` is the follow-up that PERF.md's negative result
calls for: the eval-mode resblock epilogue (norm folded to a per-channel
affine, optional residual add, optional ReLU) applied to the f32
accumulator while it is still VMEM-resident, so fusing through the
pallas_call boundary costs nothing. MEASURED OUTCOME (round 3, PERF.md
"Fused-epilogue resblocks"): standalone it wins 1.4-1.6x at the
enhancer respair shapes and survives a lax.scan context, but wired into
the full model (--pallas_resblocks) it regresses the 2048x1024 bench
4.79 -> 3.40 fps, attributed entirely to the enhancer sites and not to
VMEM tile pressure — producer/consumer materialization at the kernel
boundary in context. The flag therefore defaults OFF.

The generators spend most of their conv time in 3x3 stride-1 convs — the
scale-0 resblocks (1024 ch at 64x32 after 3 downsamples of the 512x256
pyramid level; reference: models/networks.py:174-178,554-593) and the
enhancers' fused 128/256-ch resblocks at 1024x512 / 512x256
(`nn/composite.py::_FusedResPair`). XLA's conv runs these at 28-35% MFU
(measured v5e: 0.56 ms @64x32x1024, 2.81 ms @1024x512x128).

The round-2 tap-loop kernel (`ops/conv7_pallas.py`) accumulates 9
per-tap dots into a VMEM f32 accumulator; for 3x3 with 128-multiple
channels the MXU shape fill is perfect, yet it only reached 32-45% MFU —
the per-tap accumulation round-trips the f32 accumulator through the VPU
nine times. This kernel instead folds the taps into the MXU's
*contraction* dimension (im2col over the kernel window, built in VMEM):

  1. hoist the 3 column shifts: write x[:, kx:kx+tw, :] into a VMEM
     scratch at lane offset kx*Ci (Ci % 128 == 0 keeps every lane write
     128-aligned — the Mosaic-safe case);
  2. one dot per kernel row: acc += (rows ky..ky+br of the scratch)
     . kcat[ky], contracting 3*Ci lanes — the kx taps accumulate inside
     the MXU, leaving 3 accumulator round-trips instead of 9.

kcat is the kernel rearranged to match: (3, 3*Ci, Co), kx-major lanes.

Contract: x pre-padded by 1 (reflect or zero — caller's choice),
H % block_rows == 0, W % block_cols == 0, Ci % 128 == 0. Output equals
`lax.conv_general_dilated(xp, k, (1, 1), "VALID")` up to f32 accumulation
order. Backward falls back to the XLA conv's VJP (mathematically
identical), as for `conv7_pallas.conv7_reflect`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas.core import Element


def _conv3_kernel(x_ref, k_ref, o_ref, xcat_ref, *, BR: int, TW: int):
    x = x_ref[0]  # (BR+2, TW_in, Ci)
    ci = x.shape[-1]
    co = k_ref.shape[-1]
    # im2col the column taps into lanes (128-aligned writes: ci % 128 == 0)
    for kx in range(3):
        xcat_ref[:, :, kx * ci : (kx + 1) * ci] = jax.lax.slice_in_dim(
            x, kx, kx + TW, axis=1
        )
    dn = (((2,), (0,)), ((), ()))
    acc = jnp.zeros((BR, TW, co), jnp.float32)
    for ky in range(3):
        acc += jax.lax.dot_general(
            xcat_ref[ky : ky + BR], k_ref[ky], dn,
            preferred_element_type=jnp.float32,
        )
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_rows", "block_cols", "interpret")
)
def conv3_pallas_padded(
    xp: jax.Array,
    kernel: jax.Array,
    block_rows: int = 16,
    block_cols: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """VALID 3x3 stride-1 conv of a pre-padded NHWC input.

    xp: (B, H+2, W+2, Ci), Ci % 128 == 0; kernel: (3, 3, Ci, Co).
    Returns (B, H, W, Co) in xp.dtype.
    """
    b, hp, wp, ci = xp.shape
    h, w = hp - 2, wp - 2
    co = kernel.shape[-1]
    assert kernel.shape[:2] == (3, 3), kernel.shape
    assert ci % 128 == 0, ci
    br, tw = block_rows, block_cols
    assert h % br == 0 and w % tw == 0, (h, w, br, tw)

    # kcat[ky, kx*Ci + c, o] = kernel[ky, kx, c, o] — kx-major lanes to
    # match the xcat scratch layout
    kcat = kernel.transpose(0, 1, 2, 3).reshape(3, 3 * ci, co)

    # Mosaic wants the input block's second-minor dim to be a multiple of
    # 128 (or the full dim): round the tw + 2 halo window up and over-pad
    # so block reads stay in bounds (kernel consumes first tw + 2 cols).
    tw_in = -(-(tw + 2) // 128) * 128
    if wp < (w - tw) + tw_in:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, (w - tw) + tw_in - wp), (0, 0)))

    grid = (b, h // br, w // tw)
    return pl.pallas_call(
        functools.partial(_conv3_kernel, BR=br, TW=tw),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (Element(1), Element(br + 2), Element(tw_in), Element(ci)),
                lambda bi, yi, xi: (bi, yi * br, xi * tw, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3 * ci, co), lambda bi, yi, xi: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, br, tw, co), lambda bi, yi, xi: (bi, yi, xi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), xp.dtype),
        scratch_shapes=[pltpu.VMEM((br + 2, tw, 3 * ci), xp.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, kcat)


def _conv3_fused_kernel(
    x_ref, k_ref, ab_ref, r_ref, o_ref, xcat_ref, *,
    BR: int, TW: int, RELU: bool, RES: bool,
):
    """conv3 + per-channel affine (+ residual add) (+ ReLU), one pass.

    ab_ref: (2, Co) f32 — row 0 scale, row 1 offset — the eval-mode norm
    folded with the conv bias. The epilogue runs on the f32 accumulator
    while it is still VMEM-resident, so norm/relu/skip cost no extra HBM
    round-trips (the reason the plain kernel regressed end-to-end).
    """
    x = x_ref[0]
    ci = x.shape[-1]
    co = k_ref.shape[-1]
    for kx in range(3):
        xcat_ref[:, :, kx * ci : (kx + 1) * ci] = jax.lax.slice_in_dim(
            x, kx, kx + TW, axis=1
        )
    dn = (((2,), (0,)), ((), ()))
    acc = jnp.zeros((BR, TW, co), jnp.float32)
    for ky in range(3):
        acc += jax.lax.dot_general(
            xcat_ref[ky : ky + BR], k_ref[ky], dn,
            preferred_element_type=jnp.float32,
        )
    acc = acc * ab_ref[0] + ab_ref[1]
    if RES:
        acc += r_ref[0].astype(jnp.float32)
    if RELU:
        acc = jnp.maximum(acc, 0.0)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("relu", "block_rows", "block_cols", "interpret"),
)
def conv3_fused_padded(
    xp: jax.Array,
    kernel: jax.Array,
    scale: jax.Array,
    offset: jax.Array,
    residual: jax.Array | None = None,
    relu: bool = False,
    block_rows: int = 16,
    block_cols: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """VALID 3x3 conv of a pre-padded input with a fused epilogue.

    Computes `conv(xp, kernel) * scale + offset [+ residual] [relu]` in one
    Pallas pass — the inference-mode resblock step (eval-mode batch/instance
    norm is a per-channel affine; caller folds the conv bias and the norm
    stats into `scale`/`offset`). Same contract as conv3_pallas_padded plus
    Co % 128 == 0 (the epilogue broadcasts over lanes).
    """
    b, hp, wp, ci = xp.shape
    h, w = hp - 2, wp - 2
    co = kernel.shape[-1]
    assert kernel.shape[:2] == (3, 3), kernel.shape
    assert ci % 128 == 0 and co % 128 == 0, (ci, co)
    br, tw = block_rows, block_cols
    assert h % br == 0 and w % tw == 0, (h, w, br, tw)

    kcat = kernel.reshape(3, 3 * ci, co)
    ab = jnp.stack(
        [scale.astype(jnp.float32), offset.astype(jnp.float32)]
    )

    tw_in = -(-(tw + 2) // 128) * 128
    if wp < (w - tw) + tw_in:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, (w - tw) + tw_in - wp), (0, 0)))

    res = residual if residual is not None else jnp.zeros((b, 1, 1, co), xp.dtype)
    res_spec = (
        pl.BlockSpec(
            (1, br, tw, co), lambda bi, yi, xi: (bi, yi, xi, 0),
            memory_space=pltpu.VMEM,
        )
        if residual is not None
        else pl.BlockSpec(
            (1, 1, 1, co), lambda bi, yi, xi: (bi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    )

    grid = (b, h // br, w // tw)
    return pl.pallas_call(
        functools.partial(
            _conv3_fused_kernel, BR=br, TW=tw, RELU=relu,
            RES=residual is not None,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (Element(1), Element(br + 2), Element(tw_in), Element(ci)),
                lambda bi, yi, xi: (bi, yi * br, xi * tw, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (3, 3 * ci, co), lambda bi, yi, xi: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2, co), lambda bi, yi, xi: (0, 0),
                         memory_space=pltpu.VMEM),
            res_spec,
        ],
        out_specs=pl.BlockSpec(
            (1, br, tw, co), lambda bi, yi, xi: (bi, yi, xi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), xp.dtype),
        scratch_shapes=[pltpu.VMEM((br + 2, tw, 3 * ci), xp.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, kcat, ab, res)


def pick_blocks(h: int, w: int, ci: int, co: int):
    """Largest (block_rows, block_cols) whose VMEM working set fits.

    Dominant allocations: the double-buffered input block, the im2col
    scratch ((br+2, tw, 3*Ci)), and the f32 accumulator. Returns None
    when no aligned tiling fits (caller falls back to the XLA conv).
    """
    if ci % 128:
        return None
    for br in (32, 16, 8):
        if h % br:
            continue
        for tw in (512, 256, 128, 64, 32):
            if w % tw:
                continue
            tw_in = -(-(tw + 2) // 128) * 128
            in_bytes = (br + 2) * tw_in * ci * 2
            xcat_bytes = (br + 2) * tw * 3 * ci * 2
            acc_bytes = br * tw * max(co, 128) * 4
            kcat_bytes = 9 * ci * co * 2
            total = 2 * in_bytes + xcat_bytes + 3 * acc_bytes + kcat_bytes
            if total <= 64 * 1024 * 1024:
                return br, tw
    return None


def _conv3_xla(xp: jax.Array, kernel: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        xp, kernel.astype(xp.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv3_fwd_impl(xp: jax.Array, kernel: jax.Array) -> jax.Array:
    b, hp, wp, ci = xp.shape
    h, w = hp - 2, wp - 2
    on_tpu = jax.default_backend() in ("tpu", "axon")
    blocks = pick_blocks(h, w, ci, kernel.shape[-1]) if on_tpu else None
    if blocks is not None and h * w >= 32 * 32:
        return conv3_pallas_padded(xp, kernel.astype(xp.dtype), *blocks)
    return _conv3_xla(xp, kernel)


@jax.custom_vjp
def conv3_padded(xp: jax.Array, kernel: jax.Array) -> jax.Array:
    """VALID 3x3 conv of a pre-padded input via the Pallas kernel.

    Dispatches to the im2col-K Pallas kernel on TPU when the shape
    qualifies (Ci % 128 == 0, aligned tiling available), else the XLA
    conv. Backward is the VJP of the identical XLA formulation.
    """
    return _conv3_fwd_impl(xp, kernel)


def _conv3_vjp_fwd(xp, kernel):
    return _conv3_fwd_impl(xp, kernel), (xp, kernel)


def _conv3_vjp_bwd(res, dy):
    xp, kernel = res
    _, vjp = jax.vjp(_conv3_xla, xp, kernel)
    return vjp(dy)


conv3_padded.defvjp(_conv3_vjp_fwd, _conv3_vjp_bwd)
