"""Pallas TPU kernel for the FlowNetC correlation cost volume.

MXU formulation: each program handles an 8-row band and one vertical
displacement dy — a batched (8, W, C) x (8, W, C) -> (8, W, W) row-pair
similarity matmul on the systolic array, then the 21 stride-2 horizontal
diagonals are extracted with iota-mask reductions on the VPU. The
dy-shifted input band is addressed with element-indexed block dims whose
padding yields zeros out of range, matching the reference CUDA kernel's
zero padding (reference: models/flownet2_pytorch/networks/
correlation_package/correlation_cuda_kernel.cu:73-147).

Output layout is channels-first (B, 441, H, W) with tc = dyi*21 + dxi
(dy-major); `correlation_pallas` transposes back to NHWC for parity with
vid2vid_tpu.ops.correlation_ref.

Fixed to the FlowNetC configuration (max_displacement=20, stride2=2).
H must be a multiple of 8; W, C ideally multiples of 128.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax._src.pallas.core import Element

_RAD = 10  # displacement radius in stride-2 units -> 21x21 grid
_NDISP = 2 * _RAD + 1
_ROWS = 8  # row band per program


def _corr_kernel(f1_ref, f2_ref, out_ref):
    f1 = f1_ref[0]  # (8, W, C)
    f2 = f2_ref[0]  # (8, W, C) — rows shifted by dy, zero-padded OOB
    w = f1.shape[1]
    inv_c = 1.0 / f1.shape[2]

    # batched row-pair similarity: m[r, x, x2] = <f1[r, x], f2[r, x2]>
    m = jax.lax.dot_general(
        f1, f2,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )

    rows = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    for dxi in range(_NDISP):
        shift = 2 * (dxi - _RAD)
        mask = (cols - rows == shift).astype(jnp.float32)
        out_ref[0, dxi] = jnp.sum(m * mask[None], axis=2) * inv_c


@functools.partial(jax.jit, static_argnames=("interpret",))
def correlation_pallas(
    f1: jax.Array, f2: jax.Array, interpret: bool = False
) -> jax.Array:
    """(B, H, W, C) x2 -> (B, H, W, 441) cost volume on the MXU."""
    b, h, w, c = f1.shape
    assert h % _ROWS == 0, f"H={h} must be a multiple of {_ROWS}"

    # explicit zero padding of the dy range (element-indexed block dims do
    # not zero-fill out-of-range reads)
    f2p = jnp.pad(f2, ((0, 0), (2 * _RAD, 2 * _RAD), (0, 0), (0, 0)))
    grid = (b, h // _ROWS, _NDISP)
    out = pl.pallas_call(
        _corr_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, _ROWS, w, c), lambda bi, yi, ji: (bi, yi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (Element(1), Element(_ROWS), Element(w), Element(c)),
                lambda bi, yi, ji: (bi, yi * _ROWS + 2 * ji, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, _NDISP, _ROWS, w), lambda bi, yi, ji: (bi, ji, yi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, _NDISP * _NDISP, h, w), jnp.float32
        ),
        interpret=interpret,
    )(f1, f2p)
    return jnp.transpose(out, (0, 2, 3, 1))


# Measured on TPU v5e at FlowNetC shapes (1, 128, 256, 256): this kernel
# 3.7 ms vs 1.9 ms for the fused XLA displacement scan in correlation.py,
# so the scan remains the default. Why banding cannot close the gap: the
# useful work is H*W*441*C*2 = 7.4 GFLOP; the XLA scan runs it on the VPU
# at ~4 TFLOP/s bf16 ==> ~1.85 ms, i.e. the scan already sits at VPU
# speed-of-light. In the MXU formulation the row-pair matmul itself is
# nearly free (<0.1 ms at MXU peak), but extracting the 21 stride-2
# diagonals from each (8, W, W) product is a VPU masked-reduction pass
# over W/42x redundant data — banding x2 to [x-20, x+20] shrinks the
# matmul, not the extraction, which still costs more VPU traffic than the
# whole scan. A kernel that beats the scan would need the displacement
# axis as the matmul N dim, which the moving f2 window makes impossible
# without per-x gather (im2col) costs exceeding the scan itself.
