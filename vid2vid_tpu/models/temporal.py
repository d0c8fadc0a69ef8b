"""Temporal-pyramid frame bookkeeping for the temporal discriminators.

Pure re-derivations of the reference's stateful buffer logic
(reference: models/vid2vid_model_D.py:275-328), operating on
(B, T, H, W, C) arrays. All slice indices are Python ints (buffer lengths
and chunk offsets are host-side scheduling state), so every call site is
static-shaped for XLA; the set of distinct shapes is bounded because the
chunk phase cycles with period tD^s.

Dense variant (`skipped_frames`): one growing buffer per stream; every
chunk, extract all stride-tD^s groups of tD frames that end inside the new
chunk, then trim the buffer to tD^(t_scales-1)*(tD-1) trailing frames.

Sparse variant (`skipped_frames_sparse`, --sparse_D): per-scale ring
buffers that only retain the stride-subsampled stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def skipped_frames(
    b_all: jax.Array | None,
    b_new: jax.Array,
    t_scales: int,
    td: int,
):
    """Dense temporally-subsampled group extraction.

    Args:
      b_all: (B, L, H, W, C) accumulated past frames (or None at clip start).
      b_new: (B, T, H, W, C) this chunk's frames.
      t_scales: number of temporal scales.
      td: frames per discriminator group (n_frames_D).

    Returns:
      (new_b_all, skipped): skipped[s] is (B*G_s, td, H, W, C) or None —
      G_s groups of td frames with stride td^s, each ending in this chunk.
    """
    if b_all is None:
        b_all = b_new
    else:
        b_all = jnp.concatenate(
            [jax.lax.stop_gradient(b_all), b_new], axis=1
        )
    length = b_all.shape[1]
    n_new = b_new.shape[1]

    skipped: list[jax.Array | None] = []
    for s in range(t_scales):
        tds = td**s
        span = tds * (td - 1)
        n_groups = min(length - span, n_new)
        groups = []
        for t in range(0, max(n_groups, 0), td):
            start = length - span - t - 1
            idx = list(range(start, length - t, tds))
            groups.append(b_all[:, jnp.asarray(idx)])
        skipped.append(jnp.concatenate(groups, axis=0) if groups else None)

    max_prev = td ** (t_scales - 1) * (td - 1)
    if length > max_prev:
        b_all = b_all[:, -max_prev:]
    return b_all, skipped


def skipped_flows(
    flow_all: jax.Array | None,
    conf_all: jax.Array | None,
    flow_new: jax.Array,
    conf_new: jax.Array,
    t_scales: int,
    td: int,
):
    """Scale-0 reference flows for the temporal groups (pure bookkeeping).

    Scale 0 reuses the adjacent-frame flows (dropping each group's first
    entry). Coarser scales need flow *recomputed* between the skipped real
    frames (reference: models/vid2vid_model_D.py:292-302) — that happens in
    the Trainer OUTSIDE this function, so a jit of this bookkeeping never
    traces the flow network: calling a params-closing flow_fn under an outer
    jit would bake all 162M FlowNet2 weights into the HLO as constants
    (same failure mode the direct path fixed by passing params as an
    argument inside FlowEstimator's own jit).
    """
    flow_all, fgroups = skipped_frames(flow_all, flow_new, 1, td)
    conf_all, cgroups = skipped_frames(conf_all, conf_new, 1, td)
    flow_skipped: list[jax.Array | None] = [None] * t_scales
    conf_skipped: list[jax.Array | None] = [None] * t_scales
    if fgroups[0] is not None:
        flow_skipped[0] = fgroups[0][:, 1:]
        conf_skipped[0] = cgroups[0][:, 1:]
    return flow_all, conf_all, flow_skipped, conf_skipped


def skipped_frames_sparse(
    b_all: list[jax.Array | None],
    b_new: jax.Array,
    t_scales: int,
    td: int,
    n_frames_load: int,
    chunk_start: int,
    is_flow: bool = False,
):
    """Sparse (--sparse_D) variant: per-scale subsampled ring buffers.

    `chunk_start` is the first frame index of this chunk within the clip
    (the reference's loop variable i).
    """
    b_all = list(b_all)
    skipped: list[jax.Array | None] = [None] * t_scales
    for s in range(t_scales):
        t_len = b_all[s].shape[1] if b_all[s] is not None else 0
        if t_len > 0 and t_len % td == 0:
            b_all[s] = b_all[s][:, -(td - 1):]

        if s == 0:
            b_all[0] = (
                jnp.concatenate([jax.lax.stop_gradient(b_all[0]), b_new], 1)
                if b_all[0] is not None
                else b_new
            )
        else:
            tds = td**s
            idx_start = 0 if chunk_start == 0 else tds - ((chunk_start - 1) % tds + 1)
            if idx_start < n_frames_load:
                tmp = b_new[:, idx_start::tds]
                b_all[s] = (
                    jnp.concatenate([jax.lax.stop_gradient(b_all[s]), tmp], 1)
                    if b_all[s] is not None
                    else tmp
                )

        t_len = b_all[s].shape[1] if b_all[s] is not None else 0
        if t_len >= td:
            b_all[s] = b_all[s][:, (t_len % td):]
            b, length = b_all[s].shape[0], b_all[s].shape[1]
            g = b_all[s].reshape((b * (length // td), td) + b_all[s].shape[2:])
            skipped[s] = g[:, 1:] if is_flow else g
    return b_all, skipped
