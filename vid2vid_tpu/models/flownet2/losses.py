"""Flow training losses (reference: models/flownet2_pytorch/losses.py).

EPE (end-point error), L1/L2 norms, and the multiscale pyramid loss used
to train the component flow nets from scratch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vid2vid_tpu.ops.resize import resize_bilinear


def epe(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean end-point error: mean ||pred - target||_2 over pixels (NHWC)."""
    return jnp.mean(jnp.linalg.norm(pred - target, axis=-1))


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.linalg.norm(pred - target, axis=-1))


_MULTISCALE_WEIGHTS = (0.005, 0.01, 0.02, 0.08, 0.32)


def multiscale_flow_loss(
    flow_pyramid: tuple[jax.Array, ...],
    target: jax.Array,
    div_flow: float = 0.05,
    norm: str = "L1",
) -> tuple[jax.Array, jax.Array]:
    """Weighted pyramid loss over the five decoder flows (finest first).

    Returns (loss, epe_at_finest). The target is downscaled to each level;
    weights follow the reference's [0.005, 0.01, 0.02, 0.08, 0.32].
    """
    target = div_flow * target
    loss = 0.0
    norm_fn = l1_loss if norm == "L1" else l2_loss
    for w, flow in zip(_MULTISCALE_WEIGHTS, flow_pyramid):
        t = resize_bilinear(target, flow.shape[1], flow.shape[2])
        loss = loss + w * norm_fn(flow, t)
    finest_up = resize_bilinear(
        flow_pyramid[0], target.shape[1], target.shape[2]
    )
    return loss, epe(finest_up / div_flow, target / div_flow)
