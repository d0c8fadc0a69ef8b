"""Input encoding ops: label one-hot, instance edge maps, foreground masks.

Reference semantics:
  - one-hot scatter over label_nc (reference: models/vid2vid_model_G.py:91-96)
  - instance boundary map: a pixel is an edge if it differs from any 4-neighbor
    (reference: models/base_model.py:146-152)
  - fg mask: sum of selected one-hot channels, clamped to [0,1]
    (reference: models/vid2vid_model_G.py:322-330)
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp


def label_one_hot(
    labels: jax.Array, num_classes: int, dtype: jnp.dtype = jnp.float32
) -> jax.Array:
    """One-hot encode an integer label map.

    Args:
      labels: (..., H, W) integer (or float holding integers) label map.
      num_classes: number of classes (label_nc).

    Returns:
      (..., H, W, num_classes) one-hot array.
    """
    return jax.nn.one_hot(labels.astype(jnp.int32), num_classes, dtype=dtype)


def instance_edges(inst: jax.Array) -> jax.Array:
    """Instance-boundary extraction.

    Args:
      inst: (..., H, W) instance-id map (any dtype; compared exactly).

    Returns:
      (..., H, W) float32 edge map: 1.0 where the pixel differs from its
      left/right/up/down neighbor, 0.0 elsewhere.
    """
    dx = inst[..., :, 1:] != inst[..., :, :-1]
    dy = inst[..., 1:, :] != inst[..., :-1, :]
    edge = jnp.zeros(inst.shape, jnp.bool_)
    edge = edge.at[..., :, 1:].set(dx)
    edge = edge.at[..., :, :-1].set(edge[..., :, :-1] | dx)
    edge = edge.at[..., 1:, :].set(edge[..., 1:, :] | dy)
    edge = edge.at[..., :-1, :].set(edge[..., :-1, :] | dy)
    return edge.astype(jnp.float32)


def fg_mask_from_onehot(
    onehot: jax.Array, fg_labels: Sequence[int]
) -> jax.Array:
    """Foreground mask = clamp(sum of the selected one-hot channels, 0, 1).

    Args:
      onehot: (..., H, W, C) one-hot label map.
      fg_labels: channel indices treated as foreground (e.g. [26] = car).

    Returns:
      (..., H, W, 1) float mask.
    """
    mask = onehot[..., fg_labels[0]]
    for idx in fg_labels[1:]:
        mask = mask + onehot[..., idx]
    return jnp.clip(mask, 0.0, 1.0)[..., None]
