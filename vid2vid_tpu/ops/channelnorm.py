"""Per-pixel L2 norm across channels (the FlowNet2 ChannelNorm op).

Reference: models/flownet2_pytorch/networks/channelnorm_package/
channelnorm_kernel.cu:18-60 — out[b, 0, y, x] = sqrt(sum_c x[b, c, y, x]^2).
Trivial in XLA; kept as a named op for kernel-parity accounting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def channel_norm(x: jax.Array, keepdims: bool = True) -> jax.Array:
    """sqrt(sum(x^2, axis=-1)) over the channel axis of an NHWC array."""
    return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=keepdims))
