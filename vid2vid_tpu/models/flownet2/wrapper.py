"""Reference-flow estimator wrapper (the vid2vid `FlowNet` model).

Reference semantics (reference: models/flownet.py:25-63):
  - resize the frame pair bilinearly to (h//64*64, w//64*64);
  - run FlowNet2;
  - confidence = (||im1 - warp(im2, flow)||^2 < 0.02), where the norm is the
    channel *sum of squares* (no sqrt);
  - resize flow and confidence back, scaling flow by old_h/new_h.

Operates on (B, T, H, W, 3) frame stacks by flattening time, like the
reference's 5-D path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vid2vid_tpu.models.flownet2.flownet2 import FlowNet2
from vid2vid_tpu.ops.resize import make_divisible, resize_bilinear
from vid2vid_tpu.ops.warp import flow_warp


class FlowEstimator:
    """Frozen FlowNet2 + confidence computation (inference only)."""

    def __init__(self, conf_threshold: float = 0.02):
        self.net = FlowNet2()
        self.conf_threshold = conf_threshold
        # jit here, not at call sites: an eager FlowNet2 forward dispatches
        # hundreds of ops individually (catastrophic on remote platforms),
        # and every Trainer chunk calls this once per chunk
        self._compute = jax.jit(self._compute)

    def init(self, key: jax.Array, height: int = 64, width: int = 64):
        h, w = make_divisible(height, 64) or 64, make_divisible(width, 64) or 64
        z = jnp.zeros((1, h, w, 3))
        return self.net.init(key, z, z)

    def __call__(self, params, im1: jax.Array, im2: jax.Array):
        """Flow + confidence for (B, T, H, W, 3) or (B, H, W, 3) pairs.

        Returns (flow, conf) with shapes (..., H, W, 2) and (..., H, W, 1).
        """
        if im1.ndim == 5:
            b, t = im1.shape[:2]
            flat1 = im1.reshape((b * t,) + im1.shape[2:])
            flat2 = im2.reshape((b * t,) + im2.shape[2:])
            flow, conf = self._compute(params, flat1, flat2)
            return (
                flow.reshape((b, t) + flow.shape[1:]),
                conf.reshape((b, t) + conf.shape[1:]),
            )
        return self._compute(params, im1, im2)

    def _compute(self, params, im1, im2):
        old_h, old_w = im1.shape[1], im1.shape[2]
        new_h, new_w = make_divisible(old_h, 64), make_divisible(old_w, 64)
        resized = old_h != new_h or old_w != new_w
        if resized:
            im1s = resize_bilinear(im1, new_h, new_w)
            im2s = resize_bilinear(im2, new_h, new_w)
        else:
            im1s, im2s = im1, im2

        flow = self.net.apply(params, im1s, im2s)
        err = jnp.sum(
            (im1s - flow_warp(im2s, flow)) ** 2, axis=-1, keepdims=True
        )
        conf = (err < self.conf_threshold).astype(flow.dtype)

        if resized:
            flow = resize_bilinear(flow, old_h, old_w) * (old_h / new_h)
            conf = resize_bilinear(conf, old_h, old_w)
        return jax.lax.stop_gradient(flow), jax.lax.stop_gradient(conf)
