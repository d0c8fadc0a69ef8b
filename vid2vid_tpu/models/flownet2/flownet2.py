"""FlowNet2 composite model and its C/CS/CSS variants.

Reference dataflow (reference: models/flownet2_pytorch/models.py:96-161):
mean-RGB normalize → FlowNetC → (warp + diff + channel-norm) → FlowNetS1 →
(same) → FlowNetS2 ∥ FlowNetSD → FlowNetFusion over an 11-channel
combination. div_flow = 20. Bilinear x4 upsampling after C/S1
(align_corners=False), nearest x4 after S2/SD.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vid2vid_tpu.models.flownet2.nets import (
    FlowNetC,
    FlowNetFusion,
    FlowNetS,
    FlowNetSD,
)
from vid2vid_tpu.ops.channelnorm import channel_norm
from vid2vid_tpu.ops.resize import resize_bilinear
from vid2vid_tpu.ops.warp import flow_warp


def _mean_normalize(x1: jax.Array, x2: jax.Array, rgb_max: float = 1.0):
    """Subtract the per-(image,channel) mean over both frames."""
    mean = jnp.mean(
        jnp.stack([x1, x2], 1), axis=(1, 2, 3), keepdims=True
    )[:, 0]
    return (x1 - mean) / rgb_max, (x2 - mean) / rgb_max


def _up4_bilinear(flow: jax.Array) -> jax.Array:
    h, w = flow.shape[1] * 4, flow.shape[2] * 4
    return resize_bilinear(flow, h, w)


def _up4_nearest(flow: jax.Array) -> jax.Array:
    h, w = flow.shape[1] * 4, flow.shape[2] * 4
    return jax.image.resize(flow, flow.shape[:1] + (h, w) + flow.shape[3:], "nearest")


class FlowNet2(nn.Module):
    """Full five-network FlowNet2 (162.5M params in the reference)."""

    div_flow: float = 20.0
    rgb_max: float = 1.0

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array) -> jax.Array:
        """x1, x2: (B, H, W, 3) frame pair, H and W divisible by 64.

        Returns (B, H, W, 2) flow from x1 to x2... (matching the reference's
        convention: flow warps x2 toward x1).
        """
        x1, x2 = _mean_normalize(x1, x2, self.rgb_max)
        x = jnp.concatenate([x1, x2], -1)

        # --- FlowNetC
        (c_flow2,) = FlowNetC(name="flownetc")(x)
        c_flow = _up4_bilinear(c_flow2 * self.div_flow)
        warped1 = flow_warp(x2, c_flow)
        diff = channel_norm(x1 - warped1)
        concat1 = jnp.concatenate([x, warped1, c_flow / self.div_flow, diff], -1)

        # --- FlowNetS1
        (s1_flow2,) = FlowNetS(name="flownets_1")(concat1)
        s1_flow = _up4_bilinear(s1_flow2 * self.div_flow)
        warped1 = flow_warp(x2, s1_flow)
        diff = channel_norm(x1 - warped1)
        concat2 = jnp.concatenate([x, warped1, s1_flow / self.div_flow, diff], -1)

        # --- FlowNetS2 (large displacement branch)
        (s2_flow2,) = FlowNetS(name="flownets_2")(concat2)
        s2_flow = _up4_nearest(s2_flow2 * self.div_flow)
        norm_s2 = channel_norm(s2_flow)
        diff_s2 = channel_norm(x1 - flow_warp(x2, s2_flow))

        # --- FlowNetSD (small displacement branch)
        (sd_flow2,) = FlowNetSD(name="flownets_d")(x)
        sd_flow = _up4_nearest(sd_flow2 / self.div_flow)
        norm_sd = channel_norm(sd_flow)
        diff_sd = channel_norm(x1 - flow_warp(x2, sd_flow))

        # --- Fusion
        concat3 = jnp.concatenate(
            [x1, sd_flow, s2_flow, norm_sd, norm_s2, diff_sd, diff_s2], -1
        )
        return FlowNetFusion(name="flownetfusion")(concat3)


class FlowNet2C(nn.Module):
    """FlowNetC alone, full-resolution output (reference FlowNet2C)."""

    div_flow: float = 20.0
    rgb_max: float = 1.0

    @nn.compact
    def __call__(self, x1, x2):
        x1, x2 = _mean_normalize(x1, x2, self.rgb_max)
        (flow2,) = FlowNetC(name="flownetc")(jnp.concatenate([x1, x2], -1))
        return _up4_bilinear(flow2 * self.div_flow)


class FlowNet2CS(nn.Module):
    """FlowNetC -> FlowNetS1 cascade (reference FlowNet2CS)."""

    div_flow: float = 20.0
    rgb_max: float = 1.0

    @nn.compact
    def __call__(self, x1, x2):
        x1, x2 = _mean_normalize(x1, x2, self.rgb_max)
        x = jnp.concatenate([x1, x2], -1)
        (c_flow2,) = FlowNetC(name="flownetc")(x)
        c_flow = _up4_bilinear(c_flow2 * self.div_flow)
        warped1 = flow_warp(x2, c_flow)
        diff = channel_norm(x1 - warped1)
        concat1 = jnp.concatenate([x, warped1, c_flow / self.div_flow, diff], -1)
        (s1_flow2,) = FlowNetS(name="flownets_1")(concat1)
        return _up4_bilinear(s1_flow2 * self.div_flow)


class FlowNet2CSS(nn.Module):
    """FlowNetC -> S1 -> S2 cascade (reference FlowNet2CSS)."""

    div_flow: float = 20.0
    rgb_max: float = 1.0

    @nn.compact
    def __call__(self, x1, x2):
        x1, x2 = _mean_normalize(x1, x2, self.rgb_max)
        x = jnp.concatenate([x1, x2], -1)
        (c_flow2,) = FlowNetC(name="flownetc")(x)
        c_flow = _up4_bilinear(c_flow2 * self.div_flow)
        warped1 = flow_warp(x2, c_flow)
        diff = channel_norm(x1 - warped1)
        concat1 = jnp.concatenate([x, warped1, c_flow / self.div_flow, diff], -1)
        (s1_flow2,) = FlowNetS(name="flownets_1")(concat1)
        s1_flow = _up4_bilinear(s1_flow2 * self.div_flow)
        warped1 = flow_warp(x2, s1_flow)
        diff = channel_norm(x1 - warped1)
        concat2 = jnp.concatenate([x, warped1, s1_flow / self.div_flow, diff], -1)
        (s2_flow2,) = FlowNetS(name="flownets_2")(concat2)
        return _up4_bilinear(s2_flow2 * self.div_flow)
