"""FlowNet component networks in flax (NHWC).

Architectures follow the reference exactly (reference:
models/flownet2_pytorch/networks/{FlowNetC,FlowNetS,FlowNetSD,FlowNetFusion}.py,
submodules.py): conv(k, s, pad=(k-1)//2) + LeakyReLU(0.1), deconv =
ConvTranspose(4, 2, 1) + LeakyReLU(0.1), flow heads are 3x3 convs to 2
channels, flow upsampling between decoder levels is a learned
ConvTranspose(2->2, 4, 2, 1). batchNorm=False configuration (the one
FlowNet2's published checkpoint uses): plain conv with bias.

The correlation layer is vid2vid_tpu.ops.correlation (the 441-channel
cost volume) followed by LeakyReLU(0.1).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vid2vid_tpu.nn.layers import Conv, ConvTranspose
from vid2vid_tpu.ops.correlation import correlation


class ConvL(nn.Module):
    """conv(k, s, pad=(k-1)//2) + LeakyReLU(0.1)."""

    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = Conv(
            self.features, self.kernel, self.stride, (self.kernel - 1) // 2
        )(x)
        return nn.leaky_relu(x, 0.1)


class IConv(nn.Module):
    """i_conv: conv without activation (SD / Fusion inter-convs)."""

    features: int

    @nn.compact
    def __call__(self, x):
        return Conv(self.features, 3, 1, 1)(x)


class Deconv(nn.Module):
    """ConvTranspose(4, 2, 1) + LeakyReLU(0.1) — exact 2x upsample."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = ConvTranspose(self.features, kernel=4, stride=2, pad=1, output_padding=0)(x)
        return nn.leaky_relu(x, 0.1)


class PredictFlow(nn.Module):
    @nn.compact
    def __call__(self, x):
        return Conv(2, 3, 1, 1)(x)


class UpFlow(nn.Module):
    """Learned 2x flow upsampling: ConvTranspose(2->2, 4, 2, 1)."""

    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return ConvTranspose(
            2, kernel=4, stride=2, pad=1, output_padding=0, use_bias=self.use_bias
        )(x)


class _Encoder6(nn.Module):
    """conv3_1..conv6_1 shared by C and S variants: input at 1/8 res."""

    @nn.compact
    def __call__(self, x):
        c3_1 = ConvL(256, name="conv3_1")(x)
        c4 = ConvL(512, stride=2, name="conv4")(c3_1)
        c4_1 = ConvL(512, name="conv4_1")(c4)
        c5 = ConvL(512, stride=2, name="conv5")(c4_1)
        c5_1 = ConvL(512, name="conv5_1")(c5)
        c6 = ConvL(1024, stride=2, name="conv6")(c5_1)
        c6_1 = ConvL(1024, name="conv6_1")(c6)
        return c3_1, c4_1, c5_1, c6_1


class _Decoder(nn.Module):
    """FlowNetC/S refinement decoder from 1/64 back to 1/4 resolution."""

    upflow_bias: bool = True

    @nn.compact
    def __call__(self, out_conv2, out_conv3, out_conv4, out_conv5, out_conv6):
        flow6 = PredictFlow(name="predict_flow6")(out_conv6)
        flow6_up = UpFlow(self.upflow_bias, name="upflow6")(flow6)
        deconv5 = Deconv(512, name="deconv5")(out_conv6)

        concat5 = jnp.concatenate([out_conv5, deconv5, flow6_up], -1)
        flow5 = PredictFlow(name="predict_flow5")(concat5)
        flow5_up = UpFlow(self.upflow_bias, name="upflow5")(flow5)
        deconv4 = Deconv(256, name="deconv4")(concat5)

        concat4 = jnp.concatenate([out_conv4, deconv4, flow5_up], -1)
        flow4 = PredictFlow(name="predict_flow4")(concat4)
        flow4_up = UpFlow(self.upflow_bias, name="upflow4")(flow4)
        deconv3 = Deconv(128, name="deconv3")(concat4)

        concat3 = jnp.concatenate([out_conv3, deconv3, flow4_up], -1)
        flow3 = PredictFlow(name="predict_flow3")(concat3)
        flow3_up = UpFlow(self.upflow_bias, name="upflow3")(flow3)
        deconv2 = Deconv(64, name="deconv2")(concat3)

        concat2 = jnp.concatenate([out_conv2, deconv2, flow3_up], -1)
        flow2 = PredictFlow(name="predict_flow2")(concat2)
        return flow2, flow3, flow4, flow5, flow6


class FlowNetC(nn.Module):
    """Siamese encoder + correlation cost volume + refinement decoder.

    Input: (B, H, W, 6) stacked frame pair; output flow2 at 1/4 res (all
    five pyramid flows when train=True).
    """

    train_outputs: bool = False

    @nn.compact
    def __call__(self, x):
        x1, x2 = x[..., :3], x[..., 3:]
        conv1 = ConvL(64, 7, 2, name="conv1")
        conv2 = ConvL(128, 5, 2, name="conv2")
        conv3 = ConvL(256, 5, 2, name="conv3")

        a1 = conv1(x1)
        a2 = conv2(a1)
        a3 = conv3(a2)
        b3 = conv3(conv2(conv1(x2)))

        corr = nn.leaky_relu(correlation(a3, b3), 0.1)
        redir = ConvL(32, 1, 1, name="conv_redir")(a3)
        merged = jnp.concatenate([redir, corr], -1)  # 473 ch

        c3_1, c4_1, c5_1, c6_1 = _Encoder6(name="enc")(merged)
        flows = _Decoder(name="dec")(a2, c3_1, c4_1, c5_1, c6_1)
        return flows if self.train_outputs else (flows[0],)


class FlowNetS(nn.Module):
    """Plain encoder-decoder flow net (12-channel input in FlowNet2)."""

    train_outputs: bool = False

    @nn.compact
    def __call__(self, x):
        c1 = ConvL(64, 7, 2, name="conv1")(x)
        c2 = ConvL(128, 5, 2, name="conv2")(c1)
        c3 = ConvL(256, 5, 2, name="conv3")(c2)
        c3_1, c4_1, c5_1, c6_1 = _Encoder6(name="enc")(c3)
        flows = _Decoder(upflow_bias=False, name="dec")(c2, c3_1, c4_1, c5_1, c6_1)
        return flows if self.train_outputs else (flows[0],)


class FlowNetSD(nn.Module):
    """Small-displacement variant: 3x3 encoder + inter-conv refinement."""

    train_outputs: bool = False

    @nn.compact
    def __call__(self, x):
        c0 = ConvL(64, name="conv0")(x)
        c1 = ConvL(64, stride=2, name="conv1")(c0)
        c1_1 = ConvL(128, name="conv1_1")(c1)
        c2 = ConvL(128, stride=2, name="conv2")(c1_1)
        c2_1 = ConvL(128, name="conv2_1")(c2)
        c3 = ConvL(256, stride=2, name="conv3")(c2_1)
        c3_1 = ConvL(256, name="conv3_1")(c3)
        c4 = ConvL(512, stride=2, name="conv4")(c3_1)
        c4_1 = ConvL(512, name="conv4_1")(c4)
        c5 = ConvL(512, stride=2, name="conv5")(c4_1)
        c5_1 = ConvL(512, name="conv5_1")(c5)
        c6 = ConvL(1024, stride=2, name="conv6")(c5_1)
        c6_1 = ConvL(1024, name="conv6_1")(c6)

        flow6 = PredictFlow(name="predict_flow6")(c6_1)
        flow6_up = UpFlow(name="upflow6")(flow6)
        deconv5 = Deconv(512, name="deconv5")(c6_1)

        concat5 = jnp.concatenate([c5_1, deconv5, flow6_up], -1)
        inter5 = IConv(512, name="inter_conv5")(concat5)
        flow5 = PredictFlow(name="predict_flow5")(inter5)
        flow5_up = UpFlow(name="upflow5")(flow5)
        deconv4 = Deconv(256, name="deconv4")(concat5)

        concat4 = jnp.concatenate([c4_1, deconv4, flow5_up], -1)
        inter4 = IConv(256, name="inter_conv4")(concat4)
        flow4 = PredictFlow(name="predict_flow4")(inter4)
        flow4_up = UpFlow(name="upflow4")(flow4)
        deconv3 = Deconv(128, name="deconv3")(concat4)

        concat3 = jnp.concatenate([c3_1, deconv3, flow4_up], -1)
        inter3 = IConv(128, name="inter_conv3")(concat3)
        flow3 = PredictFlow(name="predict_flow3")(inter3)
        flow3_up = UpFlow(name="upflow3")(flow3)
        deconv2 = Deconv(64, name="deconv2")(concat3)

        concat2 = jnp.concatenate([c2_1, deconv2, flow3_up], -1)
        inter2 = IConv(64, name="inter_conv2")(concat2)
        flow2 = PredictFlow(name="predict_flow2")(inter2)
        if self.train_outputs:
            return flow2, flow3, flow4, flow5, flow6
        return (flow2,)


class FlowNetFusion(nn.Module):
    """2-level fusion net over the 11-channel branch-combination input."""

    @nn.compact
    def __call__(self, x):
        c0 = ConvL(64, name="conv0")(x)
        c1 = ConvL(64, stride=2, name="conv1")(c0)
        c1_1 = ConvL(128, name="conv1_1")(c1)
        c2 = ConvL(128, stride=2, name="conv2")(c1_1)
        c2_1 = ConvL(128, name="conv2_1")(c2)

        flow2 = PredictFlow(name="predict_flow2")(c2_1)
        flow2_up = UpFlow(name="upflow2")(flow2)
        deconv1 = Deconv(32, name="deconv1")(c2_1)

        concat1 = jnp.concatenate([c1_1, deconv1, flow2_up], -1)
        inter1 = IConv(32, name="inter_conv1")(concat1)
        flow1 = PredictFlow(name="predict_flow1")(inter1)
        flow1_up = UpFlow(name="upflow1")(flow1)
        deconv0 = Deconv(16, name="deconv0")(concat1)

        concat0 = jnp.concatenate([c0, deconv0, flow1_up], -1)
        inter0 = IConv(16, name="inter_conv0")(concat0)
        return PredictFlow(name="predict_flow0")(inter0)
