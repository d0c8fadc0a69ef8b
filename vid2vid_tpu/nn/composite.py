"""The composite (flow-warped) video generators — the core of vid2vid.

Reference behavior (reference: models/networks.py:117-325):

CompositeGenerator (coarsest scale, `netG0`):
  two parallel encoder trunks — one over the stacked label maps, one over the
  stacked previous frames — are *summed*; an image head (resblocks → upsample
  → tanh) produces the hallucinated "raw" frame; a flow head (its own
  resblocks → upsample) predicts optical flow (×20) and a sigmoid occlusion
  weight; the output frame is `raw*w + warp(prev_frame, flow)*(1-w)`; an
  optional independent foreground branch is alpha-composited by a mask.

CompositeLocalGenerator (finer scales, `netG1..`):
  single-downsample trunks; the coarser scale's pre-head features are *added*
  to the trunk output before the residual/upsample stages; flow magnitude
  scales as 20·2^scale.

Architecture notes vs the reference: identical math, but NHWC, fused
warp+blend, and module names that make the checkpoint mapping explicit
(down_seg/down_img/res_img/up_img/final_img/res_flow/up_flow/final_flow/
final_w/fg_*).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vid2vid_tpu.nn.blocks import (
    ConvHead,
    ConvStem,
    DownBlock,
    ResnetBlock,
    TanhHead,
    UpBlock,
)
from vid2vid_tpu.ops.warp import flow_warp


class CompositeOut(NamedTuple):
    """Single-scale generator outputs (None for disabled branches)."""

    img_final: jax.Array
    flow: jax.Array | None
    weight: jax.Array | None
    img_raw: jax.Array
    img_feat: jax.Array
    flow_feat: jax.Array | None
    fg_feat: jax.Array | None


def _blend(raw, prev_frame, flow, weight):
    """raw·w + warp(prev, flow)·(1-w) — the temporal composite."""
    warped = flow_warp(prev_frame, flow)
    return raw * weight + warped * (1.0 - weight)


class _Trunk(nn.Module):
    """Stem + n_downsampling stride-2 blocks + n_res resblocks."""

    ngf: int
    n_downsampling: int
    n_res: int
    norm: str

    @nn.compact
    def __call__(self, x, train=False):
        x = ConvStem(self.ngf, self.norm)(x, train)
        for i in range(self.n_downsampling):
            x = DownBlock(self.ngf * 2 ** (i + 1), self.norm)(x, train)
        for _ in range(self.n_res):
            x = ResnetBlock(x.shape[-1], self.norm)(x, train)
        return x


class _UpStack(nn.Module):
    """n_res resblocks + n_up transpose-conv upsampling blocks."""

    ngf: int
    n_up: int
    n_res: int
    norm: str

    @nn.compact
    def __call__(self, x, train=False):
        for _ in range(self.n_res):
            x = ResnetBlock(x.shape[-1], self.norm)(x, train)
        for i in range(self.n_up):
            x = UpBlock(self.ngf * 2 ** (self.n_up - 1 - i), self.norm)(x, train)
        return x


class CompositeGenerator(nn.Module):
    """Full composite generator (coarsest scale / netG0).

    Inputs are channel-stacked over time: `labels` is (B, H, W, tG·C_in),
    `prev_frames` is (B, H, W, (tG-1)·3) with the most recent frame last.
    """

    output_nc: int = 3
    ngf: int = 128
    n_downsampling: int = 3
    n_blocks: int = 9
    norm: str = "batch"
    use_fg: bool = False
    no_flow: bool = False

    @nn.compact
    def __call__(
        self,
        labels: jax.Array,
        prev_frames: jax.Array,
        mask: jax.Array | None = None,
        use_raw_only: bool = False,
        train: bool = False,
    ) -> CompositeOut:
        nd, nb, ngf = self.n_downsampling, self.n_blocks, self.ngf
        n_res_down, n_res_up = nb - nb // 2, nb // 2

        d = _Trunk(ngf, nd, n_res_down, self.norm, name="down_seg")(labels, train)
        d = d + _Trunk(ngf, nd, n_res_down, self.norm, name="down_img")(
            prev_frames, train
        )

        img_feat = _UpStack(ngf, nd, n_res_up, self.norm, name="up_img")(d, train)
        img_raw = TanhHead(self.output_nc, name="final_img")(img_feat)

        flow = weight = flow_feat = None
        if not self.no_flow:
            flow_feat = _UpStack(ngf, nd, n_res_up, self.norm, name="up_flow")(
                d, train
            )
            flow = ConvHead(2, name="final_flow")(flow_feat) * 20.0
            weight = ConvHead(1, sigmoid=True, name="final_w")(flow_feat)

        if use_raw_only or self.no_flow:
            img_final = img_raw
        else:
            img_final = _blend(img_raw, prev_frames[..., -3:], flow, weight)

        fg_feat = None
        if self.use_fg:
            ngf_i = ngf // 2 if nd > 2 else ngf
            h = _Trunk(ngf_i, nd, nb, self.norm, name="fg_down")(labels, train)
            fg_feat = _UpStack(ngf_i, nd, 0, self.norm, name="fg_up")(h, train)
            img_fg = TanhHead(self.output_nc, name="fg_final")(fg_feat)
            img_final = img_fg * mask + img_final * (1.0 - mask)
            img_raw = img_fg * mask + img_raw * (1.0 - mask)

        return CompositeOut(
            img_final, flow, weight, img_raw, img_feat, flow_feat, fg_feat
        )


class CompositeLocalGenerator(nn.Module):
    """Enhancer scale (netG1..): refines a coarser scale's features at 2x res.

    `coarse` carries the coarser scale's (img_feat, flow_feat, fg_feat),
    added to the trunk outputs before the residual/up stages.
    """

    output_nc: int = 3
    ngf: int = 64
    n_blocks_local: int = 3
    n_downsample_g: int = 3  # only selects the fg-branch width
    scale: int = 1
    norm: str = "batch"
    use_fg: bool = False
    no_flow: bool = False

    @nn.compact
    def __call__(
        self,
        labels: jax.Array,
        prev_frames: jax.Array,
        coarse: CompositeOut,
        mask: jax.Array | None = None,
        use_raw_only: bool = False,
        train: bool = False,
    ) -> CompositeOut:
        ngf, nbl = self.ngf, self.n_blocks_local

        d = _Trunk(ngf, 1, 0, self.norm, name="down_seg")(labels, train)
        d = d + _Trunk(ngf, 1, 0, self.norm, name="down_img")(prev_frames, train)

        img_feat = _UpStack(ngf, 1, nbl, self.norm, name="up_img")(
            d + coarse.img_feat, train
        )
        img_raw = TanhHead(self.output_nc, name="final_img")(img_feat)

        flow = weight = flow_feat = None
        if not self.no_flow:
            flow_feat = _UpStack(ngf, 1, nbl, self.norm, name="up_flow")(
                d + coarse.flow_feat, train
            )
            flow = ConvHead(2, name="final_flow")(flow_feat) * (20.0 * 2**self.scale)
            weight = ConvHead(1, sigmoid=True, name="final_w")(flow_feat)

        if use_raw_only or self.no_flow:
            img_final = img_raw
        else:
            img_final = _blend(img_raw, prev_frames[..., -3:], flow, weight)

        fg_feat = None
        if self.use_fg:
            ngf_i = ngf // 2 if self.n_downsample_g > 2 else ngf
            h = _Trunk(ngf_i, 1, 0, self.norm, name="fg_down")(labels, train)
            fg_feat = _UpStack(ngf_i, 1, nbl, self.norm, name="fg_up")(
                h + coarse.fg_feat, train
            )
            img_fg = TanhHead(self.output_nc, name="fg_final")(fg_feat)
            img_final = img_fg * mask + img_final * (1.0 - mask)
            img_raw = img_fg * mask + img_raw * (1.0 - mask)

        return CompositeOut(
            img_final, flow, weight, img_raw, img_feat, flow_feat, fg_feat
        )
