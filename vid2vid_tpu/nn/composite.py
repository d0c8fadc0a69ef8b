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
  to the trunk outputs before the residual/upsample stages; flow magnitude
  scales as 20·2^scale.

TPU-native structure (identical math to the reference, reassociated only):
full-resolution 7x7 convolutions dominate the frame cost on TPU (~20 ms
each at 2048x1024 regardless of channel width), so the three input stems
(seg trunk, image trunk, fg trunk) run as ONE fused conv over the
concatenated inputs with a block kernel, and the three output heads
(raw image, flow+weight, fg image) as another — zero cross-blocks
contribute nothing, and per-branch kernels remain separate parameters so
checkpoint import is a pure rearrangement (see utils/torch_import.py).
"""

from __future__ import annotations

import os
import sys
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vid2vid_tpu.nn.blocks import DownBlock, ResnetBlock, UpBlock
from vid2vid_tpu.nn.layers import Norm, conv_kernel_init, reflect_pad
from vid2vid_tpu.ops.respair_pallas import (
    pad_respair,
    pick_blocks_respair,
    respair_pallas,
)
from vid2vid_tpu.ops.tapstack import conv7_tapstack
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


class FusedConv7(nn.Module):
    """N reflect-padded 7x7 convs over slices of one input, as one pass.

    specs: (name, (in_start, in_end), out_ch) per branch; parameters stay
    per-branch ("{name}_kernel"/"{name}_bias") and are assembled into a
    block kernel at apply time, so the math and the checkpoint mapping are
    those of N separate convolutions.
    """

    specs: tuple

    @nn.compact
    def __call__(self, x: jax.Array):
        total_in = x.shape[-1]
        total_out = sum(co for _, _, co in self.specs)
        kernel = jnp.zeros((7, 7, total_in, total_out), x.dtype)
        bias = jnp.zeros((total_out,), x.dtype)
        off = 0
        for name, (i0, i1), co in self.specs:
            k = self.param(
                f"{name}_kernel", conv_kernel_init, (7, 7, i1 - i0, co),
                jnp.float32,
            )
            b = self.param(
                f"{name}_bias", nn.initializers.zeros, (co,), jnp.float32
            )
            kernel = kernel.at[:, :, i0:i1, off : off + co].set(
                k.astype(x.dtype)
            )
            bias = bias.at[off : off + co].set(b.astype(x.dtype))
            off += co
        if total_out <= 16:
            # tiny-Co heads: the conv contraction pads N=Co to 128 on the
            # MXU (~7% fill, 26.5 ms at 2048x1024); the tap-stacked 1x1
            # matmul + shift-reduce formulation is the same math at proper
            # MXU fill — see ops/tapstack.py and PERF.md
            out = conv7_tapstack(reflect_pad(x, 3), kernel) + bias
        else:
            # plain XLA conv: measured within ~15% of the Pallas-kernel
            # floor for these shapes on v5e — see ops/conv7_pallas.py
            out = jax.lax.conv_general_dilated(
                reflect_pad(x, 3), kernel, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
        outs = []
        off = 0
        for _, _, co in self.specs:
            outs.append(out[..., off : off + co])
            off += co
        return tuple(outs)


class _FusedResPair(nn.Module):
    """One ResnetBlock step of TWO equal-width branches as dense ops.

    The enhancer scales run the img and flow up-stacks at 32-64 channels,
    where a single conv fills only half the MXU's 128 lanes (measured on
    v5e @1024x512: one 64->64 3x3 conv 3.05 ms, the fused dense 128->128
    3.75 ms vs 6.1 ms for the two separate convs — XLA's grouped conv is
    slower still at 12-16 ms, hence block-diagonal dense kernels).
    Per-branch kernels stay separate parameters; the zero off-diagonal
    blocks make the math exactly two independent residual blocks. Norms
    are per-channel, so they apply to the channel slices unfused.
    """

    features: int  # per-branch width
    norm: str
    fuse: bool = False  # eval-mode Pallas fused conv+norm+relu+skip

    def _kernel_bias(self, tag, dtype):
        c = self.features
        kernel = jnp.zeros((3, 3, 2 * c, 2 * c), dtype)
        bias = jnp.zeros((2 * c,), jnp.float32)
        for i, br in enumerate(("img", "flow")):
            k = self.param(
                f"{br}_conv{tag}_kernel", conv_kernel_init, (3, 3, c, c),
                jnp.float32,
            )
            b = self.param(
                f"{br}_conv{tag}_bias", nn.initializers.zeros, (c,),
                jnp.float32,
            )
            kernel = kernel.at[:, :, i * c : (i + 1) * c,
                               i * c : (i + 1) * c].set(k.astype(dtype))
            bias = bias.at[i * c : (i + 1) * c].set(b)
        return kernel, bias

    def _conv(self, x, tag):
        kernel, bias = self._kernel_bias(tag, x.dtype)
        return jax.lax.conv_general_dilated(
            reflect_pad(x, 1), kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias.astype(x.dtype)

    def _norms(self, x, tag, train, want_affine=False):
        c = self.features
        if want_affine:
            _, (ai, bi) = Norm(self.norm, name=f"img_norm{tag}")(
                x[..., :c], False, want_affine=True
            )
            _, (af, bf) = Norm(self.norm, name=f"flow_norm{tag}")(
                x[..., c:], False, want_affine=True
            )
            return jnp.concatenate([ai, af]), jnp.concatenate([bi, bf])
        return jnp.concatenate(
            [
                Norm(self.norm, name=f"img_norm{tag}")(x[..., :c], train),
                Norm(self.norm, name=f"flow_norm{tag}")(x[..., c:], train),
            ],
            -1,
        )

    def _fused(self, x):
        """The whole respair (both convs + norms + relu + skip) as ONE
        Pallas call (round 5, ops/respair_pallas.py): the intermediate
        stays VMEM-resident, reflect pads never materialize, and XLA fuses
        the producer (the enhancer's d + coarse_feat adds and the img/flow
        concat) into the single pad_respair write the kernel consumes —
        the boundary-traffic fix PERF.md's round-4 roofline ranks #1.
        """
        br, tw = pick_blocks_respair(
            x.shape[1], x.shape[2], 2 * self.features, x.dtype.itemsize
        )
        if os.environ.get("VID2VID_FUSE_DEBUG"):
            print(f"[fuse] _FusedResPair {x.shape} blocks=({br},{tw})",
                  file=sys.stderr)
        if os.environ.get("VID2VID_RESPAIR_BARRIER"):
            # A/B knob: does an optimization barrier stop the custom-call's
            # layout constraint from poisoning upstream conv emitters?
            x = jax.lax.optimization_barrier(x)
        interpret = jax.default_backend() not in ("tpu", "axon")
        k0, b0 = self._kernel_bias("0", x.dtype)
        k1, b1 = self._kernel_bias("1", x.dtype)
        a0, c0 = self._norms(x, "0", False, want_affine=True)
        a1, c1 = self._norms(x, "1", False, want_affine=True)
        return respair_pallas(
            pad_respair(x), k0, (a0, c0 + b0 * a0), k1, (a1, c1 + b1 * a1),
            block_rows=br, block_cols=tw, interpret=interpret,
        )

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if (
            self.fuse
            and not train
            and pick_blocks_respair(
                x.shape[1], x.shape[2], 2 * self.features, x.dtype.itemsize
            )
            is not None
        ):
            return self._fused(x)
        h = nn.relu(self._norms(self._conv(x, "0"), "0", train))
        h = self._norms(self._conv(h, "1"), "1", train)
        return x + h


class _FusedUpBlockPair(nn.Module):
    """One UpBlock step (tconv + norm + relu) of two branches, fused.

    Same block-diagonal construction as _FusedResPair; the transpose conv
    reproduces torch ConvTranspose2d(3, 2, 1, 1) numerics exactly as in
    nn/layers.py ConvTranspose.
    """

    features: int  # per-branch output width
    norm: str

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        ci = x.shape[-1] // 2
        co = self.features
        kernel = jnp.zeros((3, 3, 2 * ci, 2 * co), x.dtype)
        bias = jnp.zeros((2 * co,), x.dtype)
        for i, br in enumerate(("img", "flow")):
            k = self.param(
                f"{br}_kernel", conv_kernel_init, (3, 3, ci, co), jnp.float32
            )
            b = self.param(
                f"{br}_bias", nn.initializers.zeros, (co,), jnp.float32
            )
            kernel = kernel.at[:, :, i * ci : (i + 1) * ci,
                               i * co : (i + 1) * co].set(k.astype(x.dtype))
            bias = bias.at[i * co : (i + 1) * co].set(b.astype(x.dtype))
        flipped = kernel[::-1, ::-1]
        out = jax.lax.conv_general_dilated(
            x, flipped, (1, 1), ((1, 2), (1, 2)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        out = jnp.concatenate(
            [
                Norm(self.norm, name="img_norm")(out[..., :co], train),
                Norm(self.norm, name="flow_norm")(out[..., co:], train),
            ],
            -1,
        )
        return nn.relu(out)


class _FusedUpPair(nn.Module):
    """img + flow _UpStacks of an enhancer scale, fused layer by layer."""

    ngf: int
    n_up: int
    n_res: int
    norm: str
    fuse_res: bool = False

    @nn.compact
    def __call__(self, xi: jax.Array, xf: jax.Array, train: bool = False):
        c = xi.shape[-1]
        x = jnp.concatenate([xi, xf], -1)
        for i in range(self.n_res):
            x = _FusedResPair(
                c, self.norm, fuse=self.fuse_res, name=f"res{i}"
            )(x, train)
        for i in range(self.n_up):
            c = self.ngf * 2 ** (self.n_up - 1 - i)
            x = _FusedUpBlockPair(c, self.norm, name=f"up{i}")(x, train)
        return x[..., :c], x[..., c:]


class _TrunkTail(nn.Module):
    """Post-stem trunk: norm+relu, n_downsampling stride-2 blocks, resblocks."""

    ngf: int
    n_downsampling: int
    n_res: int
    norm: str
    fuse_res: bool = False

    @nn.compact
    def __call__(self, stem_out, train=False):
        x = nn.relu(Norm(self.norm, name="stem_norm")(stem_out, train))
        for i in range(self.n_downsampling):
            x = DownBlock(self.ngf * 2 ** (i + 1), self.norm)(x, train)
        for _ in range(self.n_res):
            x = ResnetBlock(x.shape[-1], self.norm, fuse=self.fuse_res)(x, train)
        return x


class _UpStack(nn.Module):
    """n_res resblocks + n_up transpose-conv upsampling blocks."""

    ngf: int
    n_up: int
    n_res: int
    norm: str
    fuse_res: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        for _ in range(self.n_res):
            x = ResnetBlock(x.shape[-1], self.norm, fuse=self.fuse_res)(x, train)
        for i in range(self.n_up):
            x = UpBlock(self.ngf * 2 ** (self.n_up - 1 - i), self.norm)(x, train)
        return x


def _stem_specs(in_nc, prev_nc, ngf, ngf_i, use_fg):
    specs = [
        ("down_seg", (0, in_nc), ngf),
        ("down_img", (in_nc, in_nc + prev_nc), ngf),
    ]
    if use_fg:
        specs.append(("fg", (0, in_nc), ngf_i))  # fg reads the labels block
    return tuple(specs)


def _head_specs(ngf, ngf_i, no_flow, use_fg):
    specs = [("final_img", (0, ngf), 3)]
    off = ngf
    if not no_flow:
        specs.append(("final_fw", (off, off + ngf), 3))
        off += ngf
    if use_fg:
        specs.append(("fg_final", (off, off + ngf_i), 3))
    return tuple(specs)


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
    fuse_res: bool = False  # eval-mode Pallas fused resblocks (--pallas_resblocks)

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
        ngf_i = ngf // 2 if nd > 2 else ngf
        in_nc = labels.shape[-1]

        stems = FusedConv7(
            _stem_specs(in_nc, prev_frames.shape[-1], ngf, ngf_i, self.use_fg),
            name="stems",
        )(jnp.concatenate([labels, prev_frames], -1))
        seg0, img0 = stems[0], stems[1]

        fr = self.fuse_res
        d = _TrunkTail(ngf, nd, n_res_down, self.norm, fr, name="down_seg")(
            seg0, train
        ) + _TrunkTail(ngf, nd, n_res_down, self.norm, fr, name="down_img")(
            img0, train
        )

        img_feat = _UpStack(ngf, nd, n_res_up, self.norm, fr, name="up_img")(
            d, train
        )
        flow_feat = None
        if not self.no_flow:
            flow_feat = _UpStack(
                ngf, nd, n_res_up, self.norm, fr, name="up_flow"
            )(d, train)
        fg_feat = None
        if self.use_fg:
            h = _TrunkTail(ngf_i, nd, nb, self.norm, fr, name="fg_down")(
                stems[2], train
            )
            fg_feat = _UpStack(ngf_i, nd, 0, self.norm, name="fg_up")(h, train)

        return _compose(
            self, labels, prev_frames, mask, use_raw_only,
            img_feat, flow_feat, fg_feat, 20.0,
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
    fuse_res: bool = False  # eval-mode Pallas fused resblocks (--pallas_resblocks)

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
        ngf_i = ngf // 2 if self.n_downsample_g > 2 else ngf
        in_nc = labels.shape[-1]

        stems = FusedConv7(
            _stem_specs(in_nc, prev_frames.shape[-1], ngf, ngf_i, self.use_fg),
            name="stems",
        )(jnp.concatenate([labels, prev_frames], -1))

        d = _TrunkTail(ngf, 1, 0, self.norm, name="down_seg")(
            stems[0], train
        ) + _TrunkTail(ngf, 1, 0, self.norm, name="down_img")(stems[1], train)

        flow_feat = None
        if self.no_flow:
            img_feat = _UpStack(
                ngf, 1, nbl, self.norm, self.fuse_res, name="up_img"
            )(d + coarse.img_feat, train)
        else:
            # the two equal-width up-stacks run fused (see _FusedUpPair)
            img_feat, flow_feat = _FusedUpPair(
                ngf, 1, nbl, self.norm, fuse_res=self.fuse_res,
                name="up_pair",
            )(d + coarse.img_feat, d + coarse.flow_feat, train)
        fg_feat = None
        if self.use_fg:
            h = _TrunkTail(ngf_i, 1, 0, self.norm, name="fg_down")(
                stems[2], train
            )
            fg_feat = _UpStack(
                ngf_i, 1, nbl, self.norm, self.fuse_res, name="fg_up"
            )(h + coarse.fg_feat, train)

        return _compose(
            self, labels, prev_frames, mask, use_raw_only,
            img_feat, flow_feat, fg_feat, 20.0 * 2**self.scale,
        )


def _compose(
    module, labels, prev_frames, mask, use_raw_only,
    img_feat, flow_feat, fg_feat, flow_multiplier,
) -> CompositeOut:
    """Fused output heads + temporal blend + fg alpha composite."""
    ngf = img_feat.shape[-1]
    ngf_i = fg_feat.shape[-1] if fg_feat is not None else 0
    feats = [img_feat]
    if flow_feat is not None:
        feats.append(flow_feat)
    if fg_feat is not None:
        feats.append(fg_feat)
    heads = FusedConv7(
        _head_specs(ngf, ngf_i, module.no_flow, module.use_fg), name="heads"
    )(jnp.concatenate(feats, -1))

    idx = 0
    img_raw = nn.tanh(heads[idx])
    idx += 1
    flow = weight = None
    if not module.no_flow:
        fw = heads[idx]
        idx += 1
        flow = fw[..., :2] * flow_multiplier
        weight = nn.sigmoid(fw[..., 2:3])

    if use_raw_only or module.no_flow:
        img_final = img_raw
    else:
        img_final = _blend(img_raw, prev_frames[..., -3:], flow, weight)

    if module.use_fg:
        img_fg = nn.tanh(heads[idx])
        img_final = img_fg * mask + img_final * (1.0 - mask)
        img_raw = img_fg * mask + img_raw * (1.0 - mask)

    return CompositeOut(
        img_final, flow, weight, img_raw, img_feat, flow_feat, fg_feat
    )
