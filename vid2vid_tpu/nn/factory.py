"""Network factories — the reference's define_G / define_D dispatch
(reference: models/networks.py:32-76).

`define_g(opt, kind)` returns an un-initialized flax module for any of the
reference's generator kinds; weight init (N(0, 0.02)) is baked into the
module definitions (nn/layers.py) rather than applied post-hoc.
"""

from __future__ import annotations

import os

from vid2vid_tpu.config import Options
from vid2vid_tpu.nn.composite import CompositeGenerator, CompositeLocalGenerator
from vid2vid_tpu.nn.discriminator import MultiscaleDiscriminator
from vid2vid_tpu.nn.pix2pixhd import (
    Encoder,
    GlobalGenerator,
    GlobalWithFeatures,
    LocalEnhancer,
    LocalWithFeatures,
)

GENERATOR_KINDS = (
    "global", "local", "global_with_features", "local_with_features",
    "composite", "compositeLocal", "encoder",
)


def define_g(
    opt: Options,
    kind: str | None = None,
    *,
    ngf: int | None = None,
    scale: int = 0,
):
    """Generator dispatch on --netG (reference: models/networks.py:32-59).

    kind defaults to opt.netG; ngf defaults to opt.ngf (the scale stack
    passes opt.ngf_at_scale(s) for enhancer scales).
    """
    kind = kind or opt.netG
    ngf = ngf if ngf is not None else opt.ngf
    if kind == "global":
        return GlobalGenerator(
            output_nc=opt.output_nc, ngf=ngf,
            n_downsampling=opt.n_downsample_G, n_blocks=opt.n_blocks,
            norm=opt.norm,
        )
    if kind == "local":
        return LocalEnhancer(
            output_nc=opt.output_nc, ngf=ngf,
            n_downsample_global=opt.n_downsample_G,
            n_blocks_global=opt.n_blocks,
            n_blocks_local=opt.n_blocks_local,
            n_local_enhancers=opt.n_local_enhancers,
            norm=opt.norm,
        )
    if kind == "global_with_features":
        return GlobalWithFeatures(
            output_nc=opt.output_nc, feat_num=opt.feat_num, ngf=ngf,
            n_downsampling=opt.n_downsample_G, n_blocks=opt.n_blocks,
            norm=opt.norm,
        )
    if kind == "local_with_features":
        return LocalWithFeatures(
            output_nc=opt.output_nc, feat_num=opt.feat_num, ngf=ngf,
            n_downsample_global=opt.n_downsample_G,
            n_blocks_global=opt.n_blocks,
            n_blocks_local=opt.n_blocks_local,
            norm=opt.norm,
        )
    # VID2VID_FUSE_SITES={both,global,local}: per-site attribution knob for
    # the --pallas_resblocks A/B (PERF.md round-5 respair study)
    _sites = os.environ.get("VID2VID_FUSE_SITES", "both")
    if kind == "composite":
        return CompositeGenerator(
            output_nc=opt.output_nc, ngf=ngf,
            n_downsampling=opt.n_downsample_G, n_blocks=opt.n_blocks,
            norm=opt.norm, use_fg=opt.fg, no_flow=opt.effective_no_flow,
            fuse_res=getattr(opt, "pallas_resblocks", False)
            and _sites in ("both", "global"),
        )
    # VID2VID_FUSE_SCALES: comma list of enhancer scales to fuse (A/B knob)
    _scales = os.environ.get("VID2VID_FUSE_SCALES")
    if kind == "compositeLocal":
        return CompositeLocalGenerator(
            output_nc=opt.output_nc, ngf=ngf,
            n_blocks_local=opt.n_blocks_local,
            n_downsample_g=opt.n_downsample_G, scale=scale,
            norm=opt.norm, use_fg=opt.fg, no_flow=opt.effective_no_flow,
            fuse_res=getattr(opt, "pallas_resblocks", False)
            and _sites in ("both", "local")
            and (not _scales or str(scale) in _scales.split(",")),
        )
    if kind == "encoder":
        return Encoder(
            output_nc=opt.feat_num, ngf=ngf,
            n_downsampling=opt.n_downsample_G, norm=opt.norm,
        )
    raise ValueError(
        f"unknown --netG {kind!r}; expected one of {GENERATOR_KINDS}"
    )


def define_d(
    opt: Options,
    *,
    ndf: int | None = None,
    num_d: int | None = None,
    get_interm_feat: bool | None = None,
):
    """Discriminator dispatch (reference: models/networks.py:61-76) — the
    reference always builds MultiscaleDiscriminator."""
    return MultiscaleDiscriminator(
        ndf=ndf if ndf is not None else opt.ndf,
        n_layers=opt.n_layers_D,
        norm=opt.norm,
        num_d=num_d if num_d is not None else opt.num_D,
        get_interm_feat=(
            get_interm_feat
            if get_interm_feat is not None
            else not opt.no_ganFeat
        ),
    )
