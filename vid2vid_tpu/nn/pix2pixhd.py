"""Single-image (pix2pixHD-style) generators and the instance encoder.

Used by the `use_single_G` first-frame path (reference:
models/vid2vid_model_G.py:237-288) and available standalone:

  GlobalGenerator      (reference: models/networks.py:327-359)
  LocalEnhancer        (reference: models/networks.py:361-419)
  GlobalWithFeatures   ('global_with_features' / Global_with_z,
                        reference: models/networks.py:421-467)
  LocalWithFeatures    ('local_with_features' / Local_with_z,
                        reference: models/networks.py:469-551)
  Encoder + instance_average (reference: models/networks.py:595-632)
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vid2vid_tpu.nn.blocks import ConvStem, DownBlock, ResnetBlock, TanhHead, UpBlock
from vid2vid_tpu.ops.pool import avg_pool_3x3s2

_CH_MAX = 1024


class GlobalGenerator(nn.Module):
    """pix2pixHD global generator; channel widths capped at 1024."""

    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9
    norm: str = "instance"
    final_head: bool = True  # LocalEnhancer reuses the trunk without it

    @nn.compact
    def __call__(self, x, feat=None, train=False):
        if feat is not None:
            x = jnp.concatenate([x, feat], axis=-1)
        ngf, nd = self.ngf, self.n_downsampling
        x = ConvStem(ngf, self.norm)(x, train)
        for i in range(nd):
            x = DownBlock(min(_CH_MAX, ngf * 2 ** (i + 1)), self.norm)(x, train)
        for _ in range(self.n_blocks):
            x = ResnetBlock(x.shape[-1], self.norm)(x, train)
        for i in range(nd):
            x = UpBlock(min(_CH_MAX, ngf * 2 ** (nd - 1 - i)), self.norm)(x, train)
        if self.final_head:
            x = TanhHead(self.output_nc)(x)
        return x


class LocalEnhancer(nn.Module):
    """Global trunk at 1/2^n res + per-level enhancer (down + res + up)."""

    output_nc: int = 3
    ngf: int = 32
    n_downsample_global: int = 3
    n_blocks_global: int = 9
    n_local_enhancers: int = 1
    n_blocks_local: int = 3
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, feat=None, train=False):
        if feat is not None:
            x = jnp.concatenate([x, feat], axis=-1)
        n_local = self.n_local_enhancers

        pyramid = [x]
        for _ in range(n_local):
            pyramid.append(avg_pool_3x3s2(pyramid[-1]))

        out = GlobalGenerator(
            self.output_nc,
            self.ngf * 2**n_local,
            self.n_downsample_global,
            self.n_blocks_global,
            self.norm,
            final_head=False,
            name="global",
        )(pyramid[-1], train=train)

        for n in range(1, n_local + 1):
            ngf_n = self.ngf * 2 ** (n_local - n)
            inp = pyramid[n_local - n]
            h = ConvStem(ngf_n, self.norm, name=f"enh{n}_stem")(inp, train)
            h = DownBlock(ngf_n * 2, self.norm, name=f"enh{n}_down")(h, train)
            h = h + out
            for i in range(self.n_blocks_local):
                h = ResnetBlock(ngf_n * 2, self.norm, name=f"enh{n}_res{i}")(h, train)
            out = UpBlock(ngf_n, self.norm, name=f"enh{n}_up")(h, train)
        return TanhHead(self.output_nc, name="final")(out)


class GlobalWithFeatures(nn.Module):
    """Global generator with an instance-feature map z injected at every stage.

    z (B, H, W, nz) is concatenated to the input, to the resblock stack
    (downsampled), to the first upsample, and to the final head — matching
    the reference's Global_with_z wiring.
    """

    output_nc: int = 3
    feat_num: int = 16
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, z, train=False):
        ngf, nd = self.ngf, self.n_downsampling
        z_down = z
        for _ in range(nd):
            z_down = avg_pool_3x3s2(z_down)

        h = ConvStem(ngf, self.norm)(jnp.concatenate([x, z], -1), train)
        for i in range(nd):
            h = DownBlock(min(_CH_MAX, ngf * 2 ** (i + 1)), self.norm)(h, train)

        h = jnp.concatenate([h, z_down], -1)
        for _ in range(self.n_blocks):
            h = ResnetBlock(h.shape[-1], self.norm)(h, train)

        h = jnp.concatenate([h, z_down], -1)
        for i in range(nd):
            h = UpBlock(min(_CH_MAX, ngf * 2 ** (nd - 1 - i)), self.norm)(h, train)

        return TanhHead(self.output_nc)(jnp.concatenate([h, z], -1))


class LocalWithFeatures(nn.Module):
    """LocalEnhancer variant with feature-map z injection at every stage."""

    output_nc: int = 3
    feat_num: int = 16
    ngf: int = 32
    n_downsample_global: int = 3
    n_blocks_global: int = 9
    n_local_enhancers: int = 1
    n_blocks_local: int = 3
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, z, train=False):
        n_local = self.n_local_enhancers
        ngf_g = self.ngf * 2**n_local
        nd = self.n_downsample_global

        pyramid = [x]
        for _ in range(n_local):
            pyramid.append(avg_pool_3x3s2(pyramid[-1]))
        z_local = z
        for _ in range(n_local):
            z_local = avg_pool_3x3s2(z_local)
        z_global = z_local
        for _ in range(nd):
            z_global = avg_pool_3x3s2(z_global)

        # global trunk (stem/down → res → up), all with z injection
        h = ConvStem(ngf_g, self.norm, name="g_stem")(
            jnp.concatenate([pyramid[-1], z_local], -1), train
        )
        for i in range(nd):
            h = DownBlock(
                min(_CH_MAX, ngf_g * 2 ** (i + 1)), self.norm, name=f"g_down{i}"
            )(h, train)
        h = jnp.concatenate([h, z_global], -1)
        for i in range(self.n_blocks_global):
            h = ResnetBlock(h.shape[-1], self.norm, name=f"g_res{i}")(h, train)
        h = jnp.concatenate([h, z_global], -1)
        for i in range(nd):
            h = UpBlock(
                min(_CH_MAX, ngf_g * 2 ** (nd - 1 - i)), self.norm, name=f"g_up{i}"
            )(h, train)

        out = h
        for n in range(1, n_local + 1):
            ngf_n = self.ngf * 2 ** (n_local - n)
            inp = pyramid[n_local - n]
            if n == n_local:
                inp = jnp.concatenate([inp, z], -1)
            e = ConvStem(ngf_n, self.norm, name=f"enh{n}_stem")(inp, train)
            e = DownBlock(ngf_n * 2, self.norm, name=f"enh{n}_down")(e, train)
            e = e + out
            if n == 1:
                e = jnp.concatenate([e, z_local], -1)
            for i in range(self.n_blocks_local):
                e = ResnetBlock(e.shape[-1], self.norm, name=f"enh{n}_res{i}")(e, train)
            out = UpBlock(ngf_n, self.norm, name=f"enh{n}_up")(e, train)

        return TanhHead(self.output_nc, name="final")(
            jnp.concatenate([out, z], -1)
        )


class Encoder(nn.Module):
    """Instance-feature encoder: conv U-stack + instance-wise average pooling."""

    output_nc: int = 16
    ngf: int = 16
    n_downsampling: int = 4
    norm: str = "instance"

    @nn.compact
    def __call__(self, x, inst, train=False, max_instances: int = 64):
        ngf, nd = self.ngf, self.n_downsampling
        h = ConvStem(ngf, self.norm)(x, train)
        for i in range(nd):
            h = DownBlock(ngf * 2 ** (i + 1), self.norm)(h, train)
        for i in range(nd):
            h = UpBlock(ngf * 2 ** (nd - 1 - i), self.norm)(h, train)
        h = TanhHead(self.output_nc)(h)
        return instance_average(h, inst, max_instances)


def instance_average(
    feat: jax.Array, inst: jax.Array, max_instances: int = 64
) -> jax.Array:
    """Replace each instance's features with their spatial mean.

    TPU-native reformulation of the reference's per-instance host loop
    (reference: models/networks.py:620-632): a static-size `jnp.unique` +
    segment-sum, fully jittable.

    Args:
      feat: (B, H, W, C) feature map.
      inst: (B, H, W) or (B, H, W, 1) integer instance-id map.
      max_instances: static cap on distinct ids per image.
    """
    if inst.ndim == 4:
        inst = inst[..., 0]
    b, h, w, c = feat.shape
    flat_feat = feat.reshape(b, h * w, c)
    flat_ids = inst.reshape(b, h * w).astype(jnp.int32)

    def per_image(ids, f):
        uniq = jnp.unique(ids, size=max_instances, fill_value=jnp.iinfo(jnp.int32).max)
        seg = jnp.searchsorted(uniq, ids)
        seg = jnp.clip(seg, 0, max_instances - 1)
        sums = jax.ops.segment_sum(f, seg, num_segments=max_instances)
        counts = jax.ops.segment_sum(
            jnp.ones((ids.shape[0], 1), f.dtype), seg, num_segments=max_instances
        )
        means = sums / jnp.maximum(counts, 1.0)
        return means[seg]

    out = jax.vmap(per_image)(flat_ids, flat_feat)
    return out.reshape(b, h, w, c)
