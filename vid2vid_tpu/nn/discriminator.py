"""PatchGAN discriminators.

NLayerDiscriminator (reference: models/networks.py:679-725): 4x4 stride-2
conv pyramid, channel cap 512, LeakyReLU(0.2), final 1-channel patch map;
optionally returns every block's activations for the feature-matching loss.

MultiscaleDiscriminator (reference: models/networks.py:634-675): num_D
copies applied to a 2x-downsampled input pyramid; copy index 0 sees the
coarsest resolution (matching the reference's layer indexing, where
`layer{num_D-1}` runs on full resolution).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vid2vid_tpu.nn.layers import Conv, Norm
from vid2vid_tpu.ops.pool import avg_pool_3x3s2


class NLayerDiscriminator(nn.Module):
    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"
    get_interm_feat: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        feats = []
        h = Conv(self.ndf, kernel=4, stride=2, pad=2, name="block0_conv")(x)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)

        nf = self.ndf
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            h = Conv(nf, kernel=4, stride=2, pad=2, name=f"block{n}_conv")(h)
            h = Norm(self.norm, name=f"block{n}_norm")(h, train)
            h = nn.leaky_relu(h, 0.2)
            feats.append(h)

        nf = min(nf * 2, 512)
        h = Conv(nf, kernel=4, stride=1, pad=2, name=f"block{self.n_layers}_conv")(h)
        h = Norm(self.norm, name=f"block{self.n_layers}_norm")(h, train)
        h = nn.leaky_relu(h, 0.2)
        feats.append(h)

        h = Conv(1, kernel=4, stride=1, pad=2, name="head_conv")(h)
        feats.append(h)

        return feats if self.get_interm_feat else [h]


class MultiscaleDiscriminator(nn.Module):
    """num_D PatchGANs over a 2x input pyramid.

    Returns a list (finest resolution first, like the reference's forward
    order) of per-D feature lists; each inner list is [patch_map] or all
    block activations when get_interm_feat.
    """

    ndf: int = 64
    n_layers: int = 3
    norm: str = "batch"
    num_d: int = 3
    get_interm_feat: bool = False

    @nn.compact
    def __call__(self, x, train=False):
        results = []
        inp = x
        for i in range(self.num_d):
            # scale index: num_d-1 sees full res (reference naming parity);
            # torch scale{j} is built with ndf*2^(num_D-1-j) capped at 64
            # (reference: models/networks.py:643-645) — i.e. the finest copy
            # has ndf channels and each coarser copy doubles. For scale_idx
            # = num_d-1-i that exponent is exactly i.
            scale_idx = self.num_d - 1 - i
            ndf_i = min(64, self.ndf * 2**i)
            d = NLayerDiscriminator(
                ndf_i,
                self.n_layers,
                self.norm,
                self.get_interm_feat,
                name=f"scale{scale_idx}",
            )
            results.append(d(inp, train))
            if i != self.num_d - 1:
                inp = avg_pool_3x3s2(inp)
        return results
