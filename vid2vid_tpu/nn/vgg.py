"""VGG19 feature extractor for the perceptual loss.

Reference (models/networks.py:840-870): frozen torchvision VGG19, tapped at
relu1_1, relu2_1, relu3_1, relu4_1, relu5_1. We implement the conv stack
directly (3x3/pad1 convs + 2x2 maxpools); weights are imported from a
torchvision state_dict via vid2vid_tpu.utils.torch_import when available,
otherwise randomly initialized (fine for tests / relative-loss training).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

# convs per stage (VGG19): stage i has _STAGE_CONVS[i] convs then a maxpool
_STAGE_CONVS = (2, 2, 4, 4, 4)
_STAGE_CH = (64, 128, 256, 512, 512)


class Vgg19Features(nn.Module):
    """Returns [relu1_1, relu2_1, relu3_1, relu4_1, relu5_1] activations."""

    @nn.compact
    def __call__(self, x: jax.Array) -> list[jax.Array]:
        taps = []
        h = x
        for stage, (n_convs, ch) in enumerate(zip(_STAGE_CONVS, _STAGE_CH)):
            for i in range(n_convs):
                h = nn.Conv(
                    ch, (3, 3), padding=((1, 1), (1, 1)), name=f"conv{stage + 1}_{i + 1}"
                )(h)
                h = nn.relu(h)
                if i == 0:
                    taps.append(h)  # relu{stage+1}_1
                if stage == 4 and i == 0:
                    # reference stops at relu5_1; skip the rest of stage 5
                    return taps
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
        return taps


# ImageNet normalization for inputs in [-1, 1] (the generator's output range):
# torchvision VGG expects (x*0.5+0.5 - mean)/std.
_VGG_MEAN = jnp.array([0.485, 0.456, 0.406])
_VGG_STD = jnp.array([0.229, 0.224, 0.225])


def vgg_preprocess(x: jax.Array) -> jax.Array:
    """Map [-1,1] RGB to torchvision-VGG input space.

    Note: the reference feeds [-1,1] tensors to VGG *without* ImageNet
    renormalization (models/networks.py:784-791 passes x straight in) — for
    strict loss parity call Vgg19Features on the raw [-1,1] input instead.
    This helper exists for the (better-conditioned) normalized variant,
    selectable in config.
    """
    x01 = x * 0.5 + 0.5
    return (x01 - _VGG_MEAN) / _VGG_STD
