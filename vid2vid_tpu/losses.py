"""Loss functions (reference: models/networks.py:731-837).

All losses are pure functions over NHWC arrays / discriminator outputs.
The reference's GANLoss quirk — `opt.gan_mode` is passed where a bool is
expected, so every advertised mode silently resolves to LSGAN
(reference: models/vid2vid_model_D.py:62, networks.py:740) — is preserved
as the default ('ls'), with working 'original' (BCE) and 'hinge' modes
available as genuine opt-ins.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp

from vid2vid_tpu.ops.pool import avg_pool_2x2

DiscOut = Sequence[Sequence[jax.Array]]  # per-scale lists of activations


def _per_pred(pred: DiscOut, fn) -> jax.Array:
    """Sum fn(patch_map) over the multiscale prediction list."""
    total = 0.0
    for scale_feats in pred:
        total = total + fn(scale_feats[-1])
    return total


def gan_loss(
    pred: DiscOut, target_is_real: bool, mode: str = "ls", for_discriminator: bool = True
) -> jax.Array:
    """Multiscale GAN loss on the final patch maps.

    mode 'ls' — MSE vs 1/0 targets (the reference's effective behavior).
    mode 'original' — BCE with logits. mode 'hinge' — standard hinge.
    """
    if mode == "ls":
        target = 1.0 if target_is_real else 0.0
        return _per_pred(pred, lambda p: jnp.mean((p - target) ** 2))
    if mode == "original":
        target = 1.0 if target_is_real else 0.0
        return _per_pred(
            pred,
            lambda p: jnp.mean(
                jnp.maximum(p, 0) - p * target + jnp.log1p(jnp.exp(-jnp.abs(p)))
            ),
        )
    if mode == "hinge":
        if for_discriminator:
            if target_is_real:
                return _per_pred(pred, lambda p: jnp.mean(jnp.maximum(0.0, 1.0 - p)))
            return _per_pred(pred, lambda p: jnp.mean(jnp.maximum(0.0, 1.0 + p)))
        return _per_pred(pred, lambda p: -jnp.mean(p))
    raise ValueError(f"unknown gan mode {mode!r}")


def feature_matching_loss(
    pred_fake: DiscOut,
    pred_real: DiscOut,
    num_d: int,
    n_layers_d: int,
    lambda_feat: float,
) -> jax.Array:
    """D-feature matching: L1 between fake and (detached) real activations.

    Weights per the reference: 4/(n_layers+1) per layer, 1/num_D per scale
    (reference: models/vid2vid_model_D.py:199-213).
    """
    feat_w = 4.0 / (n_layers_d + 1)
    d_w = 1.0 / num_d
    loss = 0.0
    for i in range(min(len(pred_fake), num_d)):
        for j in range(len(pred_fake[i]) - 1):
            loss = loss + d_w * feat_w * lambda_feat * jnp.mean(
                jnp.abs(pred_fake[i][j] - jax.lax.stop_gradient(pred_real[i][j]))
            )
    return loss


def masked_l1(input: jax.Array, target: jax.Array, mask: jax.Array) -> jax.Array:
    """mean(|input*mask - target*mask|), mask broadcast over channels."""
    return jnp.mean(jnp.abs(input * mask - target * mask))


def l1(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(a - b))


def multiscale_l1(
    input: jax.Array,
    target: jax.Array,
    mask: jax.Array | None = None,
    n_scales: int = 5,
) -> jax.Array:
    """Pyramid L1 with the reference's weights [1, .5, .25, .125, .125]."""
    weights = [1.0, 0.5, 0.25, 0.125, 0.125][:n_scales]
    loss = 0.0
    for i, w in enumerate(weights):
        if mask is not None:
            loss = loss + w * masked_l1(input, target, mask)
        else:
            loss = loss + w * l1(input, target)
        if i != len(weights) - 1:
            input, target = avg_pool_2x2(input), avg_pool_2x2(target)
            if mask is not None:
                mask = avg_pool_2x2(mask)
    return loss


def cross_entropy_label_loss(logits: jax.Array, onehot: jax.Array) -> jax.Array:
    """Per-pixel CE against the argmax label (reference's CrossEntropyLoss)."""
    labels = jnp.argmax(onehot, axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(
        jnp.take_along_axis(logp, labels[..., None], axis=-1)
    )


_VGG_SLICE_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)


def vgg_loss(
    vgg_apply,
    vgg_params,
    x: jax.Array,
    y: jax.Array,
    max_width: int = 1024,
) -> jax.Array:
    """VGG19 perceptual loss with the reference's slice weights.

    Inputs wider than `max_width` are 2x average-pooled first (reference:
    models/networks.py:784-786). `vgg_apply(params, img) -> [5 taps]`.
    """
    while x.shape[2] > max_width:
        x, y = avg_pool_2x2(x), avg_pool_2x2(y)
    fx = vgg_apply(vgg_params, x)
    fy = vgg_apply(vgg_params, y)
    loss = 0.0
    for w, a, b in zip(_VGG_SLICE_WEIGHTS, fx, fy):
        loss = loss + w * jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
    return loss
