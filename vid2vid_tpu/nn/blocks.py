"""Composable encoder/decoder blocks shared by all generators.

These are the repeated motifs of the reference's Sequential stacks
(reference: models/networks.py:152-201), factored as named flax modules so
checkpoints map cleanly and the module tree reads top-down.
"""

from __future__ import annotations

import flax.linen as nn
import jax

from vid2vid_tpu.nn.layers import Conv, ConvTranspose, Norm, reflect_pad


class ConvStem(nn.Module):
    """ReflectionPad(3) + Conv7x7 + norm + ReLU — the canonical stem."""

    features: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = Conv(self.features, kernel=7, pad=3, pad_mode="reflect")(x)
        x = Norm(self.norm)(x, train=train)
        return nn.relu(x)


class DownBlock(nn.Module):
    """Conv3x3 stride-2 + norm + ReLU — one downsampling step."""

    features: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = Conv(self.features, kernel=3, stride=2, pad=1)(x)
        x = Norm(self.norm)(x, train=train)
        return nn.relu(x)


class UpBlock(nn.Module):
    """ConvTranspose(3, s2, p1, op1) + norm + ReLU — one upsampling step."""

    features: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = ConvTranspose(self.features)(x)
        x = Norm(self.norm)(x, train=train)
        return nn.relu(x)


class ResnetBlock(nn.Module):
    """Reflect-padded 3x3 residual block (conv-norm-relu-conv-norm + skip)."""

    features: int
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = Conv(self.features, kernel=3, pad=1, pad_mode="reflect")(x)
        h = Norm(self.norm)(h, train=train)
        h = nn.relu(h)
        h = Conv(self.features, kernel=3, pad=1, pad_mode="reflect")(h)
        h = Norm(self.norm)(h, train=train)
        return x + h


class TanhHead(nn.Module):
    """ReflectionPad(3) + Conv7x7 + tanh output head."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.tanh(Conv(self.features, kernel=7, pad=3, pad_mode="reflect")(x))


class ConvHead(nn.Module):
    """ReflectionPad(3) + Conv7x7 head with optional sigmoid (flow / weight)."""

    features: int
    sigmoid: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = Conv(self.features, kernel=7, pad=3, pad_mode="reflect")(x)
        return nn.sigmoid(x) if self.sigmoid else x
