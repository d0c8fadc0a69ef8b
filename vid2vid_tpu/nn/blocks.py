"""Composable encoder/decoder blocks shared by all generators.

These are the repeated motifs of the reference's Sequential stacks
(reference: models/networks.py:152-201), factored as named flax modules so
checkpoints map cleanly and the module tree reads top-down.
"""

from __future__ import annotations

import os
import sys

import flax.linen as nn
import jax
import jax.numpy as jnp

from vid2vid_tpu.nn.layers import Conv, ConvTranspose, Norm
from vid2vid_tpu.ops.respair_pallas import (
    pad_respair,
    pick_blocks_respair,
    respair_pallas,
)


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
    """Reflect-padded 3x3 residual block (conv-norm-relu-conv-norm + skip).

    With `fuse=True` (opt-in via --pallas_resblocks) the eval-mode forward
    runs the WHOLE block as one Pallas call (round 5,
    ops/respair_pallas.py): both convs, reflect padding, eval-norm
    affines, ReLU and the skip in a single kernel with the intermediate
    VMEM-resident and the producer fused into the padded-input write —
    identical math. (The round-3 two-call fused-epilogue variant lost
    end-to-end to boundary materializations; see PERF.md.) Training and
    unfusable shapes always take the plain path. Parameter tree is the
    same either way.
    """

    features: int
    norm: str = "batch"
    fuse: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv1 = Conv(self.features, kernel=3, pad=1, pad_mode="reflect")
        norm1 = Norm(self.norm)
        conv2 = Conv(self.features, kernel=3, pad=1, pad_mode="reflect")
        norm2 = Norm(self.norm)

        fusable = (
            self.fuse
            and not train
            and x.shape[-1] == self.features
            and self.features % 128 == 0
            and pick_blocks_respair(
                x.shape[1], x.shape[2], self.features, x.dtype.itemsize
            )
            is not None
        )
        if not fusable:
            h = nn.relu(norm1(conv1(x), train=train))
            h = norm2(conv2(h), train=train)
            return x + h

        # declare identical params/variables; the probe outputs are DCE'd
        _, (k1, b1) = conv1(x, want_params=True)
        _, (a1, c1) = norm1(x, train=False, want_affine=True)
        _, (k2, b2) = conv2(x, want_params=True)
        _, (a2, c2) = norm2(x, train=False, want_affine=True)
        br, tw = pick_blocks_respair(
            x.shape[1], x.shape[2], self.features, x.dtype.itemsize
        )
        if os.environ.get("VID2VID_FUSE_DEBUG"):
            print(f"[fuse] ResnetBlock {x.shape} blocks=({br},{tw})",
                  file=sys.stderr)
        interpret = jax.default_backend() not in ("tpu", "axon")
        return respair_pallas(
            pad_respair(x), k1, (a1, c1 + b1 * a1), k2, (a2, c2 + b2 * a2),
            block_rows=br, block_cols=tw, interpret=interpret,
        )


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
