"""PyTorch-semantics layer primitives as flax.linen modules (NHWC).

These reproduce the exact numerics of the reference's building blocks
(reference: models/networks.py) so that published `.pth` checkpoints can be
imported tensor-for-tensor:

  - Conv: explicit symmetric zero padding (torch Conv2d(padding=p)).
  - ConvTranspose: torch ConvTranspose2d(k, s, padding=p, output_padding=op)
    expressed as an input-dilated convolution with a flipped kernel.
  - Norm('batch'): BatchNorm2d(affine=True, track_running_stats=True),
    torch momentum 0.1.
  - Norm('instance'): InstanceNorm2d(affine=False, track_running_stats=True)
    — per-sample stats in training, *running* stats at eval (the unusual
    PyTorch behavior the reference relies on; reference: models/networks.py:27).
  - reflect_pad: nn.ReflectionPad2d.

Weight init mirrors the reference's `weights_init` (N(0, 0.02) conv weights,
N(1, 0.02) norm scales; reference: models/networks.py:15-21).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

conv_kernel_init = nn.initializers.normal(stddev=0.02)


def _norm_scale_init(key, shape, dtype=jnp.float32):
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def reflect_pad(x: jax.Array, pad: int) -> jax.Array:
    """ReflectionPad2d(pad) on an NHWC array."""
    return jnp.pad(
        x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect"
    )


class Conv(nn.Module):
    """Conv2d(features, kernel, stride, padding=pad) with torch numerics.

    `pad_mode='reflect'` applies reflection padding before a VALID conv
    (the reference's ReflectionPad2d + Conv2d(padding=0) idiom).

    Owns its `kernel`/`bias` parameters directly (HWIO, same layout flax's
    nn.Conv uses) so callers building fused kernels can obtain them via
    `want_params` — the normal output is DCE'd under jit in that case.
    """

    features: int
    kernel: int = 3
    stride: int = 1
    pad: int = 0
    pad_mode: str = "zero"  # 'zero' | 'reflect'
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, want_params: bool = False):
        kernel = self.param(
            "kernel",
            conv_kernel_init,
            (self.kernel, self.kernel, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        if self.pad > 0 and self.pad_mode == "reflect":
            x = reflect_pad(x, self.pad)
            padding = "VALID"
        else:
            padding = ((self.pad, self.pad), (self.pad, self.pad))
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            (self.stride, self.stride),
            padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        if want_params:
            return y, (kernel, bias)
        return y


class ConvTranspose(nn.Module):
    """torch ConvTranspose2d(kernel, stride, padding, output_padding).

    Implemented as lax.conv_general_dilated with lhs_dilation=stride and
    asymmetric padding (k-1-p, k-1-p+op), kernel flipped — numerically
    identical to PyTorch. The default (3, 2, 1, 1) doubles H and W
    (the reference's upsampling block, reference: models/networks.py:176).
    """

    features: int
    kernel: int = 3
    stride: int = 2
    pad: int = 1
    output_padding: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k, s, p, op = self.kernel, self.stride, self.pad, self.output_padding
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", conv_kernel_init, (k, k, in_ch, self.features), jnp.float32
        )
        # flip spatially to convert cross-correlation into the transposed conv
        flipped = kernel[::-1, ::-1]
        lo, hi = k - 1 - p, k - 1 - p + op
        out = jax.lax.conv_general_dilated(
            x,
            flipped.astype(x.dtype),
            window_strides=(1, 1),
            padding=((lo, hi), (lo, hi)),
            lhs_dilation=(s, s),
            rhs_dilation=(1, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            out = out + bias.astype(out.dtype)
        return out


class BatchNorm(nn.Module):
    """BatchNorm2d(affine=True, track_running_stats=True), torch numerics.

    Differs from flax.linen.BatchNorm in one detail that matters for
    checkpoint round-trips: running_var accumulates the *unbiased* batch
    variance (torch semantics), while normalization uses the biased one.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, want_affine: bool = False
    ):
        c = x.shape[-1]
        scale = self.param("scale", _norm_scale_init, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if want_affine:
            # eval-mode norm as per-channel affine y = x*a + b (for fused
            # conv epilogues; the normal output below is DCE'd under jit)
            assert not train, "want_affine is an eval-mode contract"
            a = scale * jax.lax.rsqrt(ra_var.value + self.epsilon)
            affine = (a, bias - ra_mean.value * a)
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            if not self.is_initializing() and self.is_mutable_collection(
                "batch_stats"
            ):
                n = x.size // c
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var * (
                    n / max(n - 1, 1)
                )
        else:
            mean = ra_mean.value.astype(x.dtype)
            var = ra_var.value.astype(x.dtype)
        out = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = out * scale.astype(x.dtype) + bias.astype(x.dtype)
        return (out, affine) if want_affine else out


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=False, track_running_stats=True).

    Training: normalize each (sample, channel) plane with its own stats and
    update per-channel running stats (batch-averaged, unbiased variance).
    Eval: normalize with the running stats — PyTorch's behavior when
    track_running_stats=True, which the single-image generators' published
    checkpoints depend on.
    """

    momentum: float = 0.1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, want_affine: bool = False
    ):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if want_affine:
            assert not train, "want_affine is an eval-mode contract"
            a = jax.lax.rsqrt(ra_var.value + self.epsilon)
            affine = (a, -ra_mean.value * a)
        if train:
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            if not self.is_initializing() and self.is_mutable_collection(
                "batch_stats"
            ):
                n = x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * jnp.mean(
                    mean[..., 0, 0, :], axis=0
                )
                ra_var.value = (1 - m) * ra_var.value + m * jnp.mean(
                    unbiased[..., 0, 0, :], axis=0
                )
        else:
            mean = ra_mean.value.astype(x.dtype)
            var = ra_var.value.astype(x.dtype)
        out = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (out, affine) if want_affine else out


class Norm(nn.Module):
    """Norm layer factory matching the reference's get_norm_layer.

    kind='batch'    → BatchNorm2d(affine=True, track_running_stats=True)
    kind='instance' → InstanceNorm2d(affine=False, track_running_stats=True)
    kind='none'     → identity
    """

    kind: str = "batch"

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, want_affine: bool = False
    ):
        if self.kind == "batch":
            return BatchNorm()(x, train=train, want_affine=want_affine)
        if self.kind == "instance":
            return InstanceNorm()(x, train=train, want_affine=want_affine)
        if self.kind == "none":
            if want_affine:
                c = x.shape[-1]
                return x, (jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32))
            return x
        raise ValueError(f"unknown norm kind {self.kind!r}")
