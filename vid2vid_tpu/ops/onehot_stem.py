"""Implicit one-hot 7x7 stem — measured kernel study (SURVEY hard part #4).

The generator's finest-scale stem convolves 7x7 over tG stacked one-hot
label planes (35 classes x 3 frames at label2city_2048; reference builds
the one-hot explicitly with a scatter, models/vid2vid_model_G.py:91-96).
Because each pixel is one-hot, the convolution over those channels is
mathematically a *gather of kernel columns*:

    out[y, x, :] = sum_{t, ky, kx}  K_t[ky, kx, label_t(y+ky, x+kx), :]

`onehot_conv7` implements exactly that as a 49-tap lax.scan of
embedding-lookups over a padded label-id map, with the channel-sum
accumulated in-register per tap. It is parity-exact with the dense conv
over the explicit one-hot (see tests/test_ops.py) and never materializes
the (H, W, tG*label_nc) one-hot stack.

Measured verdict (PERF.md round 3, v5e, 2048x1024 bf16, hoist-proof
16-deep scan): decisively negative. The dense 7x7 conv costs 24.5-27.2 ms
essentially FLAT across Ci in {105, 114, 128} and Co in {48, 80, 128} —
its cost is the conv schedule, not the one-hot channels — while this
gather formulation measures 727 ms (49 accumulator round-trips through
HBM: ~49 x 2 x H*W*Co traffic). Even a free one-hot term could save at
most 26.7 - 8.3 = 18 ms (the Ci=9 dense remainder), and no gather-based
route gets close. The production path stays on the explicit one-hot +
`lax.conv_general_dilated`. Kept in-tree as the measured baseline for
that conclusion, like ops/conv7_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("kernel_size",))
def onehot_conv7(
    labels: jax.Array,
    tables: jax.Array,
    kernel_size: int = 7,
) -> jax.Array:
    """7x7 'conv' over implicit one-hot label planes via kernel-column gather.

    Args:
      labels: (B, H, W, T) int32 label ids (T stacked frames).
      tables: (K*K, T, n_classes, Co) kernel, tap-major (ky-major then kx) —
        i.e. `tables[ky*K+kx, t, c, o]` == dense kernel `W[ky, kx, t*nc+c, o]`.
      kernel_size: K (pad (K-1)//2, stride 1 — the stem configuration).

    Returns:
      (B, H, W, Co) float output, equal to
      `conv(one_hot(labels) stacked over T, W, padding=SAME)`.
    """
    k = kernel_size
    p = (k - 1) // 2
    b, h, w, t = labels.shape
    if tables.ndim != 4 or tables.shape[0] != k * k or tables.shape[1] != t:
        raise ValueError(
            f"tables must be (K*K={k * k}, T={t}, n_classes, Co), got {tables.shape}"
        )
    n_classes, co = tables.shape[-2:]
    # SAME padding of a one-hot input is a ZERO vector, not class 0: pad the
    # id map with a sentinel class that gathers an all-zero kernel column
    ids = jnp.pad(
        labels, ((0, 0), (p, p), (p, p), (0, 0)), constant_values=n_classes
    )
    tables = jnp.pad(tables, ((0, 0), (0, 0), (0, 1), (0, 0)))

    def tap(acc, i):
        ky, kx = i // k, i % k
        tile = jax.lax.dynamic_slice(ids, (0, ky, kx, 0), (b, h, w, t))
        contrib = jnp.zeros_like(acc)
        for f in range(t):
            contrib = contrib + jnp.take(tables[i, f], tile[..., f], axis=0)
        return acc + contrib, None

    acc0 = jnp.zeros((b, h, w, co), tables.dtype)
    acc, _ = jax.lax.scan(tap, acc0, jnp.arange(k * k))
    return acc


def dense_kernel_to_tables(kernel: jax.Array, n_classes: int, t: int) -> jax.Array:
    """Rearrange a dense HWIO 7x7 kernel over stacked one-hot channels
    (Ci = t*n_classes) into the (K*K, t, n_classes, Co) table layout."""
    k, k2, ci, co = kernel.shape
    assert k == k2 and ci == t * n_classes
    return kernel.reshape(k * k, t, n_classes, co)
