"""Device mesh and sharding layout.

The reference's four parallelism mechanisms (DataParallel, G/D device
split, per-frame GPU pipelining, truncated BPTT — reference:
models/models.py:10-59, models/vid2vid_model_G.py:139-196) collapse on TPU
into sharding annotations over one mesh:

  - axis 'data': batch-parallel (replaces nn.DataParallel; gradient psum
    replaces host-side torch.mean loss averaging);
  - axis 'model': spatial (width) partitioning for batch-1 high-resolution
    work (replaces the G/D device split — XLA GSPMD inserts halo exchanges
    for convolutions automatically);
  - the per-frame pipeline disappears into lax.scan (no device hops);
  - truncated BPTT is stop_gradient cadence inside the scan.

Params stay replicated (the generator at 2048x1024 is ~400MB — far under
HBM); activations shard.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, data: int | None = None
) -> Mesh:
    """Build a ('data', 'model') mesh over the first n_devices devices.

    `data` fixes the data-parallel axis size (defaults to all devices,
    model axis 1). The model axis takes the remainder for spatial sharding.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if data is None:
        data = n
    model = n // data
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(
    mesh: Mesh,
    ndim: int,
    width_axis: int | None = None,
    batch_axis: int | None = 0,
) -> NamedSharding:
    """Sharding for an activation array: batch on 'data', width on 'model'.

    `batch_axis` (default 0) shards over 'data'; pass None to leave the
    batch replicated (e.g. a remainder batch that doesn't divide the axis).
    `width_axis` (if given) shards over 'model'.
    """
    spec = [None] * ndim
    if batch_axis is not None:
        spec[batch_axis] = "data"
    if width_axis is not None and mesh.shape["model"] > 1:
        spec[width_axis] = "model"
    return NamedSharding(mesh, P(*spec))


def shard_batch(
    x: jax.Array,
    mesh: Mesh,
    width_axis: int | None = None,
    batch_axis: int | None = 0,
):
    """Place an array with batch/width sharding."""
    return jax.device_put(x, batch_sharding(mesh, x.ndim, width_axis, batch_axis))
