"""Device mesh + sharding helpers."""

from vid2vid_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
