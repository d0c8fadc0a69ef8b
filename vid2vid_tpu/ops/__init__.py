"""Device ops for vid2vid_tpu.

Every op here is a pure jittable function in NHWC layout. The hot ones
(flow warp, correlation) additionally have Pallas TPU kernels; the XLA
formulations are the reference semantics and the fallback on CPU.
"""

from vid2vid_tpu.ops.warp import flow_warp, flow_warp_ref
from vid2vid_tpu.ops.pool import (
    avg_pool_3x3s2,
    avg_pool_2x2,
    build_pyramid,
    build_pyramid_video,
)
from vid2vid_tpu.ops.encode import (
    label_one_hot,
    instance_edges,
    fg_mask_from_onehot,
)
from vid2vid_tpu.ops.resize import resize_bilinear, make_divisible
from vid2vid_tpu.ops.correlation import correlation, correlation_ref
from vid2vid_tpu.ops.channelnorm import channel_norm

__all__ = [
    "flow_warp",
    "flow_warp_ref",
    "avg_pool_3x3s2",
    "avg_pool_2x2",
    "build_pyramid",
    "build_pyramid_video",
    "label_one_hot",
    "instance_edges",
    "fg_mask_from_onehot",
    "resize_bilinear",
    "make_divisible",
    "correlation",
    "correlation_ref",
    "channel_norm",
]
