"""FlowNet2 flow-estimation stack (TPU-native).

Replaces the reference's vendored CUDA implementation
(reference: models/flownet2_pytorch/) with flax modules over the
correlation / warp / channel-norm ops in vid2vid_tpu.ops.
"""

from vid2vid_tpu.models.flownet2.nets import (
    FlowNetC,
    FlowNetS,
    FlowNetSD,
    FlowNetFusion,
)
from vid2vid_tpu.models.flownet2.flownet2 import (
    FlowNet2,
    FlowNet2C,
    FlowNet2CS,
    FlowNet2CSS,
)
from vid2vid_tpu.models.flownet2.wrapper import FlowEstimator
