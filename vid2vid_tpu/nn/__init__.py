"""Network zoo: flax.linen modules in NHWC layout.

All primitives reproduce the reference's PyTorch layer semantics exactly
(padding, norm running-stats behavior, transpose-conv output_padding) so
published checkpoints can be imported weight-for-weight, while the module
tree itself is organized for XLA (explicit NHWC, static shapes, scanable).
"""

from vid2vid_tpu.nn.layers import (
    Conv,
    ConvTranspose,
    Norm,
    reflect_pad,
)
from vid2vid_tpu.nn.blocks import ResnetBlock, ConvStem, DownBlock, UpBlock, TanhHead
from vid2vid_tpu.nn.composite import CompositeGenerator, CompositeLocalGenerator
from vid2vid_tpu.nn.pix2pixhd import (
    GlobalGenerator,
    LocalEnhancer,
    GlobalWithFeatures,
    LocalWithFeatures,
    Encoder,
    instance_average,
)
from vid2vid_tpu.nn.discriminator import NLayerDiscriminator, MultiscaleDiscriminator
from vid2vid_tpu.nn.vgg import Vgg19Features
