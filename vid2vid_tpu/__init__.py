"""vid2vid_tpu — a TPU-native video-to-video synthesis framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of NVIDIA/vid2vid
(NeurIPS 2018): sequential, flow-warped, coarse-to-fine GAN generation of
high-resolution video from semantic label maps, face edge maps, or body poses.

Layout:
  ops/       — device ops (flow warp, correlation cost volume, pyramids, ...)
               with Pallas TPU kernels for the hot paths
  nn/        — network zoo (composite generators, pix2pixHD nets, PatchGAN
               discriminators, VGG) as flax.linen modules in NHWC layout
  models/    — task-level models: the scale-stacked sequential generator,
               the loss engine, and the FlowNet2 flow-supervision stack
  train/     — jitted train steps, optimizer groups, curriculum, checkpoints
  data/      — host-side dataset pipelines (temporal / face / pose / test)
  parallel/  — device mesh + sharding helpers
  utils/     — visualization, logging, image IO
"""

__version__ = "0.1.0"
