"""Task-level models: sequential generator, loss engine, FlowNet2 stack."""

from vid2vid_tpu.models.generator import Vid2VidGenerator, ClipOutputs
