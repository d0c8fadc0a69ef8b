#!/bin/bash
# single-device 1024 model inference (reference: scripts/street/test_g1_1024.sh)
python -m vid2vid_tpu.test_cli --name label2city_1024_g1 --dataroot \
  datasets/Cityscapes --label_nc 35 --loadSize 1024 --n_scales_spatial 3 \
  --use_instance --fg --n_downsample_G 2 --use_single_G --bf16
