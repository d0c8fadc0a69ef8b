#!/bin/bash
# 2048x1024 inference with single-image first frames (reference: scripts/street/test_2048.sh)
python -m vid2vid_tpu.test_cli --name label2city_2048 --dataroot datasets/Cityscapes \
  --label_nc 35 --loadSize 2048 --n_scales_spatial 3 --use_instance --fg \
  --use_single_G --bf16
