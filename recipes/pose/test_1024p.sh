#!/bin/bash
# pose->body 1024p inference (reference: scripts/pose/test_1024p.sh)
python -m vid2vid_tpu.test_cli --name pose2body_1024p --dataroot datasets/pose \
  --dataset_mode pose --input_nc 6 --n_scales_spatial 3 --resize_or_crop scaleHeight \
  --loadSize 1024 --no_first_img --bf16
