#!/bin/bash
# single-device pose->body 1024p inference (reference: scripts/pose/test_g1_1024p.sh)
python -m vid2vid_tpu.test_cli --name pose2body_1024p_g1 --dataroot datasets/pose \
  --dataset_mode pose --input_nc 6 --n_scales_spatial 3 --ngf 64 --resize_or_crop \
  scaleHeight --loadSize 1024 --no_first_img --bf16
