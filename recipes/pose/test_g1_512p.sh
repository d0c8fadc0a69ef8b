#!/bin/bash
# single-device pose->body 512p inference (reference: scripts/pose/test_g1_512p.sh)
python -m vid2vid_tpu.test_cli --name pose2body_512p_g1 --dataroot datasets/pose \
  --dataset_mode pose --input_nc 6 --n_scales_spatial 2 --ngf 64 --resize_or_crop \
  scaleHeight --loadSize 512 --no_first_img
