#!/bin/bash
# pose->body 256p inference (reference: scripts/pose/test_256p.sh)
python -m vid2vid_tpu.test_cli --name pose2body_256p --dataroot datasets/pose \
  --dataset_mode pose --input_nc 6 --resize_or_crop scaleHeight --loadSize 256 \
  --no_first_img
