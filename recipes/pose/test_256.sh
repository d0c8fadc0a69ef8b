#!/bin/bash
# pose->body inference (frame prediction: model synthesizes the first frame)
python -m vid2vid_tpu.test_cli --name pose2body_256 \
  --dataroot datasets/pose --dataset_mode pose --input_nc 6 --loadSize 384 --fineSize 256 \
  --resize_or_crop scaleHeight_and_scaledCrop --ngf 64 --no_first_img
