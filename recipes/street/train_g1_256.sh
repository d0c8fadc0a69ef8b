#!/bin/bash
# single-device Cityscapes 256 first stage (reference: scripts/street/train_g1_256.sh)
python -m vid2vid_tpu.train_cli --name label2city_256 --dataroot datasets/Cityscapes \
  --label_nc 35 --loadSize 256 --use_instance --fg --n_downsample_G 2 --num_D 1 \
  --max_frames_per_gpu 6 --n_frames_total 6
