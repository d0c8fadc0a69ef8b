#!/bin/bash
# Cityscapes 512x256 first stage (reference: scripts/street/train_512.sh)
python -m vid2vid_tpu.train_cli --name label2city_512 --dataroot datasets/Cityscapes \
  --label_nc 35 --loadSize 512 --use_instance --fg --n_frames_total 6 \
  --max_frames_per_gpu 2 --n_devices 8
