#!/bin/bash
# Cityscapes 512x256 without the foreground-background split (reference: scripts/street/train_512_no_fg.sh)
python -m vid2vid_tpu.train_cli --name label2city_512_no_fg --dataroot \
  datasets/Cityscapes --label_nc 35 --loadSize 512 --use_instance --n_frames_total 6 \
  --max_frames_per_gpu 2 --n_devices 8
