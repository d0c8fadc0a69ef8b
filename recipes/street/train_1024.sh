#!/bin/bash
# 1024x512 stage, warm-started from the 512 model (reference: scripts/street/train_1024.sh)
python -m vid2vid_tpu.train_cli --name label2city_1024 \
  --dataroot datasets/Cityscapes --label_nc 35 --loadSize 1024 --n_scales_spatial 2 \
  --use_instance --fg --n_frames_total 4 --niter_fix_global 5 \
  --load_pretrain checkpoints/label2city_512 --n_devices 8
