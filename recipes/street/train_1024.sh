#!/bin/bash
# Cityscapes 1024x512 second stage (warm-start from 512) (reference: scripts/street/train_1024.sh)
python -m vid2vid_tpu.train_cli --name label2city_1024 --dataroot datasets/Cityscapes \
  --label_nc 35 --loadSize 1024 --n_scales_spatial 2 --num_D 3 --use_instance --fg \
  --n_frames_total 4 --niter_step 2 --niter_fix_global 10 --load_pretrain \
  checkpoints/label2city_512 --lr 0.0001 --n_devices 8
