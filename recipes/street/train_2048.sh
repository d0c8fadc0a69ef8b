#!/bin/bash
# full-resolution 2048x1024 stage (reference: scripts/street/train_2048.sh)
python -m vid2vid_tpu.train_cli --name label2city_2048 \
  --dataroot datasets/Cityscapes --label_nc 35 --loadSize 2048 --n_scales_spatial 3 \
  --use_instance --fg --n_frames_total 4 --niter 5 --niter_decay 5 \
  --niter_fix_global 3 --load_pretrain checkpoints/label2city_1024 --n_devices 8 --bf16 --remat
