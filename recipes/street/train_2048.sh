#!/bin/bash
# Cityscapes 2048x1024 final stage (warm-start from 1024) (reference: scripts/street/train_2048.sh)
python -m vid2vid_tpu.train_cli --name label2city_2048 --dataroot datasets/Cityscapes \
  --label_nc 35 --loadSize 2048 --n_scales_spatial 3 --num_D 4 --use_instance --fg \
  --n_frames_total 4 --niter_step 1 --niter 5 --niter_decay 5 --niter_fix_global 5 \
  --load_pretrain checkpoints/label2city_1024 --lr 0.00005 --n_devices 8 --bf16 \
  --remat
