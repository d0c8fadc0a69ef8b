#!/bin/bash
# Cityscapes 2048 with 1024 crops (smaller-memory variant) (reference: scripts/street/train_2048_crop.sh)
python -m vid2vid_tpu.train_cli --name label2city_2048_crop --dataroot \
  datasets/Cityscapes --label_nc 35 --loadSize 2048 --fineSize 1024 --resize_or_crop \
  crop --n_scales_spatial 3 --num_D 4 --use_instance --fg --n_frames_total 4 \
  --niter_step 1 --niter 5 --niter_decay 5 --niter_fix_global 5 --load_pretrain \
  checkpoints/label2city_1024 --lr 0.00005 --n_devices 8 --bf16 --remat
