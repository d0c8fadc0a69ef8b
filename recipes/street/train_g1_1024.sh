#!/bin/bash
# single-device Cityscapes 1024-class model at 896 (warm-start from 512) (reference: scripts/street/train_g1_1024.sh)
python -m vid2vid_tpu.train_cli --name label2city_1024_g1 --dataroot \
  datasets/Cityscapes --label_nc 35 --loadSize 896 --n_scales_spatial 3 --n_frames_D 2 \
  --use_instance --fg --n_downsample_G 2 --num_D 3 --max_frames_per_gpu 1 \
  --n_frames_total 4 --niter_step 2 --niter_fix_global 8 --niter_decay 5 \
  --load_pretrain checkpoints/label2city_512_g1 --lr 0.0001 --bf16
