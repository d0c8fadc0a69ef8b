#!/bin/bash
# pose->body 512p second stage (warm-start from 256p) (reference: scripts/pose/train_512p.sh)
python -m vid2vid_tpu.train_cli --name pose2body_512p --dataroot datasets/pose \
  --dataset_mode pose --input_nc 6 --n_scales_spatial 2 --num_D 3 --resize_or_crop \
  randomScaleHeight_and_scaledCrop --loadSize 768 --fineSize 512 --batchSize 8 \
  --no_first_img --n_frames_total 12 --max_t_step 4 --add_face_disc --niter_fix_global \
  3 --niter 5 --niter_decay 5 --lr 0.0001 --load_pretrain checkpoints/pose2body_256p \
  --n_devices 8
