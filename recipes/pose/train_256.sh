#!/bin/bash
# pose->body first stage (reference: scripts/pose/train_256p.sh)
python -m vid2vid_tpu.train_cli --name pose2body_256 \
  --dataroot datasets/pose --dataset_mode pose --input_nc 6 --loadSize 384 --fineSize 256 \
  --resize_or_crop randomScaleHeight_and_scaledCrop --ngf 64 --num_D 2 \
  --max_frames_per_gpu 3 --niter 5 --niter_decay 5 --no_first_img \
  --n_frames_total 12 --max_t_step 4 --add_face_disc --n_devices 8
