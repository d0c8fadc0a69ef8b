#!/bin/bash
# edge->face 512, batch-parallel variant (batchSize 7) (reference: scripts/face/train_512_bs7.sh)
python -m vid2vid_tpu.train_cli --name edge2face_512 --dataroot datasets/face \
  --dataset_mode face --input_nc 15 --loadSize 512 --num_D 3 --batchSize 7 --niter 20 \
  --niter_decay 20 --n_frames_total 12 --n_devices 8
