#!/bin/bash
# single-device edge->face 512 inference (reference: scripts/face/test_g1_512.sh)
python -m vid2vid_tpu.test_cli --name edge2face_512_g1 --dataroot datasets/face \
  --dataset_mode face --n_scales_spatial 2 --input_nc 15 --loadSize 512 --ngf 64 \
  --use_single_G
