#!/bin/bash
# single-device edge->face 256 inference (reference: scripts/face/test_g1_256.sh)
python -m vid2vid_tpu.test_cli --name edge2face_256_g1 --dataroot datasets/face \
  --dataset_mode face --input_nc 15 --loadSize 256 --ngf 64 --use_single_G
