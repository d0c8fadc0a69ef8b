#!/bin/bash
# edge->face 512 inference with single-image first frames (reference: scripts/face/test_512.sh)
python -m vid2vid_tpu.test_cli --name edge2face_512 --dataroot datasets/face \
  --dataset_mode face --input_nc 15 --loadSize 512 --use_single_G
