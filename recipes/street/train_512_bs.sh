#!/bin/bash
# Cityscapes 512x256, batch-parallel variant (batchSize 15 over all devices) (reference: scripts/street/train_512_bs.sh)
python -m vid2vid_tpu.train_cli --name label2city_512_bs --dataroot \
  datasets/Cityscapes --label_nc 35 --loadSize 512 --use_instance --fg \
  --n_frames_total 6 --batchSize 15 --n_devices 8
