"""Paired temporal video dataset (reference: data/temporal_dataset.py).

Reads `{phase}_A` / `{phase}_B` (and optionally `{phase}_inst`) grouped
directories; a training sample is one clip of `n_frames_total + tG - 1`
frames with a shared random crop/flip and random temporal stride.

Arrays (batch axis added by the loader):
  A: (T, H, W) int32 labels when label_nc > 0, else (T, H, W, C) float
  B: (T, H, W, 3) float32 in [-1, 1]
  inst: (T, H, W) int32 or None
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from vid2vid_tpu.data.files import check_path_valid, make_grouped_dataset
from vid2vid_tpu.data.transforms import (
    get_img_params,
    get_video_params,
    load_image_rgb,
    load_label_map,
)


class TemporalDataset:
    def __init__(self, opt):
        self.opt = opt
        phase = opt.phase if opt.isTrain else "test"
        self.dir_a = os.path.join(opt.dataroot, f"{phase}_A")
        self.dir_b = os.path.join(opt.dataroot, f"{phase}_B")
        self.a_is_label = opt.label_nc != 0

        self.a_paths = make_grouped_dataset(self.dir_a)
        self.b_paths = make_grouped_dataset(self.dir_b)
        check_path_valid(self.a_paths, self.b_paths)
        if opt.use_instance:
            self.i_paths = make_grouped_dataset(
                os.path.join(opt.dataroot, f"{phase}_inst")
            )
            check_path_valid(self.a_paths, self.i_paths)

        self.n_of_seqs = len(self.a_paths)
        self.seq_len_max = max(len(a) for a in self.a_paths)
        self.n_frames_total = opt.n_frames_total

    def __len__(self):
        return self.n_of_seqs

    def set_n_frames_total(self, n: int):
        """Curriculum hook (reference: base_dataset.py:19-24)."""
        cap = min(128, self.seq_len_max) - (self.opt.n_frames_G - 1)
        self.n_frames_total = min(n, max(cap, 1))

    def __getitem__(self, index: int):
        opt = self.opt
        seq = index % self.n_of_seqs
        a_paths = self.a_paths[seq]
        b_paths = self.b_paths[seq]

        n_total, start, t_step = get_video_params(
            opt, self.n_frames_total, len(a_paths), index
        )
        with Image.open(b_paths[start]) as probe:
            params = get_img_params(opt, probe.size)

        a_frames, b_frames, i_frames = [], [], []
        for i in range(n_total):
            idx = start + i * t_step
            if self.a_is_label:
                a_frames.append(load_label_map(a_paths[idx], opt, params))
            else:
                a_frames.append(load_image_rgb(a_paths[idx], opt, params))
            b_frames.append(load_image_rgb(b_paths[idx], opt, params))
            if opt.use_instance:
                i_frames.append(
                    load_label_map(self.i_paths[seq][idx], opt, params)
                )

        return {
            "A": np.stack(a_frames),
            "B": np.stack(b_frames),
            "inst": np.stack(i_frames) if i_frames else None,
            "A_path": a_paths[start],
            "seq": seq,
        }


class TestTemporalStream:
    """Streaming test feed: one frame window at a time with sequence-change
    detection (reference: data/test_dataset.py)."""

    def __init__(self, opt):
        self.opt = opt
        phase = "test"
        self.dir_a = os.path.join(opt.dataroot, f"{phase}_A")
        self.a_paths = make_grouped_dataset(self.dir_a)
        self.a_is_label = opt.label_nc != 0
        self.use_real = opt.use_real_img
        if self.use_real:
            self.b_paths = make_grouped_dataset(
                os.path.join(opt.dataroot, f"{phase}_B")
            )
        if opt.use_instance:
            self.i_paths = make_grouped_dataset(
                os.path.join(opt.dataroot, f"{phase}_inst")
            )
        self._params = None

    def __iter__(self):
        opt = self.opt
        for seq_idx, seq in enumerate(self.a_paths):
            with Image.open(seq[0]) as probe:
                params = get_img_params(opt, probe.size)
            # --start_frame offsets the FIRST sequence's stream; later
            # sequences restart at 0 (reference: data/base_dataset.py:31,50-52)
            start = min(opt.start_frame, len(seq) - 1) if seq_idx == 0 else 0
            for frame_idx in range(start, len(seq)):
                if self.a_is_label:
                    a = load_label_map(seq[frame_idx], opt, params)
                else:
                    a = load_image_rgb(seq[frame_idx], opt, params)
                b = (
                    load_image_rgb(self.b_paths[seq_idx][frame_idx], opt, params)
                    if self.use_real
                    else None
                )
                inst = (
                    load_label_map(self.i_paths[seq_idx][frame_idx], opt, params)
                    if opt.use_instance
                    else None
                )
                yield {
                    "A": a,
                    "B": b,
                    "inst": inst,
                    "change_seq": frame_idx == start,
                    "path": seq[frame_idx],
                    "seq": seq_idx,
                }
