"""Synthetic moving-shapes video source for end-to-end tests and smoke runs.

Generates clips of a colored square moving over a static background, with
the label map marking the square (class 1) against background (class 0) —
enough structure to exercise the full train/inference path (flow should
learn the square's motion) without any dataset on disk.
"""

from __future__ import annotations

import numpy as np


def moving_square_clip(
    rng: np.random.Generator,
    n_frames: int,
    height: int,
    width: int,
    n_classes: int = 2,
):
    """Returns (labels (1,T,H,W) int32, images (1,T,H,W,3) float32 in [-1,1])."""
    size = max(4, height // 4)
    x = rng.integers(0, width - size)
    y = rng.integers(0, height - size)
    vx, vy = rng.integers(1, 4), rng.integers(1, 4)
    color = rng.uniform(0.2, 1.0, size=3).astype(np.float32)

    labels = np.zeros((1, n_frames, height, width), np.int32)
    imgs = np.full((1, n_frames, height, width, 3), -1.0, np.float32)
    for t in range(n_frames):
        labels[0, t, y : y + size, x : x + size] = min(1, n_classes - 1)
        imgs[0, t, y : y + size, x : x + size] = color
        x = int(np.clip(x + vx, 0, width - size))
        y = int(np.clip(y + vy, 0, height - size))
        if x in (0, width - size):
            vx = -vx
        if y in (0, height - size):
            vy = -vy
    return labels, imgs


class SyntheticVideoDataset:
    """Iterable of (labels, images) clips with the training protocol hooks."""

    def __init__(self, opt, n_clips: int = 8, height: int = 64, width: int = 64):
        self.opt = opt
        self.n_clips = n_clips
        self.height, self.width = height, width
        self.rng = np.random.default_rng(opt.seed)

    def __len__(self):
        return self.n_clips

    def clip(self, n_frames: int):
        return moving_square_clip(
            self.rng, n_frames, self.height, self.width,
            max(self.opt.label_nc, 2),
        )
