"""Pose (DensePose + OpenPose -> dancing body) dataset
(reference: data/pose_dataset.py).

Conditioning per frame: concat of the DensePose IUV render (3ch, with the
part-index channel renormalized from /255 to /24 units) and the rasterized
OpenPose skeleton (3ch) = 6 channels; images and conditioning are cropped
to the central half width rounded to /32. Training augmentation: random
per-part DensePose dropout and optional face-label removal.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from vid2vid_tpu.data.files import check_path_valid, make_grouped_dataset
from vid2vid_tpu.data.keypoints import render_openpose
from vid2vid_tpu.data.transforms import apply_transform, get_img_params, get_video_params

DENSEPOSE_FACE_PARTS = (23, 24)


def central_crop(arr: np.ndarray, base: int = 32) -> np.ndarray:
    """Crop the central half width, rounded to a multiple of `base`."""
    w = arr.shape[1]
    x_cen = w // 2
    bs = int(w * 0.25) // base * base
    return arr[:, x_cen - bs : x_cen + bs]


def densepose_dropout(
    arr: np.ndarray,
    drop_prob: float,
    remove_face: bool,
    rng: np.random.Generator,
) -> np.ndarray:
    """Randomly zero whole body parts in an IUV render (H, W, 3)."""
    parts = arr[:, :, 2]
    out = arr.copy()
    for part_id in range(1, 25):
        if rng.random() < drop_prob:
            out[parts == part_id] = 0
    if remove_face:
        mask = np.isin(parts, DENSEPOSE_FACE_PARTS)
        out[mask] = 0
    return out


class PoseNormalizer:
    """Test-time pose retargeting (reference: pose_dataset.py:100-132).

    On the first frame, measures the torso span from the DensePose V channel
    (parts 1|2), derives a scale ratio and offsets against a target center/
    height, then applies the same pad+crop+resize to every frame so the
    driving pose matches the training subject's framing.
    """

    def __init__(self, target_yc: float, target_len: float):
        self.target_yc = target_yc
        self.target_len = target_len
        self._params = None

    def fit(self, iuv: np.ndarray) -> None:
        """iuv: (H, W, 3) uint8 DensePose render of the first frame."""
        h, w = iuv.shape[:2]
        parts = iuv[:, :, 2]
        ys, xs = np.nonzero((parts == 1) | (parts == 2))
        if len(ys) == 0:
            self._params = (0, 0, 1.0, 0)
            return
        y_min, y_max = ys.min(), ys.max()
        i_min, i_max = np.argmin(ys), np.argmax(ys)
        v_min = iuv[ys[i_min], xs[i_min], 1] / 255.0
        v_max = iuv[ys[i_max], xs[i_max], 1] / 255.0
        denom = max(v_max - v_min, 1e-3)
        ylen = (y_max - y_min) / denom
        yc = (0.5 - v_min) / denom * (y_max - y_min) + y_min

        ratio = self.target_len / max(ylen, 1e-3)
        offset_y = int(yc - self.target_yc / ratio)
        offset_x = int(w * (1 - 1 / ratio) / 2)
        padding = int(max(0, max(-offset_y, int(offset_y + h / ratio) - h)))
        padding = int(max(padding, max(-offset_x, int(offset_x + w / ratio) - w)))
        self._params = (offset_y + padding, offset_x + padding, ratio, padding)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        """Apply the fitted pad+crop+resize to an (H, W, C) frame."""
        assert self._params is not None, "call fit() on the first frame"
        oy, ox, ratio, p = self._params
        h, w = img.shape[:2]
        padded = np.pad(img, ((p, p), (p, p), (0, 0)))
        crop = padded[oy : int(oy + h / ratio), ox : int(ox + w / ratio)]
        out = Image.fromarray(crop).resize((w, h))
        return np.asarray(out)


class PoseDataset:
    def __init__(self, opt):
        self.opt = opt
        phase = opt.phase if opt.isTrain else "test"
        self.img_paths = make_grouped_dataset(
            os.path.join(opt.dataroot, f"{phase}_img")
        )
        if not opt.openpose_only:
            self.dp_paths = make_grouped_dataset(
                os.path.join(opt.dataroot, f"{phase}_densepose")
            )
            check_path_valid(self.dp_paths, self.img_paths)
        if not opt.densepose_only:
            self.op_paths = make_grouped_dataset(
                os.path.join(opt.dataroot, f"{phase}_openpose")
            )
            check_path_valid(self.op_paths, self.img_paths)

        self.n_of_seqs = len(self.img_paths)
        self.seq_len_max = max(len(p) for p in self.img_paths)
        self.frames_count = [
            len(p) - opt.n_frames_G + 1 for p in self.img_paths
        ]
        # length-weighted sequence sampling (reference: base_dataset.py:42-44)
        total = sum(self.frames_count)
        self.folder_prob = [c / total for c in self.frames_count]
        self.n_frames_total = opt.n_frames_total
        self.rng = np.random.default_rng(opt.seed)

    def __len__(self):
        return sum(self.frames_count) if not self.opt.isTrain else self.n_of_seqs

    def set_n_frames_total(self, n: int):
        cap = min(128, self.seq_len_max) - (self.opt.n_frames_G - 1)
        self.n_frames_total = min(n, max(cap, 1))

    def _load_conditioning(self, seq, idx, size, params):
        opt = self.opt
        chans = []
        if not opt.openpose_only:
            dp = np.asarray(
                Image.open(self.dp_paths[seq][idx]).convert("RGB")
            )
            if opt.isTrain:
                dp = densepose_dropout(
                    dp, opt.random_drop_prob, opt.remove_face_labels, self.rng
                )
            dp_t = apply_transform(Image.fromarray(dp), opt, params, Image.NEAREST)
            dp_arr = np.asarray(dp_t, np.float32) / 255.0 * 2.0 - 1.0
            # renormalize the part channel to /24 units
            # (reference: pose_dataset.py:44)
            dp_arr[..., 2] = ((dp_arr[..., 2] * 0.5 + 0.5) * 255 / 24 - 0.5) / 0.5
            chans.append(dp_arr)
        if not opt.densepose_only:
            drop = opt.random_drop_prob if opt.isTrain else 0.0
            op = render_openpose(
                self.op_paths[seq][idx], size, drop,
                opt.remove_face_labels, opt.basic_point_only, self.rng,
            )
            op_t = apply_transform(Image.fromarray(op), opt, params, Image.NEAREST)
            chans.append(np.asarray(op_t, np.float32) / 255.0 * 2.0 - 1.0)
        return np.concatenate(chans, axis=-1)

    def __getitem__(self, index: int):
        opt = self.opt
        if opt.isTrain:
            seq = int(self.rng.choice(self.n_of_seqs, p=self.folder_prob))
        else:
            seq = index % self.n_of_seqs
        img_paths = self.img_paths[seq]
        n_total, start, t_step = get_video_params(
            opt, self.n_frames_total, len(img_paths), index
        )
        with Image.open(img_paths[start]) as probe:
            size = probe.size
        params = get_img_params(opt, size)

        a_frames, b_frames = [], []
        for i in range(n_total):
            idx = start + i * t_step
            a = self._load_conditioning(seq, idx, size, params)
            img = Image.open(img_paths[idx]).convert("RGB")
            b = np.asarray(
                apply_transform(img, opt, params, Image.BICUBIC), np.float32
            ) / 255.0 * 2.0 - 1.0
            a_frames.append(central_crop(a))
            b_frames.append(central_crop(b))

        return {
            "A": np.stack(a_frames),
            "B": np.stack(b_frames),
            "inst": None,
            "A_path": img_paths[start],
            "seq": seq,
        }


class PoseTestStream:
    """Streaming test feed for the pose dataset (per-frame, change_seq)."""

    def __init__(self, opt):
        self.opt = opt if not opt.isTrain else opt.replace(isTrain=False)
        self.ds = PoseDataset(self.opt)

    def __iter__(self):
        opt = self.opt
        for seq in range(self.ds.n_of_seqs):
            img_paths = self.ds.img_paths[seq]
            with Image.open(img_paths[0]) as probe:
                size = probe.size
            from vid2vid_tpu.data.transforms import get_img_params

            params = get_img_params(opt, size)
            # --start_frame offsets the first sequence only (reference:
            # data/base_dataset.py:31,50-52)
            start = min(opt.start_frame, len(img_paths) - 1) if seq == 0 else 0
            for idx in range(start, len(img_paths)):
                a = self.ds._load_conditioning(seq, idx, size, params)
                img = Image.open(img_paths[idx]).convert("RGB")
                from vid2vid_tpu.data.transforms import apply_transform

                b = np.asarray(
                    apply_transform(img, opt, params, Image.BICUBIC), np.float32
                ) / 255.0 * 2.0 - 1.0
                yield {
                    "A": central_crop(a),
                    "B": central_crop(b),
                    "inst": None,
                    "change_seq": idx == start,
                    "path": img_paths[idx],
                    "seq": seq,
                }
