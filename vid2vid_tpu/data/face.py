"""Face (edge-map -> talking head) dataset (reference: data/face_dataset.py).

Each sample's conditioning is built from 68-point dlib landmarks
(`{phase}_keypoints/*.txt`, csv "x,y" per row):

  channel 0: face edge raster (curves through landmark triplets) plus
             background canny edges outside the face region;
  channels 1..14: per-part L1 distance-transform maps (one per drawn edge
             chain; 14 chains over 8 facial parts) -> 15 input channels;
  'inst':    the facial-part label polygon map (1..6), consumed by the
             feature encoder as a pooling map.

Upper-skull points are synthesized by reflecting the jaw line (reference:
face_dataset.py:105-110); the whole clip is cropped to a square around the
face region (2.5x landmark bbox, center biased upward).
"""

from __future__ import annotations

import os

import cv2
import numpy as np
from PIL import Image

from vid2vid_tpu.data.files import check_path_valid, make_grouped_dataset
from vid2vid_tpu.data.keypoints import draw_edge, interp_curve
from vid2vid_tpu.data.transforms import apply_transform, get_img_params, get_video_params

# facial part polygon definitions over the 83-point (68 + 15 synthesized)
# landmark set, and their labels (reference: face_dataset.py:93-102)
PART_POLYGONS = [
    [list(range(0, 17)) + list(range(68, 83)) + [0]],          # face outline
    [list(range(17, 22))],                                     # right eyebrow
    [list(range(22, 27))],                                     # left eyebrow
    [[28, 31], list(range(31, 36)), [35, 28]],                 # nose
    [[36, 37, 38, 39], [39, 40, 41, 36]],                      # right eye
    [[42, 43, 44, 45], [45, 46, 47, 42]],                      # left eye
    [list(range(48, 55)), [54, 55, 56, 57, 58, 59, 48]],       # mouth
    [list(range(60, 65)), [64, 65, 66, 67, 60]],               # tongue
]
PART_LABELS = [1, 2, 2, 3, 4, 4, 5, 6]

# test-time keypoint jitter ratios (reference: face_dataset.py:25-27)
_SCALE_RATIO = np.array([[0.9, 1], [1, 1], [0.9, 1], [1, 1.1], [0.9, 0.9], [0.9, 0.9]])
_SCALE_RATIO_SYM = np.array([[1, 1], [0.9, 1], [1, 1], [0.9, 1], [1, 1], [1, 1]])


def extend_keypoints(points: np.ndarray) -> np.ndarray:
    """Append 15 upper-skull points mirrored from the jaw line."""
    jaw = points[:17].astype(np.int32)
    baseline_y = (jaw[0, 1] + jaw[-1, 1]) / 2
    upper = jaw[1:-1].copy()
    upper[:, 1] = baseline_y + (baseline_y - upper[:, 1]) * 2 // 3
    return np.vstack([points, upper[::-1]])


def part_label_map(keypoints: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """(H, W) uint8 facial-part polygon labels."""
    w, h = size
    labels = np.zeros((h, w), np.uint8)
    for polys, label in zip(PART_POLYGONS, PART_LABELS):
        indices = [i for poly in polys for i in poly]
        pts = keypoints[indices].astype(np.int32)
        cv2.fillPoly(labels, pts=[pts], color=label)
    return labels


def draw_part_edges(keypoints: np.ndarray, size: tuple[int, int]):
    """Returns (edge raster (H,W) uint8, list of per-chain edge rasters)."""
    w, h = size
    edge_len = 3
    all_edges = np.zeros((h, w), np.uint8)
    chains = []
    for polys in PART_POLYGONS:
        for poly in polys:
            chain = np.zeros((h, w), np.uint8)
            for i in range(0, max(1, len(poly) - 1), edge_len - 1):
                seg = poly[i : i + edge_len]
                cx, cy = interp_curve(keypoints[seg, 0], keypoints[seg, 1])
                draw_edge(all_edges, cx, cy)
                draw_edge(chain, cx, cy)
            chains.append(chain)
    return all_edges, chains


def distance_maps(chains: list[np.ndarray]) -> list[np.ndarray]:
    """Per-chain clipped L1 distance transforms (uint8)."""
    out = []
    for chain in chains:
        dist = cv2.distanceTransform(255 - chain, cv2.DIST_L1, 3)
        out.append(np.clip(dist / 3, 0, 255).astype(np.uint8))
    return out


def face_crop_box(keypoints: np.ndarray, size: tuple[int, int]):
    """Square crop around the face: 2.5x landmark width, center raised
    (reference: face_dataset.py:159-169)."""
    min_y, max_y = keypoints[:, 1].min(), keypoints[:, 1].max()
    min_x, max_x = keypoints[:, 0].min(), keypoints[:, 0].max()
    xc = (min_x + max_x) // 2
    yc = (min_y * 3 + max_y) // 4
    side = (max_x - min_x) * 2.5
    xc = min(max(0, xc - side // 2) + side, size[0]) - side // 2
    yc = min(max(0, yc - side // 2) + side, size[1]) - side // 2
    return (
        int(yc - side // 2), int(yc + side // 2),
        int(xc - side // 2), int(xc + side // 2),
    )


def jitter_keypoints(keypoints: np.ndarray) -> None:
    """random_scale_points test-time augmentation (in place)."""

    def scale(part, idx, sym):
        flat = [i for poly in part for i in poly]
        ratios = _SCALE_RATIO_SYM if sym else _SCALE_RATIO
        rx, ry = ratios[idx]
        mean = keypoints[flat].mean(axis=0)
        if sym:
            for poly in part:
                pts = keypoints[poly]
                m = pts.mean(axis=0)
                new_m = (m - mean) * [rx, ry] + mean
                keypoints[poly] = pts - m + new_m
        else:
            pts = keypoints[flat]
            keypoints[flat] = (pts - mean) * [rx, ry] + mean

    scale(PART_POLYGONS[1] + PART_POLYGONS[2], 1, sym=True)
    scale(PART_POLYGONS[4] + PART_POLYGONS[5], 3, sym=True)
    for i, part in enumerate(PART_POLYGONS):
        scale(part, PART_LABELS[i] - 1, sym=False)


class FaceDataset:
    def __init__(self, opt):
        self.opt = opt
        phase = opt.phase if opt.isTrain else "test"
        self.a_paths = make_grouped_dataset(
            os.path.join(opt.dataroot, f"{phase}_keypoints")
        )
        self.b_paths = make_grouped_dataset(
            os.path.join(opt.dataroot, f"{phase}_img")
        )
        check_path_valid(self.a_paths, self.b_paths)
        self.n_of_seqs = len(self.a_paths)
        self.seq_len_max = max(len(a) for a in self.a_paths)
        self.n_frames_total = opt.n_frames_total

    def __len__(self):
        return self.n_of_seqs

    def set_n_frames_total(self, n: int):
        cap = min(128, self.seq_len_max) - (self.opt.n_frames_G - 1)
        self.n_frames_total = min(n, max(cap, 1))

    @staticmethod
    def _crop_img(arr: np.ndarray, crop_box) -> np.ndarray:
        y0, y1, x0, x1 = crop_box
        return arr[y0:y1, x0:x1]

    def _build_frame(self, kp_path, img_path, opt, params, size, crop_box):
        points = extend_keypoints(np.loadtxt(kp_path, delimiter=","))
        if not opt.isTrain and opt.random_scale_points:
            jitter_keypoints(points)
        part_labels = part_label_map(points, size)
        edges, chains = draw_part_edges(points, size)

        img = Image.open(img_path).convert("RGB")
        if not opt.no_canny_edge:
            gray = np.asarray(img.convert("L"))
            canny = cv2.Canny(gray, 100, 200) > 0
            edges = edges + (canny * (part_labels == 0) * 255).astype(np.uint8)

        def to_chan(arr, nearest=False):
            pil = Image.fromarray(self._crop_img(arr, crop_box))
            method = Image.NEAREST if nearest else Image.BILINEAR
            out = apply_transform(pil, opt, params, method)
            return np.asarray(out, np.float32) / 255.0

        channels = [to_chan(edges)]
        if not opt.no_dist_map:
            channels += [to_chan(d) for d in distance_maps(chains)]
        a = np.stack(channels, axis=-1)

        label = np.asarray(
            apply_transform(
                Image.fromarray(self._crop_img(part_labels, crop_box)), opt, params,
                Image.NEAREST,
            ),
            np.int32,
        )

        img_c = Image.fromarray(self._crop_img(np.asarray(img), crop_box))
        b = np.asarray(
            apply_transform(img_c, opt, params, Image.BICUBIC), np.float32
        ) / 255.0 * 2.0 - 1.0
        return a, b, label

    def __getitem__(self, index: int):
        opt = self.opt
        seq = index % self.n_of_seqs
        kp_paths = self.a_paths[seq]
        img_paths = self.b_paths[seq]
        n_total, start, t_step = get_video_params(
            opt, self.n_frames_total, len(kp_paths), index
        )

        with Image.open(img_paths[start]) as probe:
            size = probe.size
        points0 = np.loadtxt(kp_paths[start], delimiter=",")
        crop_box = face_crop_box(points0, size)
        y0, y1, x0, x1 = crop_box
        params = get_img_params(opt, (x1 - x0, y1 - y0))

        a_frames, b_frames, l_frames = [], [], []
        for i in range(n_total):
            idx = start + i * t_step
            a, b, label = self._build_frame(
                kp_paths[idx], img_paths[idx], opt, params, size, crop_box
            )
            a_frames.append(a)
            b_frames.append(b)
            l_frames.append(label)

        return {
            "A": np.stack(a_frames),
            "B": np.stack(b_frames),
            "inst": np.stack(l_frames),
            "A_path": kp_paths[start],
            "seq": seq,
        }


class FaceTestStream:
    """Streaming test feed for the face dataset: one frame at a time with
    per-sequence crop state and change_seq flags (mirrors the reference's
    update_frame_idx streaming, reference: face_dataset.py:29-64)."""

    def __init__(self, opt):
        self.opt = opt
        self.ds = FaceDataset(opt.replace(isTrain=False) if opt.isTrain else opt)

    def __iter__(self):
        opt = self.ds.opt
        for seq in range(self.ds.n_of_seqs):
            kp_paths = self.ds.a_paths[seq]
            img_paths = self.ds.b_paths[seq]
            with Image.open(img_paths[0]) as probe:
                size = probe.size
            points0 = np.loadtxt(kp_paths[0], delimiter=",")
            crop_box = face_crop_box(points0, size)
            y0, y1, x0, x1 = crop_box
            params = get_img_params(opt, (x1 - x0, y1 - y0))
            # --start_frame offsets the first sequence only (reference:
            # data/base_dataset.py:31,50-52)
            start = min(opt.start_frame, len(kp_paths) - 1) if seq == 0 else 0
            for idx in range(start, len(kp_paths)):
                a, b, label = self.ds._build_frame(
                    kp_paths[idx], img_paths[idx], opt, params, size, crop_box
                )
                yield {
                    "A": a,
                    "B": b,
                    "inst": label,
                    "change_seq": idx == start,
                    "path": kp_paths[idx],
                    "seq": seq,
                }
