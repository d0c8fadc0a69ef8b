"""Data pipeline tests with generated toy datasets on disk."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from vid2vid_tpu.config import Options
from vid2vid_tpu.data.files import make_grouped_dataset
from vid2vid_tpu.data.keypoints import draw_edge, interp_curve, render_openpose
from vid2vid_tpu.data.loader import PrefetchLoader, create_dataset
from vid2vid_tpu.data.transforms import make_power_2


def write_temporal_dataset(root, n_seqs=2, n_frames=8, size=(96, 64), inst=True):
    for phase_dir, mode in [("train_A", "L"), ("train_B", "RGB"), ("train_inst", "L")]:
        if phase_dir == "train_inst" and not inst:
            continue
        for s in range(n_seqs):
            d = os.path.join(root, phase_dir, f"seq{s:03d}")
            os.makedirs(d, exist_ok=True)
            for f in range(n_frames):
                arr = np.full(
                    (size[1], size[0]) if mode == "L" else (size[1], size[0], 3),
                    (f * 7 + s) % 5,
                    np.uint8,
                )
                Image.fromarray(arr, mode).save(os.path.join(d, f"{f:05d}.png"))


class TestFilesAndTransforms:
    def test_grouped_scan(self, tmp_path):
        write_temporal_dataset(str(tmp_path), inst=False)
        seqs = make_grouped_dataset(str(tmp_path / "train_A"))
        assert len(seqs) == 2
        assert len(seqs[0]) == 8
        assert seqs[0] == sorted(seqs[0])

    def test_make_power_2(self):
        assert make_power_2(100) == 96
        assert make_power_2(112) == 128  # 3.5 rounds up
        assert make_power_2(111) == 96
        assert make_power_2(120) == 128


class TestTemporalDataset:
    def test_train_clip_shapes(self, tmp_path):
        write_temporal_dataset(str(tmp_path))
        opt = Options(
            dataroot=str(tmp_path), label_nc=5, use_instance=True,
            n_frames_total=4, max_frames_per_gpu=2, loadSize=64, fineSize=64,
            resize_or_crop="scaleWidth", n_frames_G=3,
        )
        ds = create_dataset(opt)
        item = ds[0]
        # 4 frames rounded to chunks of 2 + tG-1 = 6 total
        assert item["A"].shape[0] == 6
        assert item["A"].dtype == np.int32
        assert item["B"].shape == (6,) + item["A"].shape[1:] + (3,)
        assert item["B"].min() >= -1.0 and item["B"].max() <= 1.0
        assert item["inst"].shape == item["A"].shape
        # width scaled to loadSize, sizes multiples of 32
        assert item["A"].shape[2] == 64
        assert item["A"].shape[1] % 32 == 0

    def test_loader_batches(self, tmp_path):
        write_temporal_dataset(str(tmp_path))
        opt = Options(
            dataroot=str(tmp_path), label_nc=5, use_instance=True,
            n_frames_total=2, max_frames_per_gpu=2, loadSize=64, fineSize=64,
            n_frames_G=3,
        )
        loader = PrefetchLoader(create_dataset(opt), opt)
        items = list(loader)
        assert len(items) == 2
        assert items[0]["A"].shape[0] == 1  # batch axis

    def test_test_stream(self, tmp_path):
        write_temporal_dataset(str(tmp_path))
        # test phase dirs
        for sub in ("test_A", "test_B"):
            os.symlink(
                os.path.join(tmp_path, sub.replace("test", "train")),
                os.path.join(tmp_path, sub),
            )
        opt = Options(
            dataroot=str(tmp_path), label_nc=5, isTrain=False,
            loadSize=64, fineSize=64, dataset_mode="test", n_frames_G=3,
        )
        stream = create_dataset(opt)
        frames = list(stream)
        assert len(frames) == 16
        assert frames[0]["change_seq"] and not frames[1]["change_seq"]
        assert frames[8]["change_seq"]

    def test_test_stream_start_frame(self, tmp_path):
        """--start_frame offsets the first sequence's stream only
        (reference: data/base_dataset.py:31,50-52)."""
        write_temporal_dataset(str(tmp_path))
        for sub in ("test_A", "test_B"):
            os.symlink(
                os.path.join(tmp_path, sub.replace("test", "train")),
                os.path.join(tmp_path, sub),
            )
        opt = Options(
            dataroot=str(tmp_path), label_nc=5, isTrain=False,
            loadSize=64, fineSize=64, dataset_mode="test", n_frames_G=3,
            start_frame=3,
        )
        frames = list(create_dataset(opt))
        assert len(frames) == 5 + 8  # seq0 frames 3..7, seq1 all 8
        assert frames[0]["change_seq"] and frames[0]["path"].endswith("00003.png")
        assert frames[5]["change_seq"] and frames[5]["path"].endswith("00000.png")
        assert not any(f["change_seq"] for f in frames[1:5] + frames[6:])


class TestKeypointRaster:
    def test_interp_curve_linear(self):
        cx, cy = interp_curve(np.array([0, 10]), np.array([0, 10]))
        assert cx is not None
        np.testing.assert_allclose(cy, cx, atol=1)

    def test_interp_curve_quadratic(self):
        x = np.array([0, 5, 10])
        y = 0.1 * x**2
        cx, cy = interp_curve(x, y.astype(np.float64))
        assert cx is not None and len(cx) == 10

    def test_draw_edge_marks_pixels(self):
        im = np.zeros((20, 20, 3), np.uint8)
        draw_edge(im, np.arange(5, 15), np.full(10, 10), bw=1, color=(100, 0, 0))
        assert (im[10, 5:15, 0] == 100).all()

    def test_render_openpose(self, tmp_path):
        person = {
            "pose_keypoints_2d": [
                v for i in range(25) for v in (20 + i, 10 + 2 * i, 0.9)
            ],
            "face_keypoints_2d": [0.0] * 210,
            "hand_left_keypoints_2d": [0.0] * 63,
            "hand_right_keypoints_2d": [0.0] * 63,
        }
        p = tmp_path / "kp.json"
        p.write_text(json.dumps({"people": [person]}))
        img = render_openpose(str(p), (96, 80))
        assert img.shape == (80, 96, 3)
        assert img.max() > 0  # skeleton drawn


class TestFaceDatasetUnits:
    def test_extend_and_partmap(self):
        from vid2vid_tpu.data.face import extend_keypoints, part_label_map

        rng = np.random.default_rng(0)
        pts = np.zeros((68, 2))
        # a plausible face: jaw arc + features
        t = np.linspace(0, np.pi, 17)
        pts[:17, 0] = 50 + 40 * np.cos(t[::-1])
        pts[:17, 1] = 60 + 30 * np.sin(t)
        pts[17:] = rng.uniform(30, 80, (51, 2))
        ext = extend_keypoints(pts)
        assert ext.shape == (83, 2)
        labels = part_label_map(ext, (128, 128))
        assert labels.shape == (128, 128)
        assert labels.max() >= 1

    def test_face_crop_box(self):
        from vid2vid_tpu.data.face import face_crop_box

        pts = np.array([[40.0, 40.0], [80.0, 80.0]])
        y0, y1, x0, x1 = face_crop_box(pts, (200, 200))
        assert (y1 - y0) == (x1 - x0)  # square
        assert (x1 - x0) == 100  # 2.5x the 40px width


class TestPoseUnits:
    def test_central_crop(self):
        from vid2vid_tpu.data.pose import central_crop

        arr = np.zeros((64, 256, 3))
        out = central_crop(arr)
        assert out.shape == (64, 128, 3)

    def test_densepose_dropout_removes_face(self):
        from vid2vid_tpu.data.pose import densepose_dropout

        arr = np.zeros((8, 8, 3), np.uint8)
        arr[0, 0] = [10, 10, 23]
        arr[1, 1] = [10, 10, 5]
        out = densepose_dropout(
            arr, 0.0, True, np.random.default_rng(0)
        )
        assert (out[0, 0] == 0).all()
        assert (out[1, 1] == [10, 10, 5]).all()


class TestPoseNormalizer:
    def test_retarget_scales_torso(self):
        from vid2vid_tpu.data.pose import PoseNormalizer

        iuv = np.zeros((64, 64, 3), np.uint8)
        # torso spanning rows 20..40 with V from 64 to 192 (0.25..0.75)
        for y in range(20, 41):
            v = int(64 + (y - 20) / 20 * 128)
            iuv[y, 28:36] = (10, v, 1)
        # measured body height is 40 (torso 20px spanning V 0.25..0.75);
        # targeting 80 doubles the framing
        norm = PoseNormalizer(target_yc=32, target_len=80)
        norm.fit(iuv)
        out = norm(iuv)
        assert out.shape == iuv.shape
        ys = np.nonzero(out[:, :, 2] == 1)[0]
        assert len(ys) > 0
        span = ys.max() - ys.min()
        assert 30 <= span <= 55, span
