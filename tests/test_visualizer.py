"""Visualizer logging surfaces: loss log, TSV scalars, TensorBoard events,
HTML gallery (reference: util/visualizer.py)."""

import os

import pytest

import numpy as np

from vid2vid_tpu.utils.visualizer import Visualizer


class _Opt:
    name = "vistest"
    display_winsize = 512
    tf_log = True

    def __init__(self, root):
        self.checkpoints_dir = str(root)


class TestVisualizer:
    @pytest.mark.slow
    def test_loss_log_and_scalars(self, tmp_path):
        v = Visualizer(_Opt(tmp_path))
        v.print_current_errors(1, 10, {"G_GAN": 1.5, "D_real": 0.0}, 0.2)
        v.plot_current_errors({"G_GAN": 1.5}, 10)
        log = tmp_path / "vistest" / "loss_log.txt"
        assert "G_GAN: 1.500" in log.read_text()
        # zero-valued losses are suppressed like the reference printer
        assert "D_real" not in log.read_text().splitlines()[-1]
        tsv = (tmp_path / "vistest" / "scalars.tsv").read_text()
        assert "10\tG_GAN\t1.5" in tsv

    def test_tensorboard_events_written(self, tmp_path):
        v = Visualizer(_Opt(tmp_path))
        if v.tb is None:  # backend unavailable in this env
            return
        v.plot_current_errors({"G_GAN": 2.0}, 3)
        v.display_current_results(
            {"fake": np.zeros((8, 8, 3), np.uint8)}, 1, 3
        )
        v.tb.flush()
        logs = tmp_path / "vistest" / "logs"
        assert any(f.startswith("events.") for f in os.listdir(logs))

    def test_no_html_skips_gallery(self, tmp_path):
        """--no_html gates the web/ gallery (reference: util/visualizer.py:18)."""
        opt = _Opt(tmp_path)
        opt.no_html = True
        v = Visualizer(opt)
        v.display_current_results(
            {"real": np.full((8, 8, 3), 128, np.uint8)}, 1, 1
        )
        assert not (tmp_path / "vistest" / "web" / "index.html").exists()
        assert not (tmp_path / "vistest" / "web" / "images").exists()

    def test_gallery_and_test_images(self, tmp_path):
        v = Visualizer(_Opt(tmp_path))
        v.display_current_results(
            {"real": np.full((8, 8, 3), 128, np.uint8)}, 2, 1
        )
        assert (tmp_path / "vistest" / "web" / "index.html").exists()
        saved = v.save_images(
            str(tmp_path / "res"), {"fake": np.zeros((8, 8, 3), np.uint8)},
            "seq/frame_001.png",
        )
        assert saved == ["frame_001_fake.jpg"]
