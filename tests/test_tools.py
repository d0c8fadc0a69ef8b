"""CLI tools: download asset table + offline behavior, export main()."""

import os

import pytest

from vid2vid_tpu.tools.download import ASSETS, fetch


class TestDownload:
    def test_asset_table(self):
        # the published asset ids from the reference download scripts
        assert set(ASSETS) == {
            "datasets", "models-street", "models-street-g1", "models-face",
            "flownet2",
        }
        for file_id, dest, unzip in ASSETS.values():
            assert len(file_id) > 20
            assert dest.endswith(".zip") == unzip

    def test_offline_fails_with_manual_url(self, tmp_path):
        with pytest.raises(SystemExit) as exc:
            fetch("flownet2", str(tmp_path))
        msg = str(exc.value)
        assert "https://docs.google.com/uc?export=download&id=" in msg
        assert "recipes/datasets.md" in msg


class TestExportCLI:
    @pytest.mark.slow
    def test_main_exports_random_params(self, tmp_path):
        from vid2vid_tpu.tools import export

        out = tmp_path / "artifact"
        export.main([
            "--out", str(out), "--width", "64", "--height", "32",
            "--name", "exp_smoke", "--checkpoints_dir", str(tmp_path / "ck"),
            "--label_nc", "5", "--loadSize", "64",
            "--ngf", "8", "--n_blocks", "2", "--n_downsample_G", "2",
            "--n_scales_spatial", "1", "--norm", "batch",
        ])
        assert (out / "step.hlo").exists()
        assert (out / "meta.json").exists()
