"""End-to-end proof of the turnkey published-checkpoint verifier.

tools/verify_published is the one command that closes the north-star
pixel-parity loop when egress opens (VERDICT round-3 ask #7). The real
.pth bytes are unreachable from this container (gdrive DNS-blocked, see
PARITY.md), so this test runs the ENTIRE pipeline — sha256 report,
convert CLI, torch reference rollout, jax rollout, delta report — on
fabricated reference-arch checkpoints, at a reduced width so the torch
side stays CPU-cheap (full published widths are separately proven by
tests/test_convert_fullsize.py).
"""

import json

import pytest
import torch

from vid2vid_tpu.tools import verify_published

pytestmark = pytest.mark.slow


def test_verify_published_end_to_end(tmp_path, monkeypatch, capsys):
    name = "label2city_1024_g1"
    tiny = dict(verify_published.REGISTRY[name])
    tiny.update(ngf=8, nb=2, nbl=1, label_nc=6, fg_labels=(3,))
    monkeypatch.setitem(verify_published.REGISTRY, name, tiny)

    # fabricate "published" checkpoints with reference names/shapes
    torch.manual_seed(42)
    pth_dir = tmp_path / "ckpt"
    pth_dir.mkdir()
    for s, net in enumerate(verify_published.build_reference_nets(name)):
        torch.save(net.state_dict(), pth_dir / f"latest_net_G{s}.pth")

    result = verify_published.main([
        name, "--pth-dir", str(pth_dir), "--root", str(tmp_path),
        "--frames", "5", "--height", "64", "--width", "128",
    ])
    assert result["pass"], result
    assert result["frames"] == 3  # 5 total - (tG-1) seed
    assert len(result["sha256"]) == 3
    assert result["mean_abs_delta"] < 1e-2
    # the JSON line the command prints is parseable (driver-facing contract)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["experiment"] == name


def test_verify_published_offline_download_fails_fast(tmp_path, monkeypatch):
    """No .pth and no egress -> actionable SystemExit, quickly."""
    monkeypatch.setattr(verify_published.time, "sleep", lambda s: None)
    with pytest.raises(SystemExit) as ei:
        verify_published.ensure_checkpoints(
            "label2city_1024_g1", str(tmp_path), retries=2
        )
    assert "label2city_1024_g1" in str(ei.value) or "models-street-g1" in str(ei.value)
