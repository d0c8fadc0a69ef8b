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


def test_verify_published_edge2face_end_to_end(tmp_path, monkeypatch, capsys):
    """The face family: composite stream + the --use_single_G seeding path
    (netG_i global_with_features + netE + feature clusters) through the
    full pipeline on fabricated checkpoints (round-4 verdict ask #4)."""
    import numpy as np

    name = "edge2face_512"
    tiny = dict(verify_published.REGISTRY[name])
    tiny.update(
        ngf=8, nb=2, input_nc=5,
        single_g=dict(
            dirname="edge2face_single", feat_num=4,
            g=dict(ngf=8, nd=2, nb=2, norm="instance"),
            e=dict(out_nc=4, ngf=4, nd=2, norm="instance"),
        ),
    )
    monkeypatch.setitem(verify_published.REGISTRY, name, tiny)

    torch.manual_seed(43)
    pth_dir = tmp_path / "edge2face_512"
    pth_dir.mkdir()
    (net0,) = verify_published.build_reference_nets(name)
    torch.save(net0.state_dict(), pth_dir / "latest_net_G0.pth")

    sdir = tmp_path / "edge2face_single"
    sdir.mkdir()
    netG_i, netE = verify_published.build_single_g_nets(name)
    torch.save(netG_i.state_dict(), sdir / "latest_net_G.pth")
    torch.save(netE.state_dict(), sdir / "latest_net_E.pth")
    rng = np.random.default_rng(9)
    features = {
        label: rng.standard_normal((5, 5)).astype(np.float32)
        for label in range(7)  # (n_images, feat_num+1) per facial part
    }
    np.save(sdir / "features.npy", features)  # noqa: NPY002 - dict payload

    result = verify_published.main([
        name, "--pth-dir", str(pth_dir), "--root", str(tmp_path),
        "--frames", "5", "--height", "64", "--width", "64",
    ])
    assert result["pass"], result
    assert result["frames"] == 3
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
