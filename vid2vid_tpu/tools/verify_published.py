"""Turnkey pixel-parity verification against the published checkpoints.

One command closes the north-star parity loop the day egress opens:

    python -m vid2vid_tpu.tools.verify_published label2city_1024_g1

It (1) downloads the published model zip (with retries; reference gdrive
ids from /root/reference/scripts/download_models*.py via tools/download.py),
(2) prints the SHA256 of every .pth found (no official hashes are
published — the printout pins what was verified), (3) converts every
`latest_net_G*.pth` through the real `tools/convert_checkpoint` CLI,
(4) runs the SAME multi-frame sequential inference in both frameworks —
a torch re-derivation of the reference's streaming loop
(reference: models/vid2vid_model_G.py:198-251 coarse-to-fine feature
injection + fg compositing, networks.py:203-232/301-325 forwards) on
reference-named modules loaded with the real bytes, and our
InferenceEngine on the converted params — and (5) reports the mean/max
abs pixel delta per frame against the <1e-2 north-star tolerance.

Offline it fails fast at step (1) with the manual URL; `--pth-dir`
points it at checkpoints obtained any other way. The end-to-end path is
itself CI-proven on fabricated full-size reference-arch .pth files
(tests/test_verify_published.py, building on tests/test_convert_fullsize.py).
"""

from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import sys
import time

# experiment name -> published architecture (reference: options/base_options.py
# defaults + scripts/street/test_*.sh flags + vid2vid_model_G.py:27-43)
REGISTRY = {
    "label2city_1024_g1": dict(
        asset="models-street-g1", label_nc=35, use_instance=True, fg=True,
        fg_labels=(26,), ngf=128, nd=2, nb=9, nbl=3, n_scales=3, norm="batch",
        tG=3,
    ),
    "label2city_2048": dict(
        asset="models-street", label_nc=35, use_instance=True, fg=True,
        fg_labels=(26,), ngf=128, nd=3, nb=9, nbl=3, n_scales=3, norm="batch",
        tG=3,
    ),
}


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_checkpoints(name: str, root: str, retries: int) -> str:
    """Download + unzip the published models unless already present."""
    from vid2vid_tpu.tools import download

    ckpt_dir = os.path.join(root, "checkpoints", name)
    if glob.glob(os.path.join(ckpt_dir, "latest_net_G*.pth")):
        print(f"checkpoints already present at {ckpt_dir}", file=sys.stderr)
        return ckpt_dir
    asset = REGISTRY[name]["asset"]
    last = None
    for attempt in range(1, retries + 1):
        try:
            download.fetch(asset, root)
            return ckpt_dir
        except SystemExit as e:  # fetch() wraps network errors in SystemExit
            last = e
            print(f"download attempt {attempt}/{retries} failed: {e}", file=sys.stderr)
            if attempt < retries:
                time.sleep(min(30, 2**attempt))
    raise SystemExit(
        f"could not obtain {asset!r} after {retries} attempts.\n{last}\n"
        f"Place the published files under {ckpt_dir} and re-run with "
        f"--pth-dir {ckpt_dir}."
    )


def sha256_report(pth_dir: str) -> dict[str, str]:
    out = {}
    for p in sorted(glob.glob(os.path.join(pth_dir, "*.pth"))):
        h = hashlib.sha256()
        with open(p, "rb") as f:
            for block in iter(lambda: f.read(1 << 20), b""):
                h.update(block)
        out[os.path.basename(p)] = h.hexdigest()
        print(f"sha256 {out[os.path.basename(p)]}  {p}", file=sys.stderr)
    return out


def convert_all(name: str, pth_dir: str, out_dir: str) -> dict[str, str]:
    """latest_net_G{s}.pth -> orbax trees via the real converter CLI."""
    from vid2vid_tpu.tools import convert_checkpoint

    cfg = REGISTRY[name]
    converted = {}
    for s in range(cfg["n_scales"]):
        pth = os.path.join(pth_dir, f"latest_net_G{s}.pth")
        if not os.path.exists(pth):
            raise SystemExit(f"missing {pth} (expected for {name})")
        out = os.path.join(out_dir, f"G{s}")
        args = ["--pth", pth, "--out", out, "--norm", cfg["norm"]]
        if cfg["fg"]:
            args += ["--fg"]
        if s == 0:
            args += [
                "--kind", "composite",
                "--n-downsampling", str(cfg["nd"]),
                "--n-blocks", str(cfg["nb"]),
            ]
        else:
            args += [
                "--kind", "composite_local",
                "--n-blocks-local", str(cfg["nbl"]),
                "--scale", str(s),
            ]
        convert_checkpoint.main(args)
        converted[f"G{s}"] = out
    return converted


# --------------------------------------------------------------- torch oracle


def _oracle_classes():
    """Reference-named torch module classes at published-arch fidelity.

    Building blocks are the parity-proven oracles from the test suite
    (tests/test_convert_fullsize.py / test_torch_import.py) extended to
    also return the pre-head features the next scale consumes
    (reference: models/networks.py:203-232 returns img_feat/flow_feat/
    img_fg_feat). Imported lazily: torch + the tests package are only
    needed when a verification actually runs."""
    root = _repo_root()
    if root not in sys.path:
        sys.path.insert(0, root)
    try:
        from tests.test_convert_fullsize import (
            TorchCompositeFG,
            TorchCompositeLocalFG,
            _warp_torch,
        )
    except ImportError as e:
        raise RuntimeError(
            "verify_published needs the repo's tests/ package (the torch "
            "oracle modules live there) — run from a source checkout of "
            "vid2vid_tpu, not an installed copy"
        ) from e

    class _G0(TorchCompositeFG):
        def forward(self, labels, prev, mask):  # + feats for the enhancer
            d = self.model_down_seg(labels) + self.model_down_img(prev)
            img_feat = self.model_up_img(self.model_res_img(d))
            raw = self.model_final_img(img_feat)
            flow_feat = self.model_up_flow(self.model_res_flow(d))
            flow = self.model_final_flow(flow_feat) * 20
            weight = self.model_final_w(flow_feat)
            final = raw * weight + _warp_torch(prev[:, -3:], flow) * (1 - weight)
            fg_feat = self.indv_up(self.indv_res(self.indv_down(labels)))
            img_fg = self.indv_final(fg_feat)
            m = mask.expand_as(raw)
            return (
                img_fg * m + final * (1 - m), flow, weight,
                img_fg * m + raw * (1 - m), img_feat, flow_feat, fg_feat,
            )

    class _Gl(TorchCompositeLocalFG):
        def forward(self, labels, prev, mask, img_fc, flow_fc, fg_fc):
            d = self.model_down_seg(labels) + self.model_down_img(prev)
            img_feat = self.model_up_img(d + img_fc)
            raw = self.model_final_img(img_feat)
            flow_feat = self.model_up_flow(d + flow_fc)
            flow = self.model_final_flow(flow_feat) * (20 * 2**self.scale)
            weight = self.model_final_w(flow_feat)
            final = raw * weight + _warp_torch(prev[:, -3:], flow) * (1 - weight)
            fg_feat = self.indv_up(self.indv_down(labels) + fg_fc)
            img_fg = self.indv_final(fg_feat)
            m = mask.expand_as(raw)
            return (
                img_fg * m + final * (1 - m), flow, weight,
                img_fg * m + raw * (1 - m), img_feat, flow_feat, fg_feat,
            )

    return _G0, _Gl


def build_reference_nets(name: str):
    """Unloaded reference-named torch nets at the published architecture."""
    cfg = REGISTRY[name]
    g0_cls, gl_cls = _oracle_classes()
    in_nc = cfg["label_nc"] * cfg["tG"] + (cfg["tG"] if cfg["use_instance"] else 0)
    prev_nc = (cfg["tG"] - 1) * 3
    nets = []
    for s in range(cfg["n_scales"]):
        if s == 0:
            nets.append(g0_cls(in_nc, prev_nc, cfg["ngf"], cfg["nd"], cfg["nb"]))
        else:
            nets.append(gl_cls(in_nc, prev_nc, cfg["ngf"] >> s, cfg["nbl"], scale=s))
    return nets


def _torch_stack(name: str, pth_dir: str):
    """build_reference_nets + strict load of the published bytes."""
    import torch

    nets = build_reference_nets(name)
    for s, net in enumerate(nets):
        sd = torch.load(
            os.path.join(pth_dir, f"latest_net_G{s}.pth"), map_location="cpu"
        )
        net.load_state_dict(sd, strict=True)
        net.eval()
    return nets


def torch_rollout(name: str, nets, onehot, real_seed, frames: int):
    """The reference streaming inference loop over n_scales with fg.

    onehot: (T, C, H, W) float conditioning (one-hot labels + instance-edge
    channel); real_seed: (tG-1, 3, H, W) seed frames. Returns (T_out, 3, H, W).
    Reference: vid2vid_model_G.py:198-229 + base_model.py:122-134 build_pyr.
    """
    import torch
    import torch.nn as tnn

    cfg = REGISTRY[name]
    tG, n_scales = cfg["tG"], cfg["n_scales"]
    pool = tnn.AvgPool2d(3, 2, 1, count_include_pad=False)

    def build_pyr(x):  # (K, C, h, w) -> [finest, ..., coarsest]
        pyr = [x]
        for _ in range(n_scales - 1):
            pyr.append(pool(pyr[-1]))
        return pyr

    def fg_mask(oh_frame):  # pooled one-hot -> (1,1,h,w) mask
        m = oh_frame[None, list(cfg["fg_labels"])].sum(1, keepdim=True)
        return m.clamp(0.0, 1.0)

    fake_prev = build_pyr(real_seed)
    outs = []
    with torch.no_grad():
        for i in range(tG - 1, frames):
            a_pyr = build_pyr(onehot[i - tG + 1 : i + 1])
            feats = (None, None, None)
            for s in range(n_scales):
                si = n_scales - 1 - s
                h, w = a_pyr[si].shape[-2:]
                inp = a_pyr[si].reshape(1, -1, h, w)
                prev = fake_prev[si].reshape(1, -1, h, w)
                mask = fg_mask(a_pyr[si][-1])
                if s == 0:
                    final, _f, _w, _r, *feats = nets[0](inp, prev, mask)
                else:
                    final, _f, _w, _r, *feats = nets[s](inp, prev, mask, *feats)
                fake_prev[si] = torch.cat([fake_prev[si][1:], final])
            outs.append(final[0])
    return torch.stack(outs)


# ----------------------------------------------------------------- jax side


def jax_rollout(name: str, converted: dict, labels, inst, real_seed, frames: int):
    """Our InferenceEngine on the converted params; same inputs/seeding."""
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from vid2vid_tpu.config import Options
    from vid2vid_tpu.models.inference import InferenceEngine

    cfg = REGISTRY[name]
    opt = Options(
        label_nc=cfg["label_nc"], use_instance=cfg["use_instance"],
        output_nc=3, ngf=cfg["ngf"], n_downsample_G=cfg["nd"],
        n_blocks=cfg["nb"], n_blocks_local=cfg["nbl"],
        n_scales_spatial=cfg["n_scales"], n_frames_G=cfg["tG"],
        norm=cfg["norm"], fg=cfg["fg"], fg_labels=cfg["fg_labels"],
        isTrain=False,
    )
    eng = InferenceEngine(opt)
    params = {
        k: ocp.PyTreeCheckpointer().restore(os.path.abspath(v))
        for k, v in converted.items()
    }
    enc = eng.encode(jnp.asarray(labels)[None], jnp.asarray(inst)[None])
    state = eng.initial_state(
        1, labels.shape[-2], labels.shape[-1],
        real_frames=jnp.asarray(np.transpose(real_seed, (0, 2, 3, 1)))[None],
    )
    outs, _ = eng.generate_clip(params, enc[:, :frames], state)
    return np.asarray(outs.fake[0])  # (T_out, H, W, 3)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("name", choices=sorted(REGISTRY))
    ap.add_argument("--root", default=".", help="where checkpoints/ lives")
    ap.add_argument("--pth-dir", default=None,
                    help="existing dir with latest_net_G*.pth (skips download)")
    ap.add_argument("--retries", type=int, default=3)
    ap.add_argument("--frames", type=int, default=6, help="total frames incl. seed")
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--tol", type=float, default=1e-2,
                    help="north-star mean abs pixel delta (BASELINE.json)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import numpy as np
    import torch
    import torch.nn.functional as F

    cfg = REGISTRY[args.name]
    pth_dir = args.pth_dir or ensure_checkpoints(args.name, args.root, args.retries)
    hashes = sha256_report(pth_dir)
    out_dir = os.path.join(args.root, "checkpoints", args.name, "state")
    converted = convert_all(args.name, pth_dir, out_dir)

    # shared synthetic conditioning: blocky label maps + instance ids (any
    # identical input is equally binding for parity), identical bytes both ways
    rng = np.random.default_rng(args.seed)
    h, w, T = args.height, args.width, args.frames
    blocks = rng.integers(0, cfg["label_nc"], (T, h // 16, w // 16))
    labels = np.kron(blocks, np.ones((16, 16), np.int64)).astype(np.int32)
    inst = (labels * 7 + 3).astype(np.int32)  # edges exactly at label edges
    real_seed = rng.uniform(-1, 1, (cfg["tG"] - 1, 3, h, w)).astype(np.float32)

    onehot = (
        F.one_hot(torch.from_numpy(labels).long(), cfg["label_nc"])
        .permute(0, 3, 1, 2).float()
    )
    if cfg["use_instance"]:
        it = torch.from_numpy(inst)
        dx = it[:, :, 1:] != it[:, :, :-1]
        dy = it[:, 1:, :] != it[:, :-1, :]
        edge = torch.zeros_like(it, dtype=torch.bool)
        edge[:, :, 1:] |= dx
        edge[:, :, :-1] |= dx
        edge[:, 1:, :] |= dy
        edge[:, :-1, :] |= dy
        onehot = torch.cat([onehot, edge[:, None].float()], 1)

    nets = _torch_stack(args.name, pth_dir)
    expected = torch_rollout(args.name, nets, onehot, torch.from_numpy(real_seed), T)
    got = jax_rollout(args.name, converted, labels, inst, real_seed, T)

    exp = np.transpose(expected.numpy(), (0, 2, 3, 1))
    assert got.shape == exp.shape, (got.shape, exp.shape)
    per_frame = [float(np.abs(got[t] - exp[t]).mean()) for t in range(exp.shape[0])]
    result = {
        "experiment": args.name,
        "frames": exp.shape[0],
        "size": f"{w}x{h}",
        "mean_abs_delta": float(np.abs(got - exp).mean()),
        "max_abs_delta": float(np.abs(got - exp).max()),
        "per_frame_mean": [round(d, 6) for d in per_frame],
        "tol": args.tol,
        "pass": bool(np.abs(got - exp).mean() < args.tol),
        "sha256": hashes,
    }
    print(json.dumps(result))
    if not result["pass"]:
        raise SystemExit(f"FAIL: mean abs delta {result['mean_abs_delta']:.4g} >= {args.tol}")
    print(f"PASS: mean abs pixel delta {result['mean_abs_delta']:.4g} < {args.tol}",
          file=sys.stderr)
    return result


if __name__ == "__main__":
    main()
