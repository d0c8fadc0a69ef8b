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
# defaults + scripts/{street,face}/test_*.sh flags + vid2vid_model_G.py:27-43).
#
# These are ALL the published model families. Pose ships NO checkpoint:
# scripts/pose/ contains no download_models script and the reference
# README's Testing section (README.md:63-100) lists only Cityscapes and
# Faces — pose models must be trained locally (README.md:154-160), so
# there is nothing published to verify against.
REGISTRY = {
    "label2city_1024_g1": dict(
        asset="models-street-g1", label_nc=35, input_nc=0, use_instance=True,
        fg=True, fg_labels=(26,), ngf=128, nd=2, nb=9, nbl=3, n_scales=3,
        norm="batch", tG=3,
    ),
    "label2city_2048": dict(
        asset="models-street", label_nc=35, input_nc=0, use_instance=True,
        fg=True, fg_labels=(26,), ngf=128, nd=3, nb=9, nbl=3, n_scales=3,
        norm="batch", tG=3,
    ),
    # edge2face: single-scale composite + the use_single_G first-frame path
    # (global_with_features netG_i + Encoder netE + features clusters from
    # checkpoints/edge2face_single/, reference: vid2vid_model_G.py:279-288,
    # 290-320; scripts/face/test_512.sh)
    "edge2face_512": dict(
        asset="models-face", label_nc=0, input_nc=15, use_instance=False,
        fg=False, fg_labels=(), ngf=128, nd=3, nb=9, nbl=3, n_scales=1,
        norm="batch", tG=3,
        single_g=dict(
            dirname="edge2face_single", feat_num=16,
            g=dict(ngf=64, nd=3, nb=9, norm="instance"),
            e=dict(out_nc=16, ngf=16, nd=4, norm="instance"),
        ),
    ),
}


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _ensure_tests_importable() -> None:
    """The torch oracle modules live in the repo's tests/ package."""
    root = _repo_root()
    if root not in sys.path:
        sys.path.insert(0, root)
    try:
        import tests.test_torch_import  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            "verify_published needs the repo's tests/ package (the torch "
            "oracle modules live there) — run from a source checkout of "
            "vid2vid_tpu, not an installed copy"
        ) from e


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

    if "single_g" in cfg:
        sg = cfg["single_g"]
        sdir = os.path.join(os.path.dirname(pth_dir), sg["dirname"])
        convert_checkpoint.main([
            "--pth", os.path.join(sdir, "latest_net_G.pth"),
            "--out", os.path.join(out_dir, "G_i"),
            "--kind", "global_with_features", "--norm", sg["g"]["norm"],
            "--n-downsampling", str(sg["g"]["nd"]),
            "--n-blocks", str(sg["g"]["nb"]),
        ])
        converted["G_i"] = os.path.join(out_dir, "G_i")
        convert_checkpoint.main([
            "--pth", os.path.join(sdir, "latest_net_E.pth"),
            "--out", os.path.join(out_dir, "E"),
            "--kind", "encoder", "--norm", sg["e"]["norm"],
            "--n-downsampling", str(sg["e"]["nd"]),
        ])
        converted["E"] = os.path.join(out_dir, "E")
        converted["features"] = os.path.join(sdir, "features.npy")
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
    _ensure_tests_importable()
    from tests.test_convert_fullsize import (
        TorchCompositeFG,
        TorchCompositeLocalFG,
        _warp_torch,
    )

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

    from tests.test_torch_import import TorchComposite

    class _G0NoFG(TorchComposite):
        def forward(self, labels, prev, mask=None):  # no fg branch
            d = self.model_down_seg(labels) + self.model_down_img(prev)
            img_feat = self.model_up_img(self.model_res_img(d))
            raw = self.model_final_img(img_feat)
            flow_feat = self.model_up_flow(self.model_res_flow(d))
            flow = self.model_final_flow(flow_feat) * 20
            weight = self.model_final_w(flow_feat)
            final = raw * weight + _warp_torch(prev[:, -3:], flow) * (1 - weight)
            return final, flow, weight, raw, img_feat, flow_feat, None

    return _G0, _Gl, _G0NoFG


def build_reference_nets(name: str):
    """Unloaded reference-named torch nets at the published architecture."""
    cfg = REGISTRY[name]
    g0_cls, gl_cls, g0_nofg_cls = _oracle_classes()
    per_frame_nc = cfg["label_nc"] if cfg["label_nc"] else cfg["input_nc"]
    in_nc = per_frame_nc * cfg["tG"] + (cfg["tG"] if cfg["use_instance"] else 0)
    prev_nc = (cfg["tG"] - 1) * 3
    nets = []
    for s in range(cfg["n_scales"]):
        if s == 0:
            cls = g0_cls if cfg["fg"] else g0_nofg_cls
            nets.append(cls(in_nc, prev_nc, cfg["ngf"], cfg["nd"], cfg["nb"]))
        else:
            nets.append(gl_cls(in_nc, prev_nc, cfg["ngf"] >> s, cfg["nbl"], scale=s))
    return nets


def build_single_g_nets(name: str):
    """The use_single_G first-frame nets (netG_i + netE) for this family
    (reference: vid2vid_model_G.py:279-288)."""
    _ensure_tests_importable()
    from tests.test_torch_import import TorchEncoder, TorchGlobalWithZ

    cfg = REGISTRY[name]
    sg = cfg["single_g"]
    netG_i = TorchGlobalWithZ(
        cfg["input_nc"], sg["feat_num"], out_nc=3,
        ngf=sg["g"]["ngf"], nd=sg["g"]["nd"], nb=sg["g"]["nb"],
    )
    netE = TorchEncoder(
        3, sg["e"]["out_nc"], ngf=sg["e"]["ngf"], nd=sg["e"]["nd"]
    )
    return netG_i, netE


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


def _torch_single_g(name: str, pth_dir: str):
    """netG_i + netE + features clusters, loaded with the published bytes."""
    import numpy as np
    import torch

    sg = REGISTRY[name]["single_g"]
    sdir = os.path.join(os.path.dirname(pth_dir), sg["dirname"])
    netG_i, netE = build_single_g_nets(name)
    netG_i.load_state_dict(
        torch.load(os.path.join(sdir, "latest_net_G.pth"), map_location="cpu"),
        strict=True,
    )
    netE.load_state_dict(
        torch.load(os.path.join(sdir, "latest_net_E.pth"), map_location="cpu"),
        strict=True,
    )
    netG_i.eval(); netE.eval()
    features = np.load(
        os.path.join(sdir, "features.npy"), allow_pickle=True,
        encoding="latin1",
    ).item()
    return netG_i, netE, features


def torch_face_features(netE, features: dict, real_img, inst):
    """reference get_face_features (vid2vid_model_G.py:290-320): encode the
    real frame, read each part's feature at its first pixel, pick ONE
    training-image index by the distance summed jointly over parts
    (dists_min, base_model.py:136-144), fill each part with that row.
    Restricted to parts present in `inst` (the reference sums uninitialized
    rows for absent parts — unreproducible garbage, identical when all
    parts are present)."""
    import numpy as np
    import torch

    feat_num = next(iter(features.values())).shape[1] - 1
    with torch.no_grad():
        feat_map = netE(real_img, inst)
    inst_np = inst.numpy().astype(int)
    present = [int(l) for l in np.unique(inst_np) if int(l) in features]
    num_images = min(np.asarray(features[l]).shape[0] for l in present)
    dists = np.zeros((num_images,), np.float64)
    for label in present:
        idx = (inst == int(label)).nonzero()
        feat_ori = np.array([
            float(feat_map[idx[0, 0], idx[0, 1] + k, idx[0, 2], idx[0, 3]])
            for k in range(feat_num)
        ])
        ref = np.asarray(features[label])[:num_images, :feat_num]
        dists += ((ref - feat_ori) ** 2).sum(-1)
    best = int(np.argmin(dists))
    out = torch.zeros(inst.size(0), feat_num, inst.size(2), inst.size(3))
    for label in present:
        feat = np.asarray(features[label])[:, :-1]
        idx = (inst == int(label)).nonzero()
        row = feat[min(best, feat.shape[0] - 1)]
        for k in range(feat_num):
            out[idx[:, 0], idx[:, 1] + k, idx[:, 2], idx[:, 3]] = float(row[k])
    return out


def torch_single_g_seed(name: str, netG_i, netE, features, cond, real, pool_map):
    """generate_first_frame with use_single_G (vid2vid_model_G.py:237-244):
    one netG_i forward per seed frame, with netE cluster features."""
    import torch

    cfg = REGISTRY[name]
    frames = []
    with torch.no_grad():
        for i in range(cfg["tG"] - 1):
            feat = torch_face_features(
                netE, features, real[i : i + 1], pool_map[i : i + 1]
            )
            frames.append(netG_i(cond[i : i + 1], feat)[0])
    return torch.stack(frames)


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
        if not cfg["fg"]:
            return None
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


def jax_rollout(
    name: str, converted: dict, labels, inst, real_seed, frames: int,
    pool_map=None, real_first=None,
):
    """Our InferenceEngine on the converted params; same inputs/seeding.

    labels: int label maps (label_nc > 0) or float conditioning maps
    (T, C, H, W) when label_nc == 0. With a `single_g` config the seed
    frames come from the converted netG_i + netE + feature clusters
    (the --use_single_G path); otherwise from `real_seed`.
    """
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from vid2vid_tpu.config import Options
    from vid2vid_tpu.models.inference import InferenceEngine

    cfg = REGISTRY[name]
    opt = Options(
        label_nc=cfg["label_nc"], input_nc=cfg["input_nc"] or 3,
        use_instance=cfg["use_instance"],
        output_nc=3, ngf=cfg["ngf"], n_downsample_G=cfg["nd"],
        n_blocks=cfg["nb"], n_blocks_local=cfg["nbl"],
        n_scales_spatial=cfg["n_scales"], n_frames_G=cfg["tG"],
        norm=cfg["norm"], fg=cfg["fg"], fg_labels=cfg["fg_labels"],
        isTrain=False, use_single_G="single_g" in cfg,
        dataroot="datasets/face/" if "single_g" in cfg else "datasets/Cityscapes/",
    )
    eng = InferenceEngine(opt)
    restore = lambda v: ocp.PyTreeCheckpointer().restore(os.path.abspath(v))
    params = {
        k: restore(v)
        for k, v in converted.items()
        if k.startswith("G") and k != "G_i"
    }
    h, w = labels.shape[-2], labels.shape[-1]
    if cfg["label_nc"]:
        enc = eng.encode(jnp.asarray(labels)[None], jnp.asarray(inst)[None])
    else:
        enc = eng.encode(
            jnp.asarray(np.transpose(labels, (0, 2, 3, 1)))[None]
        )
    if "single_g" in cfg:
        sg = cfg["single_g"]
        eng.build_single_g(sg)
        clusters = np.load(
            converted["features"], allow_pickle=True, encoding="latin1"
        ).item()
        state = eng.single_g_first_frames(
            restore(converted["G_i"]),
            enc[:, : cfg["tG"] - 1],
            real_first=jnp.asarray(np.transpose(real_first, (0, 2, 3, 1)))[None],
            pool_map=jnp.asarray(pool_map)[None],
            encoder_params=restore(converted["E"]),
            feature_clusters=clusters,
        )
    else:
        state = eng.initial_state(
            1, h, w,
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
    tG = cfg["tG"]
    pool_map = real_first = None
    if cfg["label_nc"]:
        blocks = rng.integers(0, cfg["label_nc"], (T, h // 16, w // 16))
        labels = np.kron(blocks, np.ones((16, 16), np.int64)).astype(np.int32)
        inst = (labels * 7 + 3).astype(np.int32)  # edges exactly at label edges
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
    else:
        # float conditioning (edge2face: 15 edge/distance channels)
        labels = rng.uniform(-1, 1, (T, cfg["input_nc"], h, w)).astype(np.float32)
        inst = None
        onehot = torch.from_numpy(labels)
    real_seed = rng.uniform(-1, 1, (tG - 1, 3, h, w)).astype(np.float32)

    nets = _torch_stack(args.name, pth_dir)
    if "single_g" in cfg:
        # the --use_single_G seeding path: face part map + real frames
        # feed netE; seeds come from netG_i (vid2vid_model_G.py:237-244)
        n_parts = 7
        pb = rng.integers(0, n_parts, (tG - 1, h // 16, w // 16))
        pool_map = np.kron(pb, np.ones((16, 16), np.int64)).astype(np.int32)
        for p in range(n_parts):  # every part present -> bug-free NN search
            pool_map[:, p, :16] = p
        real_first = real_seed
        netG_i, netE, features = _torch_single_g(args.name, pth_dir)
        seed_t = torch_single_g_seed(
            args.name, netG_i, netE, features,
            onehot[: tG - 1], torch.from_numpy(real_first),
            torch.from_numpy(pool_map)[:, None],
        )
    else:
        seed_t = torch.from_numpy(real_seed)
    expected = torch_rollout(args.name, nets, onehot, seed_t, T)
    got = jax_rollout(
        args.name, converted, labels, inst, real_seed, T,
        pool_map=pool_map, real_first=real_first,
    )

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
