"""Cross-framework golden test of the FULL TRAINING STEP.

A torch re-derivation of the reference's training iteration — the
sequential generator loop with truncated-BPTT detach cadence
(reference: models/vid2vid_model_G.py:139-196), the complete spatial loss
set (reference: models/vid2vid_model_D.py:93-179), the temporal-pyramid
bookkeeping + temporal GAN losses (:181-197, :275-302), the aggregation
(:249-264), and the reference's three Adam groups applied in train.py's
backward order (reference: train.py:84-93) — runs on reference-named torch
modules whose weights are converted with torch_import and fed to our
Trainer, with a shared deterministic flow stub in place of FlowNet2.

Asserted per chunk, across two chunks (so the cross-chunk generator/temporal
carries and the first optimizer step of every group are both covered):
  (a) every loss scalar matches (G_VGG, G_GAN, G_GAN_Feat, G_Warp, F_Flow,
      F_Warp, W, D_real, D_fake, G_T_*, D_T_*, and the two totals);
  (b) the per-optimizer-group gradient norms match (G / D / D_T0);
  (c) chunk 2's losses, computed on parameters updated by chunk 1's three
      Adam steps in both frameworks, still match — pinning optimizer parity.

Everything runs in f32 (bf16 is a deliberate deviation tested elsewhere).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tests.test_torch_import import TorchComposite, TorchNLayerD
from vid2vid_tpu.config import Options
from vid2vid_tpu.train.loop import Trainer
from vid2vid_tpu.utils.torch_import import (
    apply_mapping,
    composite_generator_mapping,
    multiscale_discriminator_mapping,
    vgg19_mapping,
)

TG, TD = 3, 3
N_LOAD = 3           # frames per chunk
LABEL_NC = 4
H = W = 32
NGF, ND, NB = 8, 2, 4
NDF, N_LAYERS_D, NUM_D = 8, 2, 2
LAM = 10.0           # lambda_feat = lambda_T = lambda_F (reference defaults)
LR, BETA1 = 2e-4, 0.5


# --------------------------------------------------------------- torch oracle


class TorchMultiscaleD(tnn.Module):
    """MultiscaleDiscriminator oracle with reference state-dict names
    (scale{i}_layer{j}; reference: models/networks.py:634-676). scale{i} is
    built with ndf*2^(num_D-1-i) capped at 64 and applied coarse-last."""

    def __init__(self, in_nc, ndf, n_layers, num_d):
        super().__init__()
        self.num_d, self.n_layers = num_d, n_layers
        for i in range(num_d):
            net = TorchNLayerD(in_nc, min(64, ndf * 2 ** (num_d - 1 - i)), n_layers)
            for j in range(n_layers + 2):
                setattr(self, f"scale{i}_layer{j}", getattr(net, f"model{j}"))
        self.downsample = tnn.AvgPool2d(3, stride=2, padding=1, count_include_pad=False)

    def forward(self, x):
        result = []
        for i in range(self.num_d):
            feats, h = [], x
            for j in range(self.n_layers + 2):
                h = getattr(self, f"scale{self.num_d - 1 - i}_layer{j}")(h)
                feats.append(h)
            result.append(feats)
            if i != self.num_d - 1:
                x = self.downsample(x)
        return result


class TorchVgg19Slices(tnn.Module):
    """Reference Vgg19 tap structure (reference: models/networks.py:840-868)
    over a hand-built VGG19 `features` stack with torchvision's layer
    indexing (torchvision itself is not in this image; pretrained weights
    are egress-blocked — random weights are equally valid for parity)."""

    # torchvision vgg19 cfg 'E': conv widths, 'M' = 2x2 maxpool
    _CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
            512, 512, 512, 512, "M", 512, 512)

    def __init__(self):
        super().__init__()
        layers, in_ch = [], 3
        for v in self._CFG:
            if v == "M":
                layers.append(tnn.MaxPool2d(2, 2))
            else:
                layers += [tnn.Conv2d(in_ch, v, 3, padding=1), tnn.ReLU()]
                in_ch = v
        self.features = tnn.Sequential(*layers)
        self.cuts = [2, 7, 12, 21, 30]
        for p in self.parameters():
            p.requires_grad = False

    def forward(self, x):
        taps, h, start = [], x, 0
        for cut in self.cuts:
            for i in range(start, cut):
                h = self.features[i](h)
            taps.append(h)
            start = cut
        return taps


def _t_vgg_loss(vgg, x, y):
    """reference VGGLoss (models/networks.py:776-791), width < 1024 path."""
    weights = [1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0]
    fx, fy = vgg(x), vgg(y)
    return sum(w * F.l1_loss(a, b.detach()) for w, a, b in zip(weights, fx, fy))


def _t_gan_loss(pred, target_is_real):
    target = 1.0 if target_is_real else 0.0
    return sum(F.mse_loss(p[-1], torch.full_like(p[-1], target)) for p in pred)


def _t_fm_loss(pred_fake, pred_real):
    feat_w = 4.0 / (N_LAYERS_D + 1)
    d_w = 1.0 / NUM_D
    loss = 0.0
    for i in range(min(len(pred_fake), NUM_D)):
        for j in range(len(pred_fake[i]) - 1):
            loss = loss + d_w * feat_w * F.l1_loss(
                pred_fake[i][j], pred_real[i][j].detach()
            ) * LAM
    return loss


def _t_masked_l1(a, b, mask):
    return F.l1_loss(a * mask, b * mask)


def _t_warp(x, flow):
    """grid_sample(border, align_corners=True) by pixel flow (reference:
    models/networks.py:79-115)."""
    b, _, h, w = x.shape
    hor = torch.linspace(-1, 1, w).view(1, 1, 1, w).expand(b, 1, h, w)
    ver = torch.linspace(-1, 1, h).view(1, 1, h, 1).expand(b, 1, h, w)
    grid = torch.cat([hor, ver], 1)
    nf = torch.cat([flow[:, 0:1] / ((w - 1) / 2), flow[:, 1:2] / ((h - 1) / 2)], 1)
    return F.grid_sample(
        x, (grid + nf).permute(0, 2, 3, 1),
        mode="bilinear", padding_mode="border", align_corners=True,
    )


def _t_stub_flow(b1, b2):
    """Deterministic FlowNet2 stand-in, identical math on both sides."""
    d = b1 - b2
    fx = 2.0 * torch.tanh(3.0 * d[:, :, 0])
    fy = 2.0 * torch.tanh(3.0 * d[:, :, 1])
    conf = torch.sigmoid(d[:, :, 2])
    return torch.stack([fx, fy], 2), conf.unsqueeze(2)


def _t_skipped(b_all, b, t_scales, td):
    """reference get_skipped_frames (models/vid2vid_model_D.py:275-289)."""
    b_all = torch.cat([b_all.detach(), b], dim=1) if b_all is not None else b
    skipped = [None] * t_scales
    for s in range(t_scales):
        tds = td**s
        span = tds * (td - 1)
        n_groups = min(b_all.size(1) - span, b.size(1))
        if n_groups > 0:
            for t in range(0, n_groups, td):
                skip = (
                    b_all[:, -span - t - 1 : -t : tds]
                    if t != 0
                    else b_all[:, -span - 1 :: tds]
                )
                skipped[s] = (
                    torch.cat([skipped[s], skip]) if skipped[s] is not None else skip
                )
    max_prev = td ** (t_scales - 1) * (td - 1)
    if b_all.size(1) > max_prev:
        b_all = b_all[:, -max_prev:]
    return b_all, skipped


def _grad_norm(params):
    total = 0.0
    for p in params:
        if p.grad is not None:
            total += float((p.grad.detach() ** 2).sum())
    return float(np.sqrt(total))


def torch_train_chunk(nets, opts_t, carry, onehot, real, n_frames_bp):
    """One reference training iteration over one chunk; returns (carry, dict).

    onehot: (1, N_LOAD+TG-1, C, H, W); real: (1, N_LOAD+TG-1, 3, H, W).
    Mirrors train.py:50-93 + vid2vid_model_G.forward + vid2vid_model_D.forward.
    """
    netG, netD, netD_T, vgg = nets
    opt_g, opt_d, opt_dt = opts_t
    h, w = real.shape[-2:]

    # ---- generator forward (vid2vid_model_G.py:139-196)
    pyr = real[:, : TG - 1] if carry["gen_tail"] is None else carry["gen_tail"]
    raws, flows, weights = [], [], []
    for t in range(N_LOAD):
        inp = onehot[:, t : t + TG].reshape(1, -1, h, w)
        prev = pyr[:, t : t + TG - 1]
        if (t % n_frames_bp) == 0:
            prev = prev.detach()
        final, flow, weight, raw = netG(inp, prev.reshape(1, -1, h, w))
        pyr = torch.cat([pyr, final.unsqueeze(1)], 1)
        raws.append(raw); flows.append(flow); weights.append(weight)
    fake_B = pyr[:, TG - 1 :]
    new_tail = pyr[:, -(TG - 1) :].detach()

    real_A = onehot[:, TG - 1 :]
    real_Bp = real[:, TG - 2 :]
    real_B_prev, real_B = real_Bp[:, :-1], real_Bp[:, 1:]
    flow_ref, conf_ref = _t_stub_flow(real_B, real_B_prev)

    # compute_fake_B_prev (vid2vid_model_G.py:332-336)
    fake_B_prev = real_B_prev[:, 0:1] if carry["last"] is None else carry["last"]
    fake_B_prev = torch.cat([fake_B_prev, fake_B[:, :-1].detach()], 1)
    carry["last"] = fake_B[:, -1:].detach()
    carry["gen_tail"] = new_tail

    # ---- flatten (train.py:140-145)
    fl = lambda x: x.reshape(-1, *x.shape[2:])
    rA, rB, rBp = fl(real_A), fl(real_B), fl(real_B_prev)
    fB, fBp = fl(fake_B), fl(fake_B_prev)
    fraw = torch.cat(raws, 0)
    fflow, fwt = torch.cat(flows, 0), torch.cat(weights, 0)
    flr, cfr = fl(flow_ref), fl(conf_ref)

    # ---- spatial losses (vid2vid_model_D.py:118-166)
    L = {}
    L["F_Flow"] = _t_masked_l1(fflow, flr, cfr) * LAM  # / 2^(scale_S-1) = 1
    L["F_Warp"] = _t_masked_l1(_t_warp(rBp, fflow), rB, cfr) * LAM
    L["W"] = torch.zeros(())
    L["G_VGG"] = (_t_vgg_loss(vgg, fB, rB) + _t_vgg_loss(vgg, fraw, rB)) * LAM

    def compute_loss_D(fake):
        pred_real = netD(torch.cat([rA, rB], 1))
        pred_fake_d = netD(torch.cat([rA, fake], 1).detach())
        d_real = _t_gan_loss(pred_real, True)
        d_fake = _t_gan_loss(pred_fake_d, False)
        pred_fake_g = netD(torch.cat([rA, fake], 1))
        g_gan = _t_gan_loss(pred_fake_g, True)
        g_fm = _t_fm_loss(pred_fake_g, pred_real)
        return d_real, d_fake, g_gan, g_fm

    d_real, d_fake, g_gan, g_fm = compute_loss_D(fB)
    d_real2, d_fake2, g_gan2, g_fm2 = compute_loss_D(fraw)
    L["D_real"], L["D_fake"] = d_real + d_real2, d_fake + d_fake2
    L["G_GAN"], L["G_GAN_Feat"] = g_gan + g_gan2, g_fm + g_fm2
    L["G_Warp"] = _t_masked_l1(fB, _t_warp(fBp, flr).detach(), cfr) * LAM

    # ---- temporal bookkeeping + losses (t_scales=1)
    carry["real_all"], real_sk = _t_skipped(carry["real_all"], real_B, 1, TD)
    carry["fake_all"], fake_sk = _t_skipped(carry["fake_all"], fake_B, 1, TD)
    carry["flow_all"], flow_g = _t_skipped(carry["flow_all"], flow_ref, 1, TD)
    flow_sk = flow_g[0][:, 1:]  # get_skipped_flows: drop first (D.py:297)

    def dt_input(frames):
        x = frames.reshape(-1, 3 * TD, h, w)
        f = (flow_sk / 20.0).reshape(-1, 2 * (TD - 1), h, w)
        return torch.cat([x, f], 1)

    rt, ft = dt_input(real_sk[0]), dt_input(fake_sk[0])
    pred_real_t = netD_T(rt)
    pred_fake_td = netD_T(ft.detach())
    L["D_T_real0"] = _t_gan_loss(pred_real_t, True)
    L["D_T_fake0"] = _t_gan_loss(pred_fake_td, False)
    pred_fake_tg = netD_T(ft)
    L["G_T_GAN0"] = _t_gan_loss(pred_fake_tg, True)
    L["G_T_GAN_Feat0"] = _t_fm_loss(pred_fake_tg, pred_real_t)

    # ---- aggregation + three backward/step passes (train.py:84-93)
    loss_G = (
        L["G_GAN"] + L["G_GAN_Feat"] + L["G_VGG"] + L["G_Warp"]
        + L["F_Flow"] + L["F_Warp"] + L["W"]
        + L["G_T_GAN0"] + L["G_T_GAN_Feat0"]
    )
    loss_D = (L["D_fake"] + L["D_real"]) * 0.5
    loss_D_T = (L["D_T_fake0"] + L["D_T_real0"]) * 0.5

    opt_g.zero_grad(); loss_G.backward()
    L["G_grad_norm"] = _grad_norm(netG.parameters())
    opt_g.step()
    opt_d.zero_grad(); loss_D.backward()
    L["D_grad_norm"] = _grad_norm(netD.parameters())
    opt_d.step()
    opt_dt.zero_grad(); loss_D_T.backward()
    L["D_T_grad_norm0"] = _grad_norm(netD_T.parameters())
    opt_dt.step()

    out = {
        k: (float(v.detach()) if torch.is_tensor(v) else v) for k, v in L.items()
    }
    out["loss_G_total"] = float(loss_G)
    out["loss_D_total"] = float(loss_D)
    return carry, out


# ------------------------------------------------------------------ JAX side


def _jax_stub_flow(b1, b2):
    d = b1 - b2
    fx = 2.0 * jnp.tanh(3.0 * d[..., 0])
    fy = 2.0 * jnp.tanh(3.0 * d[..., 1])
    conf = jax.nn.sigmoid(d[..., 2])
    return jnp.stack([fx, fy], -1), conf[..., None]


def _build_models(seed):
    torch.manual_seed(seed)
    netG = TorchComposite(LABEL_NC * TG, (TG - 1) * 3, ngf=NGF, nd=ND, nb=NB)
    netD = TorchMultiscaleD(LABEL_NC + 3, NDF, N_LAYERS_D, NUM_D)
    netD_T = TorchMultiscaleD(3 * TD + 2 * (TD - 1), NDF, N_LAYERS_D, NUM_D)
    vgg = TorchVgg19Slices()
    for m in (netG, netD, netD_T):
        m.train()
    return netG, netD, netD_T, vgg


def _import_params(netG, netD, netD_T, vgg):
    # .copy() is load-bearing: .numpy() VIEWS torch storage, and the torch
    # optimizers later mutate it in-place — numpy leaves convert to device
    # arrays lazily at the first jit call, which happens AFTER torch's
    # chunk-0 Adam steps (this exact aliasing produced post-step D weights
    # on the jax side and a 10% D_real mismatch before the copy)
    sd = lambda m: {
        k: v.numpy().copy()
        for k, v in m.state_dict().items()
        if "num_batches" not in k
    }
    d_map = multiscale_discriminator_mapping(NUM_D, N_LAYERS_D, "batch")
    gparams = {
        "G0": apply_mapping(sd(netG), composite_generator_mapping(ND, NB, "batch"))
    }
    dparams = {
        "D": apply_mapping(sd(netD), d_map),
        "D_T0": apply_mapping(sd(netD_T), d_map),
        "vgg": apply_mapping(sd(vgg), vgg19_mapping()),
    }
    return gparams, dparams


def _make_trainer(gparams, dparams):
    opt = Options(
        label_nc=LABEL_NC, use_instance=False, output_nc=3,
        ngf=NGF, n_downsample_G=ND, n_blocks=NB, n_scales_spatial=1,
        n_frames_G=TG, n_frames_D=TD, n_scales_temporal=1,
        ndf=NDF, num_D=NUM_D, n_layers_D=N_LAYERS_D,
        n_frames_total=6, max_frames_per_gpu=N_LOAD,
        norm="batch", fg=False, no_vgg=False, bf16=False, remat=False,
        isTrain=True, fineSize=W, lr=LR, beta1=BETA1, niter_fix_global=0,
    )
    trainer = Trainer(opt, flow_fn=_jax_stub_flow)
    state = trainer.init_state(H, W)
    state = state.replace(
        gparams=gparams,
        dparams=dparams,
        opt_g=trainer.g_tx.init(gparams),
        opt_d=trainer.d_tx.init(dparams),
        opt_dt=(trainer.dt_tx.init(dparams["D_T0"]),),
    )
    return trainer, state


KEYS = [
    "G_VGG", "G_GAN", "G_GAN_Feat", "G_Warp", "F_Flow", "F_Warp", "W",
    "D_real", "D_fake", "G_T_GAN0", "G_T_GAN_Feat0", "D_T_real0", "D_T_fake0",
    "loss_G_total", "loss_D_total",
]
GRAD_KEYS = ["G_grad_norm", "D_grad_norm", "D_T_grad_norm0"]


@pytest.mark.slow
@pytest.mark.parametrize("n_frames_bp", [1, 3])
def test_training_step_matches_torch(n_frames_bp):
    """Two chunks of the full reference training iteration: every loss
    scalar, every optimizer group's gradient norm, and (via chunk 2 on
    post-step weights) all three Adam updates."""
    netG, netD, netD_T, vgg = _build_models(seed=11)
    gparams, dparams = _import_params(netG, netD, netD_T, vgg)
    trainer, state = _make_trainer(gparams, dparams)
    trainer.schedule.n_frames_bp = n_frames_bp

    rng = np.random.default_rng(11)
    n_total = 2 * N_LOAD + TG - 1
    labels = rng.integers(0, LABEL_NC, (1, n_total, H, W)).astype(np.int32)
    real = rng.uniform(-1, 1, (1, n_total, 3, H, W)).astype(np.float32)
    onehot_t = (
        F.one_hot(torch.from_numpy(labels).long(), LABEL_NC)
        .permute(0, 1, 4, 2, 3)
        .float()
    )
    real_t = torch.from_numpy(real)

    opts_t = (
        torch.optim.Adam(netG.parameters(), lr=LR, betas=(BETA1, 0.999)),
        torch.optim.Adam(netD.parameters(), lr=LR, betas=(BETA1, 0.999)),
        torch.optim.Adam(netD_T.parameters(), lr=LR, betas=(BETA1, 0.999)),
    )
    t_carry = {"gen_tail": None, "last": None,
               "real_all": None, "fake_all": None, "flow_all": None}

    labels_j = jnp.asarray(labels)
    real_j = jnp.asarray(np.transpose(real, (0, 1, 3, 4, 2)))
    carry = trainer.start_clip()

    t_len = N_LOAD + TG - 1
    for chunk, i in enumerate([0, N_LOAD]):
        t_carry, expected = torch_train_chunk(
            (netG, netD, netD_T, vgg), opts_t, t_carry,
            onehot_t[:, i : i + t_len], real_t[:, i : i + t_len], n_frames_bp,
        )
        state, carry, got = trainer.train_chunk(
            state, carry, labels_j[:, i : i + t_len], real_j[:, i : i + t_len]
        )
        # chunk 1: every loss + grad norm at near-f32 tightness pins the
        # formulas, detach boundaries, and batch-norm train semantics.
        # chunk 2 runs on post-Adam weights in both frameworks; the FIRST
        # Adam step is sign-like (g/(|g|+eps)), so ~1e-6 cross-framework
        # forward noise flips near-zero-grad weights by O(lr) (measured:
        # fake-dependent scalars land ~0.5-1% apart) — 2e-2 is the
        # conditioning floor there, still far below the 9-15% errors real
        # bugs produced during development. The param-delta asserts below
        # and test_optax_adam_matches_torch carry the optimizer-exactness
        # burden instead.
        tol = 2e-4 if chunk == 0 else 2e-2
        for k in KEYS:
            assert np.isclose(got[k], expected[k], rtol=tol, atol=tol), (
                chunk, k, got[k], expected[k]
            )
        gtol = 5e-3 if chunk == 0 else 5e-2
        for k in GRAD_KEYS:
            assert np.isclose(got[k], expected[k], rtol=gtol, atol=5e-4), (
                chunk, k, got[k], expected[k]
            )
        if chunk == 0:
            # post-step parameter parity, per optimizer group: both
            # frameworks applied one Adam step to identical params with
            # near-identical grads. Deltas concentrate on sign-flipped
            # near-zero-grad weights (each ~2*lr); a wrong lr / missing
            # group / wrong eps semantics shifts the MEAN by O(lr).
            # "params" only: torch updates D BatchNorm running stats during
            # train-mode forwards while our jitted steps never touch them —
            # a deliberate deviation (they don't affect train math), so
            # batch_stats are excluded from the parity claim
            g2, d2 = _import_params(netG, netD, netD_T, vgg)
            for tree_t, tree_j, grp in (
                (g2["G0"]["params"], state.gparams["G0"]["params"], "G"),
                (d2["D"]["params"], state.dparams["D"]["params"], "D"),
                (d2["D_T0"]["params"], state.dparams["D_T0"]["params"], "D_T0"),
            ):
                deltas = jax.tree.leaves(
                    jax.tree.map(
                        lambda a, b: jnp.abs(jnp.asarray(a) - b), tree_t, tree_j
                    )
                )
                mean_d = float(
                    sum(d.sum() for d in deltas) / sum(d.size for d in deltas)
                )
                max_d = float(max(d.max() for d in deltas))
                assert mean_d < 0.25 * LR, (grp, mean_d)
                assert max_d < 3.0 * LR, (grp, max_d)


def test_optax_adam_matches_torch():
    """The optimizer math itself, isolated from forward-pass conditioning:
    identical params + an identical fixed grad sequence through
    optax.adam(lr, b1=0.5, b2=0.999) and torch.optim.Adam must produce
    bitwise-near params for 10 steps (reference: train.py's three Adam
    groups, models/base_model.py:161-167)."""
    import optax

    rng = np.random.default_rng(5)
    p0 = rng.standard_normal((37, 13)).astype(np.float32) * 0.1
    grads = [
        (rng.standard_normal((37, 13)).astype(np.float32) * 10.0**rng.uniform(-6, 1))
        for _ in range(10)
    ]

    pt = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt_t = torch.optim.Adam([pt], lr=LR, betas=(BETA1, 0.999))

    tx = optax.adam(LR, b1=BETA1, b2=0.999, eps=1e-8)
    pj = jnp.asarray(p0)
    st = tx.init(pj)

    for i, g in enumerate(grads):
        opt_t.zero_grad()
        pt.grad = torch.from_numpy(g.copy())
        opt_t.step()
        upd, st = tx.update(jnp.asarray(g), st, pj)
        pj = optax.apply_updates(pj, upd)
        np.testing.assert_allclose(
            pt.detach().numpy(), np.asarray(pj), rtol=1e-5, atol=1e-7,
            err_msg=f"step {i}",
        )
