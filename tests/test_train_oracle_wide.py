"""Cross-framework golden test of the FULL-FEATURED training step.

Round 4's oracle (tests/test_train_oracle.py) pinned the simplest config
(n_scales_spatial=1, t_scales=1, fg off). This module widens it to the
remaining numerically-unverified training surfaces in ONE combined config:

  (a) n_scales_spatial=2 — the coarse-detach / finetune_all semantics
      (reference: models/vid2vid_model_G.py:181-186), the enhancer's
      flow x 20*2^s multiplier IN TRAINING, and the one-hot/label pyramid
      feeding each scale (vid2vid_model_G.py:146, base_model.py:122-134);
      parametrized over finetune_all False/True (the reference's optimizer
      covers only the finest scale until the unfreeze,
      vid2vid_model_G.py:72-76, base_model.py:161-167).
  (b) fg=True — the foreground branch + mask alpha-composite inside the
      LOSS path (networks.py:224-230, 309-323), with per-scale masks from
      the avg-pooled one-hot pyramid (vid2vid_model_G.py:322-330).
  (c) n_scales_temporal=2 — the second temporal pyramid scale, whose
      reference flow is recomputed ON THE FLY from the skipped real frames
      through the (stubbed) flow net (get_skipped_flows,
      vid2vid_model_D.py:292-302); three chunks so scale 1 actually
      activates (needs 7 accumulated frames at tD=3).
  (d) add_face_disc — netD_f on a deterministic face crop (label-2 block),
      face_weight=2, and its terms in loss_G / loss_D
      (vid2vid_model_D.py:149-166, 249-264).

Assertions per chunk over three chunks: every loss scalar, the three
optimizer groups' grad norms (incl. D covering netD+netD_f, and D_T per
scale), the post-step parameter deltas per group — including that a
FROZEN coarse scale is bitwise untouched when finetune_all=False.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tests.test_convert_fullsize import (
    TorchCompositeFG,
    TorchCompositeLocalFG,
    _warp_torch,
)
from tests.test_train_oracle import (
    LAM,
    LR,
    BETA1,
    TorchMultiscaleD,
    TorchVgg19Slices,
    _grad_norm,
    _jax_stub_flow,
    _t_fm_loss,
    _t_gan_loss,
    _t_masked_l1,
    _t_skipped,
    _t_stub_flow,
    _t_vgg_loss,
    _t_warp,
)
from vid2vid_tpu.config import Options
from vid2vid_tpu.train.loop import Trainer
from vid2vid_tpu.utils.torch_import import (
    apply_mapping,
    composite_generator_mapping,
    composite_local_mapping,
    multiscale_discriminator_mapping,
    vgg19_mapping,
)

pytestmark = pytest.mark.slow

TG, TD = 3, 3
N_LOAD = 3
N_CHUNKS = 3          # temporal scale 1 needs 7 accumulated frames
LABEL_NC = 4
H = W = 32
NGF, ND, NB, NBL = 8, 2, 4, 2
NDF, N_LAYERS_D, NUM_D = 8, 2, 2
T_SCALES = 2
FG_LABEL = 3
FACE_LABEL = 2        # get_face_region reads one-hot channel 2 (D.py:218)
FACE_SIZE = 32 // 32 * 8


# --------------------------------------------------------------- torch oracle


class _G0Feat(TorchCompositeFG):
    """CompositeGenerator returning the pre-head features the enhancer
    consumes (reference: models/networks.py:203-232 return signature)."""

    def forward(self, labels, prev, mask):
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


class _GlFeat(TorchCompositeLocalFG):
    """CompositeLocalGenerator returning features; flow x 20*2^scale
    (reference: models/networks.py:296-325)."""

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


def _t_pyr(x, n_scales):
    """build_pyr for (b, t, c, h, w): AvgPool(3, 2, 1,
    count_include_pad=False) per level (reference: base_model.py:122-134)."""
    out = [x]
    for _ in range(n_scales - 1):
        b, t, c, h, w = out[-1].shape
        p = F.avg_pool2d(
            out[-1].reshape(-1, c, h, w), 3, stride=2, padding=1,
            count_include_pad=False,
        )
        out.append(p.reshape(b, t, c, h // 2, w // 2))
    return out


def _t_face_region(real_a):
    """reference get_face_region (vid2vid_model_D.py:215-230)."""
    _, _, h, w = real_a.shape
    face = (real_a[:, FACE_LABEL] > 0.9).nonzero()
    if not face.size(0):
        return None
    y, x = face[:, 1], face[:, 2]
    ys, ye, xs, xe = y.min().item(), y.max().item(), x.min().item(), x.max().item()
    yc, ylen = int(ys + ye) // 2, FACE_SIZE
    xc, xlen = int(xs + xe) // 2, FACE_SIZE
    yc = max(ylen // 2, min(h - 1 - ylen // 2, yc))
    xc = max(xlen // 2, min(w - 1 - xlen // 2, xc))
    return yc - ylen // 2, yc + ylen // 2, xc - xlen // 2, xc + xlen // 2


def torch_train_chunk_wide(nets, opts_t, carry, onehot, real, finetune_all):
    """One full-featured reference training iteration over one chunk.

    Mirrors train.py:50-93 with: the 2-scale coarse-to-fine generator loop
    incl. coarse detach (vid2vid_model_G.py:151-194), per-scale fg masks,
    the face discriminator, and both temporal scales with on-the-fly
    coarse-scale flows.
    """
    netGs, netD, netD_f, netD_Ts, vgg = nets
    opt_g, opt_d, opt_dts = opts_t
    n_frames_bp = 1

    pyr_A = _t_pyr(onehot, 2)
    pyr = (
        _t_pyr(real[:, : TG - 1], 2) if carry["gen_tail"] is None
        else carry["gen_tail"]
    )
    pyr = [p.clone() for p in pyr]
    raws, flows, weights = [], [], []
    for t in range(N_LOAD):
        i_f = f_f = g_f = None
        for s in range(2):
            si = 1 - s
            A = pyr_A[si]
            h, w = A.shape[-2:]
            inp = A[:, t : t + TG].reshape(1, -1, h, w)
            prev = pyr[si][:, t : t + TG - 1]
            if (t % n_frames_bp) == 0:
                prev = prev.detach()
            prev = prev.reshape(1, -1, h, w)
            # compute_mask at this scale (vid2vid_model_G.py:322-330)
            mask = torch.clamp(A[:, t + TG - 1, FG_LABEL : FG_LABEL + 1], 0, 1)
            if s == 0:
                final, flow, weight, raw, i_f, f_f, g_f = netGs[0](inp, prev, mask)
            else:
                final, flow, weight, raw, i_f, f_f, g_f = netGs[1](
                    inp, prev, mask, i_f, f_f, g_f
                )
            if s != 1 and not finetune_all:
                final, i_f = final.detach(), i_f.detach()
                flow, f_f = flow.detach(), f_f.detach()
                g_f = g_f.detach()
            pyr[si] = torch.cat([pyr[si], final.unsqueeze(1)], 1)
            if s == 1:
                raws.append(raw); flows.append(flow); weights.append(weight)

    fake_B = pyr[0][:, TG - 1 :]
    carry["gen_tail"] = [p[:, -(TG - 1) :].detach() for p in pyr]

    real_A = onehot[:, TG - 1 :]
    real_Bp = real[:, TG - 2 :]
    real_B_prev, real_B = real_Bp[:, :-1], real_Bp[:, 1:]
    flow_ref, conf_ref = _t_stub_flow(real_B, real_B_prev)

    fake_B_prev = real_B_prev[:, 0:1] if carry["last"] is None else carry["last"]
    fake_B_prev = torch.cat([fake_B_prev, fake_B[:, :-1].detach()], 1)
    carry["last"] = fake_B[:, -1:].detach()

    fl = lambda x: x.reshape(-1, *x.shape[2:])
    rA, rB, rBp = fl(real_A), fl(real_B), fl(real_B_prev)
    fB, fBp = fl(fake_B), fl(fake_B_prev)
    fraw = torch.cat(raws, 0)
    fflow, fwt = torch.cat(flows, 0), torch.cat(weights, 0)
    flr, cfr = fl(flow_ref), fl(conf_ref)

    L = {}
    # lambda_F / 2^(n_scales_spatial - 1) (vid2vid_model_D.py:121)
    L["F_Flow"] = _t_masked_l1(fflow, flr, cfr) * LAM / 2.0
    L["F_Warp"] = _t_masked_l1(_t_warp(rBp, fflow), rB, cfr) * LAM
    L["W"] = torch.zeros(())
    L["G_VGG"] = (_t_vgg_loss(vgg, fB, rB) + _t_vgg_loss(vgg, fraw, rB)) * LAM

    def compute_loss_D(net, ra, rb, fake):
        pred_real = net(torch.cat([ra, rb], 1))
        pred_fake_d = net(torch.cat([ra, fake], 1).detach())
        d_real = _t_gan_loss(pred_real, True)
        d_fake = _t_gan_loss(pred_fake_d, False)
        pred_fake_g = net(torch.cat([ra, fake], 1))
        g_gan = _t_gan_loss(pred_fake_g, True)
        g_fm = _t_fm_loss(pred_fake_g, pred_real)
        return d_real, d_fake, g_gan, g_fm

    d_real, d_fake, g_gan, g_fm = compute_loss_D(netD, rA, rB, fB)
    d_real2, d_fake2, g_gan2, g_fm2 = compute_loss_D(netD, rA, rB, fraw)
    L["D_real"], L["D_fake"] = d_real + d_real2, d_fake + d_fake2
    L["G_GAN"], L["G_GAN_Feat"] = g_gan + g_gan2, g_fm + g_fm2
    L["G_Warp"] = _t_masked_l1(fB, _t_warp(fBp, flr).detach(), cfr) * LAM

    # face discriminator (vid2vid_model_D.py:149-166)
    region = _t_face_region(rA)
    assert region is not None, "test labels must contain the face block"
    ys, ye, xs, xe = region
    dfr, dff, gfg, gff = compute_loss_D(
        netD_f, rA[:, :, ys:ye, xs:xe], rB[:, :, ys:ye, xs:xe],
        fB[:, :, ys:ye, xs:xe],
    )
    L["G_f_GAN"], L["G_f_GAN_Feat"] = gfg * 2, gff * 2
    L["D_f_real"], L["D_f_fake"] = dfr, dff

    # temporal bookkeeping, t_scales=2 (get_skipped_frames/flows)
    carry["real_all"], real_sk = _t_skipped(carry["real_all"], real_B, T_SCALES, TD)
    carry["fake_all"], fake_sk = _t_skipped(carry["fake_all"], fake_B, T_SCALES, TD)
    carry["flow_all"], flow_g = _t_skipped(carry["flow_all"], flow_ref, 1, TD)
    flow_sk = [None] * T_SCALES
    if flow_g[0] is not None:
        flow_sk[0] = flow_g[0][:, 1:]
    for s in range(1, T_SCALES):
        if real_sk[s] is not None and real_sk[s].size(1) == TD:
            flow_sk[s], _ = _t_stub_flow(real_sk[s][:, 1:], real_sk[s][:, :-1])

    h, w = H, W

    def dt_input(frames, flow):
        x = frames.reshape(-1, 3 * TD, h, w)
        f = (flow / 20.0).reshape(-1, 2 * (TD - 1), h, w)
        return torch.cat([x, f], 1)

    t_L = []
    for s in range(T_SCALES):
        if real_sk[s] is None or fake_sk[s] is None:
            continue
        rt = dt_input(real_sk[s], flow_sk[s])
        ft = dt_input(fake_sk[s], flow_sk[s])
        pred_real_t = netD_Ts[s](rt)
        pred_fake_td = netD_Ts[s](ft.detach())
        e = {
            "D_T_real": _t_gan_loss(pred_real_t, True),
            "D_T_fake": _t_gan_loss(pred_fake_td, False),
        }
        pred_fake_tg = netD_Ts[s](ft)
        e["G_T_GAN"] = _t_gan_loss(pred_fake_tg, True)
        e["G_T_GAN_Feat"] = _t_fm_loss(pred_fake_tg, pred_real_t)
        t_L.append((s, e))

    # aggregation (vid2vid_model_D.py:249-264) + 3 backward/step passes
    loss_G = (
        L["G_GAN"] + L["G_GAN_Feat"] + L["G_VGG"] + L["G_Warp"]
        + L["F_Flow"] + L["F_Warp"] + L["W"]
        + L["G_f_GAN"] + L["G_f_GAN_Feat"]
    )
    loss_D = (L["D_fake"] + L["D_real"]) * 0.5 + (
        L["D_f_fake"] + L["D_f_real"]
    ) * 0.5
    for _, e in t_L:
        loss_G = loss_G + e["G_T_GAN"] + e["G_T_GAN_Feat"]

    opt_g.zero_grad(); loss_G.backward()
    L["G_grad_norm"] = _grad_norm(
        [p for g in netGs for p in g.parameters()]
    )
    opt_g.step()
    opt_d.zero_grad(); loss_D.backward()
    L["D_grad_norm"] = _grad_norm(
        list(netD.parameters()) + list(netD_f.parameters())
    )
    opt_d.step()
    out = {k: float(v) for k, v in L.items()}
    for i, (s, e) in enumerate(t_L):
        loss_D_T = (e["D_T_fake"] + e["D_T_real"]) * 0.5
        opt_dts[s].zero_grad(); loss_D_T.backward()
        out[f"D_T_grad_norm{i}"] = _grad_norm(netD_Ts[s].parameters())
        opt_dts[s].step()
        for k in ("D_T_real", "D_T_fake", "G_T_GAN", "G_T_GAN_Feat"):
            out[f"{k}{i}"] = float(e[k])
    out["loss_G_total"] = float(loss_G)
    out["loss_D_total"] = float(loss_D)
    return carry, out


# ------------------------------------------------------------------ JAX side


def _build_models(seed):
    torch.manual_seed(seed)
    in_nc = LABEL_NC * TG
    prev_nc = (TG - 1) * 3
    netG0 = _G0Feat(in_nc, prev_nc, ngf=NGF, nd=ND, nb=NB)
    netG1 = _GlFeat(in_nc, prev_nc, ngf=NGF // 2, nbl=NBL, scale=1)
    netD = TorchMultiscaleD(LABEL_NC + 3, NDF, N_LAYERS_D, NUM_D)
    netD_f = TorchMultiscaleD(LABEL_NC + 3, NDF, N_LAYERS_D, max(1, NUM_D - 2))
    netD_Ts = [
        TorchMultiscaleD(3 * TD + 2 * (TD - 1), NDF, N_LAYERS_D, NUM_D)
        for _ in range(T_SCALES)
    ]
    vgg = TorchVgg19Slices()
    for m in (netG0, netG1, netD, netD_f, *netD_Ts):
        m.train()
    return (netG0, netG1), netD, netD_f, netD_Ts, vgg


def _import_params(netGs, netD, netD_f, netD_Ts, vgg):
    sd = lambda m: {
        k: v.numpy().copy()
        for k, v in m.state_dict().items()
        if "num_batches" not in k
    }
    d_map = multiscale_discriminator_mapping(NUM_D, N_LAYERS_D, "batch")
    df_map = multiscale_discriminator_mapping(
        max(1, NUM_D - 2), N_LAYERS_D, "batch"
    )
    gparams = {
        "G0": apply_mapping(
            sd(netGs[0]), composite_generator_mapping(ND, NB, "batch", use_fg=True)
        ),
        "G1": apply_mapping(
            sd(netGs[1]), composite_local_mapping(NBL, "batch", use_fg=True)
        ),
    }
    dparams = {
        "D": apply_mapping(sd(netD), d_map),
        "D_f": apply_mapping(sd(netD_f), df_map),
        "vgg": apply_mapping(sd(vgg), vgg19_mapping()),
    }
    for s, net in enumerate(netD_Ts):
        dparams[f"D_T{s}"] = apply_mapping(sd(net), d_map)
    return gparams, dparams


def _make_trainer(gparams, dparams, finetune_all):
    opt = Options(
        label_nc=LABEL_NC, use_instance=False, output_nc=3,
        ngf=NGF, n_downsample_G=ND, n_blocks=NB, n_blocks_local=NBL,
        n_scales_spatial=2, n_frames_G=TG, n_frames_D=TD,
        n_scales_temporal=T_SCALES, add_face_disc=True,
        fg=True, fg_labels=(FG_LABEL,),
        ndf=NDF, num_D=NUM_D, n_layers_D=N_LAYERS_D,
        n_frames_total=N_CHUNKS * N_LOAD, max_frames_per_gpu=N_LOAD,
        norm="batch", no_vgg=False, bf16=False, remat=False,
        isTrain=True, fineSize=W, lr=LR, beta1=BETA1,
        niter_fix_global=0 if finetune_all else 1000,
    )
    trainer = Trainer(opt, flow_fn=_jax_stub_flow)
    state = trainer.init_state(H, W)
    state = state.replace(
        gparams=gparams,
        dparams=dparams,
        opt_g=trainer.g_tx.init(gparams),
        opt_d=trainer.d_tx.init(dparams),
        opt_dt=tuple(
            trainer.dt_tx.init(dparams[f"D_T{s}"]) for s in range(T_SCALES)
        ),
    )
    trainer.schedule.finetune_all = finetune_all
    return trainer, state


KEYS = [
    "G_VGG", "G_GAN", "G_GAN_Feat", "G_Warp", "F_Flow", "F_Warp", "W",
    "D_real", "D_fake", "G_f_GAN", "G_f_GAN_Feat", "D_f_real", "D_f_fake",
    "loss_G_total", "loss_D_total",
]
T_KEYS = ["G_T_GAN", "G_T_GAN_Feat", "D_T_real", "D_T_fake"]
GRAD_KEYS = ["G_grad_norm", "D_grad_norm"]


@pytest.mark.parametrize("finetune_all", [False, True])
def test_full_featured_training_matches_torch(finetune_all):
    """Three chunks of the 2-scale + fg + face-D + 2-temporal-scale
    reference training iteration; chunk 3 activates the second temporal
    scale with its on-the-fly coarse flow."""
    netGs, netD, netD_f, netD_Ts, vgg = _build_models(seed=23)
    gparams, dparams = _import_params(netGs, netD, netD_f, netD_Ts, vgg)
    trainer, state = _make_trainer(gparams, dparams, finetune_all)

    rng = np.random.default_rng(23)
    n_total = N_CHUNKS * N_LOAD + TG - 1
    # labels over {0, 1, FG_LABEL} + a fixed FACE_LABEL block so the face
    # region is a real sub-crop (rows 6..11, cols 18..25 -> bbox center
    # (8, 21), crop [4:12, 17:25])
    labels = rng.choice(
        np.array([0, 1, FG_LABEL], np.int32), (1, n_total, H, W)
    ).astype(np.int32)
    labels[:, :, 6:12, 18:26] = FACE_LABEL
    real = rng.uniform(-1, 1, (1, n_total, 3, H, W)).astype(np.float32)
    onehot_t = (
        F.one_hot(torch.from_numpy(labels).long(), LABEL_NC)
        .permute(0, 1, 4, 2, 3)
        .float()
    )
    real_t = torch.from_numpy(real)

    g_params_t = [p for g in netGs[1:] for p in g.parameters()]
    if finetune_all:
        g_params_t += list(netGs[0].parameters())
    opts_t = (
        torch.optim.Adam(g_params_t, lr=LR, betas=(BETA1, 0.999)),
        torch.optim.Adam(
            list(netD.parameters()) + list(netD_f.parameters()),
            lr=LR, betas=(BETA1, 0.999),
        ),
        [
            torch.optim.Adam(net.parameters(), lr=LR, betas=(BETA1, 0.999))
            for net in netD_Ts
        ],
    )
    t_carry = {"gen_tail": None, "last": None,
               "real_all": None, "fake_all": None, "flow_all": None}

    labels_j = jnp.asarray(labels)
    real_j = jnp.asarray(np.transpose(real, (0, 1, 3, 4, 2)))
    carry = trainer.start_clip()

    g0_before = jax.tree.map(np.asarray, gparams["G0"]["params"])

    t_len = N_LOAD + TG - 1
    for chunk in range(N_CHUNKS):
        i = chunk * N_LOAD
        if chunk == N_CHUNKS - 1:
            # re-sync params from torch before the LAST chunk: two chunks
            # of sign-like first Adam steps amplify ~1e-6 forward noise
            # into O(10%) grad-norm drift through the D nets (measured:
            # G_grad_norm 504 vs 613 unsynced), which would force the
            # scale-1-temporal assertions to be so loose they'd catch
            # nothing. On identical weights, the chunk that ACTIVATES
            # temporal scale 1 (with its on-the-fly coarse flow) is pinned
            # tightly; optimizer-step parity is carried by the chunk-0
            # param-delta asserts below + test_train_oracle's Adam tests.
            # The carry buffers (generator tail pyramids, accumulated fake
            # frames, fake_B_prev seed) are synced too — they hold fakes
            # generated with each framework's own drifted chunk-1/2
            # weights (measured 1.2% on G_f_GAN_Feat with params-only
            # sync) — so the activation chunk compares near-f32 tight.
            g2, d2 = _import_params(netGs, netD, netD_f, netD_Ts, vgg)
            state = state.replace(gparams=g2, dparams=d2)
            to_nhwc5 = lambda t: jnp.asarray(
                np.transpose(t.detach().numpy(), (0, 1, 3, 4, 2))
            )
            carry.gen_state = tuple(to_nhwc5(p) for p in t_carry["gen_tail"])
            carry.fake_buf = to_nhwc5(t_carry["fake_all"])
            carry.fake_prev_first = to_nhwc5(t_carry["last"])
        t_carry, expected = torch_train_chunk_wide(
            ((netGs[0], netGs[1]), netD, netD_f, netD_Ts, vgg), opts_t,
            t_carry, onehot_t[:, i : i + t_len], real_t[:, i : i + t_len],
            finetune_all,
        )
        state, carry, got = trainer.train_chunk(
            state, carry, labels_j[:, i : i + t_len], real_j[:, i : i + t_len]
        )
        if chunk == 2:
            assert "D_T_real1" in got and "D_T_real1" in expected, (
                "temporal scale 1 must activate on chunk 3"
            )
        # tolerance ladder as in test_train_oracle: chunk 0 pins the
        # formulas near-f32-tight; chunk 1 runs on post-Adam weights where
        # the first step's sign-like updates amplify ~1e-6 forward noise
        # to O(1%) on fake-dependent scalars; chunk 2 is fully resynced
        # (params + carries, see above) so the temporal-scale-1 activation
        # is pinned near-tight again
        tol = {0: 2e-4, 1: 3e-2}.get(chunk, 1e-3)
        keys = KEYS + [
            f"{k}{i_}" for k in T_KEYS
            for i_ in range(2 if chunk == 2 else 1)
        ]
        for k in keys:
            assert np.isclose(got[k], expected[k], rtol=tol, atol=tol), (
                chunk, k, got[k], expected[k]
            )
        # chunk 1 grad norms: one sign-like Adam step on BOTH G and D before
        # the comparison; measured drift 10.6% with finetune_all=True (the
        # coarse scale's stepped weights feed everything downstream). The
        # binding optimizer claims live in chunk 0's param-delta asserts
        # (incl. G0 below) and the resynced chunk 2 at 5e-3 — except
        # G_grad_norm with finetune_all=True, measured at a 0.62% residual
        # there (979.15 vs 973.08). Isolation: finetune_all=False passes
        # the same chunk at 5e-3 (G0 grads identically zero), so the
        # temporal-scale-1 detach structure is verified; the residual is
        # confined to the coarse scale's long grad path (G0 -> enhancer ->
        # D/D_T/VGG) under cross-framework f32 conditioning.
        gtol = {0: 5e-3, 1: 1.5e-1}.get(chunk, 5e-3)
        gkeys = GRAD_KEYS + [
            f"D_T_grad_norm{i_}" for i_ in range(2 if chunk == 2 else 1)
        ]
        for k in gkeys:
            kt = gtol
            if chunk == 2 and finetune_all and k == "G_grad_norm":
                kt = 1.5e-2
            assert np.isclose(got[k], expected[k], rtol=kt, atol=5e-4), (
                chunk, k, got[k], expected[k]
            )
        if chunk == 0:
            # post-step parameter parity per group (see test_train_oracle)
            g2, d2 = _import_params(netGs, netD, netD_f, netD_Ts, vgg)
            groups = [
                (g2["G1"]["params"], state.gparams["G1"]["params"], "G1"),
                (d2["D"]["params"], state.dparams["D"]["params"], "D"),
                (d2["D_f"]["params"], state.dparams["D_f"]["params"], "D_f"),
                (d2["D_T0"]["params"], state.dparams["D_T0"]["params"], "D_T0"),
            ]
            if finetune_all:
                # the coarse scale is IN the optimizer group: its Adam step
                # must match too (pins the unfrozen-optimizer subset)
                groups.append(
                    (g2["G0"]["params"], state.gparams["G0"]["params"], "G0")
                )
            for tree_t, tree_j, grp in groups:
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
            if not finetune_all:
                # the frozen coarse scale must be BITWISE untouched on the
                # jax side (zero grads -> zero Adam update)
                for a, b in zip(
                    jax.tree.leaves(g0_before),
                    jax.tree.leaves(
                        jax.tree.map(np.asarray, state.gparams["G0"]["params"])
                    ),
                ):
                    np.testing.assert_array_equal(a, b)
