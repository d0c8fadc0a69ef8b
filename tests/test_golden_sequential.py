"""End-to-end cross-framework golden test of the sequential path.

A reference-shaped torch model stack (2 spatial scales, reference state-dict
names) drives an independent re-implementation of the reference's streaming
inference loop (reference: models/vid2vid_model_G.py:198-251 — build_pyr
seeding from real frames, coarse-to-fine feature injection, flow-warp
composite, per-scale fake_B ring buffers). The same weights are converted
with torch_import and run through our InferenceEngine — both the whole-clip
`generate_clip` scan and the one-frame `step` streaming path — and every
generated frame must match to <1e-2 max abs pixel delta (the BASELINE.json
north-star tolerance), frame-for-frame over a multi-frame clip.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tests.test_torch_import import TorchComposite, _RB, _bn, to_nhwc
from vid2vid_tpu.config import Options
from vid2vid_tpu.models.inference import InferenceEngine
from vid2vid_tpu.utils.torch_import import (
    apply_mapping,
    composite_generator_mapping,
    composite_local_mapping,
)

pytestmark = pytest.mark.slow  # multi-minute golden/oracle tier

TG = 3
N_SCALES = 2
LABEL_NC = 4
H, W = 64, 64
N_FRAMES = 8  # 6 generated


def _warp(prev3, flow):
    """grid_sample(border, align_corners=True) warp by pixel flow — the
    reference's BaseNetwork.resample (reference: models/networks.py:79-115)."""
    b, _, h, w = prev3.shape
    hor = torch.linspace(-1, 1, w).view(1, 1, 1, w).expand(b, 1, h, w)
    ver = torch.linspace(-1, 1, h).view(1, 1, h, 1).expand(b, 1, h, w)
    grid = torch.cat([hor, ver], 1)
    norm_flow = torch.cat(
        [flow[:, 0:1] / ((w - 1) / 2), flow[:, 1:2] / ((h - 1) / 2)], 1
    )
    return F.grid_sample(
        prev3, (grid + norm_flow).permute(0, 2, 3, 1),
        mode="bilinear", padding_mode="border", align_corners=True,
    )


class TorchCompositeFeat(TorchComposite):
    """TorchComposite returning the pre-head features the enhancer consumes
    (reference CompositeGenerator returns img_feat/flow_feat,
    reference: models/networks.py:203-232)."""

    def forward(self, labels, prev):
        d = self.model_down_seg(labels) + self.model_down_img(prev)
        img_feat = self.model_up_img(self.model_res_img(d))
        raw = self.model_final_img(img_feat)
        flow_feat = self.model_up_flow(self.model_res_flow(d))
        flow = self.model_final_flow(flow_feat) * 20
        weight = self.model_final_w(flow_feat)
        final = raw * weight + _warp(prev[:, -3:], flow) * (1 - weight)
        return final, flow, weight, raw, img_feat, flow_feat


class TorchCompositeLocal(tnn.Module):
    """Enhancer-scale oracle with reference state-dict names
    (reference: models/networks.py:234-325)."""

    def __init__(self, in_nc, prev_nc, ngf=4, nbl=2, out_nc=3, norm=_bn, scale=1):
        super().__init__()
        self.scale = scale

        def down(cin):
            return tnn.Sequential(
                tnn.ReflectionPad2d(3), tnn.Conv2d(cin, ngf, 7), norm(ngf),
                tnn.ReLU(True),
                tnn.Conv2d(ngf, ngf * 2, 3, 2, 1), norm(ngf * 2), tnn.ReLU(True),
            )

        def up():
            return tnn.Sequential(
                *[_RB(ngf * 2, norm) for _ in range(nbl)],
                tnn.ConvTranspose2d(ngf * 2, ngf, 3, 2, 1, output_padding=1),
                norm(ngf), tnn.ReLU(True),
            )

        self.model_down_seg = down(in_nc)
        self.model_down_img = down(prev_nc)
        self.model_up_img = up()
        self.model_final_img = tnn.Sequential(
            tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, out_nc, 7), tnn.Tanh()
        )
        self.model_up_flow = up()
        self.model_final_flow = tnn.Sequential(
            tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, 2, 7)
        )
        self.model_final_w = tnn.Sequential(
            tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, 1, 7), tnn.Sigmoid()
        )

    def forward(self, inp, prev, img_feat_coarse, flow_feat_coarse):
        down = self.model_down_seg(inp) + self.model_down_img(prev)
        img_feat = self.model_up_img(down + img_feat_coarse)
        raw = self.model_final_img(img_feat)
        flow_feat = self.model_up_flow(down + flow_feat_coarse)
        flow = self.model_final_flow(flow_feat) * (20 * 2**self.scale)
        weight = self.model_final_w(flow_feat)
        final = raw * weight + _warp(prev[:, -3:], flow) * (1 - weight)
        return final, flow, weight, raw, img_feat, flow_feat


def torch_sequential_inference(netG0, netG1, a_maps, real_b):
    """The reference's streaming inference loop, re-derived independently
    (reference: vid2vid_model_G.py:198-229 generate_frame_infer +
    generate_first_frame real-frame seeding + base_model.py:122-134
    build_pyr).

    `a_maps`: (T, C, H, W) float conditioning — one-hot labels for the
    street config; edge+distance maps (face) or densepose+openpose renders
    (pose) pass through un-encoded, like the reference's label_nc=0 path
    (vid2vid_model_G.py:86-96)."""
    pool = tnn.AvgPool2d(3, 2, 1, count_include_pad=False)

    def build_pyr(x):  # (K, C, h, w) -> [finest, ..., coarsest]
        pyr = [x]
        for _ in range(N_SCALES - 1):
            pyr.append(pool(pyr[-1]))
        return pyr

    fake_prev = build_pyr(real_b[: TG - 1])  # seed: first tG-1 real frames
    outs = []
    for i in range(TG - 1, N_FRAMES):
        a_pyr = build_pyr(a_maps[i - TG + 1 : i + 1])
        img_feat = flow_feat = None
        for s in range(N_SCALES):
            si = N_SCALES - 1 - s
            h, w = a_pyr[si].shape[-2:]
            inp = a_pyr[si].reshape(1, -1, h, w)
            prev = fake_prev[si].reshape(1, -1, h, w)
            if s == 0:
                final, *_rest, img_feat, flow_feat = netG0(inp, prev)
            else:
                final, *_rest, img_feat, flow_feat = netG1(
                    inp, prev, img_feat, flow_feat
                )
            fake_prev[si] = torch.cat([fake_prev[si][1:], final])
        outs.append(final[0])
    return torch.stack(outs)  # (T_out, 3, H, W)


@pytest.fixture(scope="module")
def golden():
    torch.manual_seed(7)
    rng = np.random.default_rng(7)
    ngf, nd, nb, nbl = 8, 2, 4, 2
    netG0 = TorchCompositeFeat(
        LABEL_NC * TG, (TG - 1) * 3, ngf=ngf, nd=nd, nb=nb
    ).eval()
    netG1 = TorchCompositeLocal(
        LABEL_NC * TG, (TG - 1) * 3, ngf=ngf // 2, nbl=nbl
    ).eval()

    labels = rng.integers(0, LABEL_NC, (N_FRAMES, H, W)).astype(np.int32)
    real_b = (rng.uniform(-1, 1, (N_FRAMES, 3, H, W))).astype(np.float32)
    onehot = (
        F.one_hot(torch.from_numpy(labels).long(), LABEL_NC)
        .permute(0, 3, 1, 2)
        .float()
    )
    with torch.no_grad():
        expected = torch_sequential_inference(
            netG0, netG1, onehot, torch.from_numpy(real_b)
        ).numpy()

    opt = Options(
        label_nc=LABEL_NC, use_instance=False, output_nc=3,
        ngf=ngf, n_downsample_G=nd, n_blocks=nb, n_blocks_local=nbl,
        n_scales_spatial=N_SCALES, n_frames_G=TG, norm="batch",
        fg=False, isTrain=False,
    )
    params = {
        "G0": apply_mapping(
            {k: v.numpy() for k, v in netG0.state_dict().items()},
            composite_generator_mapping(nd, nb, "batch"),
        ),
        "G1": apply_mapping(
            {k: v.numpy() for k, v in netG1.state_dict().items()},
            composite_local_mapping(nbl, "batch"),
        ),
    }
    return opt, params, labels, real_b, expected


class TestGoldenSequential:
    def test_generate_clip_matches_torch_frame_for_frame(self, golden):
        opt, params, labels, real_b, expected = golden
        eng = InferenceEngine(opt)
        enc = eng.encode(jnp.asarray(labels)[None])
        real_nhwc = jnp.asarray(np.transpose(real_b, (0, 2, 3, 1)))[None]
        state = eng.initial_state(1, H, W, real_frames=real_nhwc)
        outs, _ = eng.generate_clip(params, enc, state)
        got = np.asarray(outs.fake[0])  # (T_out, H, W, 3)
        exp = np.transpose(expected, (0, 2, 3, 1))
        assert got.shape == exp.shape
        delta = np.abs(got - exp)
        # per-frame so a creeping divergence across the recurrence is visible
        for t in range(exp.shape[0]):
            assert delta[t].max() < 1e-2, (t, delta[t].max())
        assert delta.mean() < 1e-3

    def test_streaming_step_matches_torch(self, golden):
        """The one-frame `step` path (what test_cli drives): same windows,
        same ring-buffer state, same frames."""
        opt, params, labels, real_b, expected = golden
        eng = InferenceEngine(opt)
        real_nhwc = jnp.asarray(np.transpose(real_b, (0, 2, 3, 1)))[None]
        state = eng.initial_state(1, H, W, real_frames=real_nhwc)
        exp = np.transpose(expected, (0, 2, 3, 1))
        for i in range(TG - 1, N_FRAMES):
            window = jnp.asarray(labels[i - TG + 1 : i + 1])[None]
            frame, state = eng.step(params, window, None, state)
            delta = np.abs(np.asarray(frame[0]) - exp[i - TG + 1])
            assert delta.max() < 1e-2, (i, delta.max())


def _continuous_golden(in_ch, seed):
    """Shared builder for the face/pose variants: `in_ch`-channel continuous
    conditioning (label_nc=0), 2-scale composite, frame-for-frame torch
    oracle (reference: face 15-ch input, data/face_dataset.py:71-89; pose
    6-ch densepose+openpose, data/pose_dataset.py:39-57)."""
    torch.manual_seed(seed)
    rng = np.random.default_rng(seed)
    ngf, nd, nb, nbl = 8, 2, 4, 2
    netG0 = TorchCompositeFeat(in_ch * TG, (TG - 1) * 3, ngf=ngf, nd=nd, nb=nb).eval()
    netG1 = TorchCompositeLocal(in_ch * TG, (TG - 1) * 3, ngf=ngf // 2, nbl=nbl).eval()

    # sparse edge/render-like conditioning in [-1, 1]
    a = np.full((N_FRAMES, in_ch, H, W), -1.0, np.float32)
    mask = rng.random((N_FRAMES, in_ch, H, W)) < 0.07
    a[mask] = rng.uniform(-1, 1, mask.sum()).astype(np.float32)
    real_b = rng.uniform(-1, 1, (N_FRAMES, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        expected = torch_sequential_inference(
            netG0, netG1, torch.from_numpy(a), torch.from_numpy(real_b)
        ).numpy()

    opt = Options(
        label_nc=0, input_nc=in_ch, use_instance=False, output_nc=3,
        ngf=ngf, n_downsample_G=nd, n_blocks=nb, n_blocks_local=nbl,
        n_scales_spatial=N_SCALES, n_frames_G=TG, norm="batch",
        fg=False, isTrain=False,
    )
    params = {
        "G0": apply_mapping(
            {k: v.numpy() for k, v in netG0.state_dict().items()},
            composite_generator_mapping(nd, nb, "batch"),
        ),
        "G1": apply_mapping(
            {k: v.numpy() for k, v in netG1.state_dict().items()},
            composite_local_mapping(nbl, "batch"),
        ),
    }
    return opt, params, a, real_b, expected


def _assert_sequential_golden(opt, params, a, real_b, expected):
    eng = InferenceEngine(opt)
    a_nhwc = jnp.asarray(np.transpose(a, (0, 2, 3, 1)))[None]
    enc = eng.encode(a_nhwc)
    real_nhwc = jnp.asarray(np.transpose(real_b, (0, 2, 3, 1)))[None]
    state = eng.initial_state(1, H, W, real_frames=real_nhwc)
    outs, _ = eng.generate_clip(params, enc, state)
    got = np.asarray(outs.fake[0])
    exp = np.transpose(expected, (0, 2, 3, 1))
    assert got.shape == exp.shape
    delta = np.abs(got - exp)
    for t in range(exp.shape[0]):
        assert delta[t].max() < 1e-2, (t, delta[t].max())
    assert delta.mean() < 1e-3

    # streaming step path too (what test_cli drives)
    state = eng.initial_state(1, H, W, real_frames=real_nhwc)
    for i in range(TG - 1, N_FRAMES):
        window = a_nhwc[:, i - TG + 1 : i + 1]
        frame, state = eng.step(params, window, None, state)
        d = np.abs(np.asarray(frame[0]) - exp[i - TG + 1])
        assert d.max() < 1e-2, (i, d.max())


class TestGoldenFaceShaped:
    def test_face_15ch_sequential(self):
        """edge2face-shaped sequential path: 15-channel continuous input
        (face edges + per-part distance maps, reference:
        data/face_dataset.py:71-89), frame-for-frame <1e-2."""
        _assert_sequential_golden(*_continuous_golden(in_ch=15, seed=21))


class TestGoldenPoseShaped:
    def test_pose_6ch_sequential(self):
        """pose2body-shaped sequential path: 6-channel densepose+openpose
        conditioning (reference: data/pose_dataset.py:39-57),
        frame-for-frame <1e-2."""
        _assert_sequential_golden(*_continuous_golden(in_ch=6, seed=22))
