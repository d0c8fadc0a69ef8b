"""FlowNet2 torch-oracle import parity (round-2 verdict missing #2).

Builds the reference FlowNet2 graph as torch oracles with reference
state-dict names (reference: models/flownet2_pytorch/networks/
{FlowNetC,FlowNetS,FlowNetSD,FlowNetFusion}.py, models.py:96-161), seeded
random weights, small spatial sizes — then converts each state dict through
utils/torch_import's flownet mappings and checks forward parity of every
branch, the full composite, and the vid2vid wrapper (//64 resize + conf,
reference models/flownet.py:43-58). These are the weights that feed every
F_Flow / F_Warp training target, so a wiring slip here would silently
degrade training.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vid2vid_tpu.models.flownet2.flownet2 import FlowNet2
from vid2vid_tpu.models.flownet2.nets import (
    FlowNetC,
    FlowNetFusion,
    FlowNetS,
    FlowNetSD,
)
from vid2vid_tpu.models.flownet2.wrapper import FlowEstimator
from vid2vid_tpu.utils.torch_import import (
    apply_mapping,
    flownet2_mapping,
    flownet_c_mapping,
    flownet_fusion_mapping,
    flownet_s_mapping,
    flownet_sd_mapping,
)

pytestmark = pytest.mark.slow  # multi-minute golden/oracle tier


def to_nhwc(x):
    return np.transpose(np.asarray(x), (0, 2, 3, 1))


# ------------------------------------------------------------ torch fixtures
# Builders mirroring flownet2_pytorch/networks/submodules.py (batchNorm=False)


def _c(ci, co, k=3, s=1):
    return tnn.Sequential(tnn.Conv2d(ci, co, k, s, (k - 1) // 2), tnn.LeakyReLU(0.1))


def _dc(ci, co):
    return tnn.Sequential(tnn.ConvTranspose2d(ci, co, 4, 2, 1), tnn.LeakyReLU(0.1))


def _ic(ci, co):
    return tnn.Sequential(tnn.Conv2d(ci, co, 3, 1, 1))


def _pf(ci):
    return tnn.Conv2d(ci, 2, 3, 1, 1)


def _uf(bias=True):
    return tnn.ConvTranspose2d(2, 2, 4, 2, 1, bias=bias)


def _corr(a, b, md=20, s2=2):
    """Reference correlation semantics: mean over C of f1 * shifted f2,
    displacement grid stride s2, dy-major channel order (reference CUDA:
    correlation_cuda_kernel.cu:73-147)."""
    n, c, h, w = a.shape
    bp = F.pad(b, (md, md, md, md))
    rad = md // s2
    rows = []
    for tj in range(-rad, rad + 1):
        for ti in range(-rad, rad + 1):
            y, x = tj * s2 + md, ti * s2 + md
            rows.append((a * bp[:, :, y : y + h, x : x + w]).mean(1))
    return torch.stack(rows, 1)


def _warp(im, flow):
    """Pixel-displacement bilinear warp, border clamp (Resample2d semantics:
    resample2d_kernel.cu:16-64; even/odd flow channel = x/y)."""
    n, c, h, w = im.shape
    ys, xs = torch.meshgrid(
        torch.arange(h, dtype=torch.float32),
        torch.arange(w, dtype=torch.float32),
        indexing="ij",
    )
    gx = (xs + flow[:, 0]) / ((w - 1) / 2) - 1
    gy = (ys + flow[:, 1]) / ((h - 1) / 2) - 1
    return F.grid_sample(
        im,
        torch.stack([gx, gy], -1),
        mode="bilinear",
        padding_mode="border",
        align_corners=True,
    )


def _cnorm(x):
    return (x * x).sum(1, keepdim=True).sqrt()


def _decode(net, o2, o3, o4, o5, o6):
    """FlowNetC/S refinement decoder walk (FlowNetC.py:105-131)."""
    f6 = net.predict_flow6(o6)
    cat5 = torch.cat([o5, net.deconv5(o6), net.upsampled_flow6_to_5(f6)], 1)
    f5 = net.predict_flow5(cat5)
    cat4 = torch.cat([o4, net.deconv4(cat5), net.upsampled_flow5_to_4(f5)], 1)
    f4 = net.predict_flow4(cat4)
    cat3 = torch.cat([o3, net.deconv3(cat4), net.upsampled_flow4_to_3(f4)], 1)
    f3 = net.predict_flow3(cat3)
    cat2 = torch.cat([o2, net.deconv2(cat3), net.upsampled_flow3_to_2(f3)], 1)
    return net.predict_flow2(cat2)


class TFlowNetC(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = _c(3, 64, 7, 2)
        self.conv2 = _c(64, 128, 5, 2)
        self.conv3 = _c(128, 256, 5, 2)
        self.conv_redir = _c(256, 32, 1)
        self.conv3_1 = _c(473, 256)
        self.conv4, self.conv4_1 = _c(256, 512, s=2), _c(512, 512)
        self.conv5, self.conv5_1 = _c(512, 512, s=2), _c(512, 512)
        self.conv6, self.conv6_1 = _c(512, 1024, s=2), _c(1024, 1024)
        self.deconv5, self.deconv4 = _dc(1024, 512), _dc(1026, 256)
        self.deconv3, self.deconv2 = _dc(770, 128), _dc(386, 64)
        for lvl, ci in zip((6, 5, 4, 3, 2), (1024, 1026, 770, 386, 194)):
            setattr(self, f"predict_flow{lvl}", _pf(ci))
        for lvl in (6, 5, 4, 3):
            setattr(self, f"upsampled_flow{lvl}_to_{lvl - 1}", _uf(True))

    def forward(self, x):
        a1 = self.conv1(x[:, :3])
        a2 = self.conv2(a1)
        a3 = self.conv3(a2)
        b3 = self.conv3(self.conv2(self.conv1(x[:, 3:])))
        corr = F.leaky_relu(_corr(a3, b3), 0.1)
        m = self.conv3_1(torch.cat([self.conv_redir(a3), corr], 1))
        c4 = self.conv4_1(self.conv4(m))
        c5 = self.conv5_1(self.conv5(c4))
        c6 = self.conv6_1(self.conv6(c5))
        return _decode(self, a2, m, c4, c5, c6)


class TFlowNetS(tnn.Module):
    def __init__(self, in_ch=12):
        super().__init__()
        self.conv1 = _c(in_ch, 64, 7, 2)
        self.conv2 = _c(64, 128, 5, 2)
        self.conv3 = _c(128, 256, 5, 2)
        self.conv3_1 = _c(256, 256)
        self.conv4, self.conv4_1 = _c(256, 512, s=2), _c(512, 512)
        self.conv5, self.conv5_1 = _c(512, 512, s=2), _c(512, 512)
        self.conv6, self.conv6_1 = _c(512, 1024, s=2), _c(1024, 1024)
        self.deconv5, self.deconv4 = _dc(1024, 512), _dc(1026, 256)
        self.deconv3, self.deconv2 = _dc(770, 128), _dc(386, 64)
        for lvl, ci in zip((6, 5, 4, 3, 2), (1024, 1026, 770, 386, 194)):
            setattr(self, f"predict_flow{lvl}", _pf(ci))
        for lvl in (6, 5, 4, 3):
            setattr(self, f"upsampled_flow{lvl}_to_{lvl - 1}", _uf(False))

    def forward(self, x):
        c2 = self.conv2(self.conv1(x))
        c3 = self.conv3(c2)
        c3_1 = self.conv3_1(c3)
        c4 = self.conv4_1(self.conv4(c3_1))
        c5 = self.conv5_1(self.conv5(c4))
        c6 = self.conv6_1(self.conv6(c5))
        return _decode(self, c2, c3_1, c4, c5, c6)


class TFlowNetSD(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv0 = _c(6, 64)
        self.conv1, self.conv1_1 = _c(64, 64, s=2), _c(64, 128)
        self.conv2, self.conv2_1 = _c(128, 128, s=2), _c(128, 128)
        self.conv3, self.conv3_1 = _c(128, 256, s=2), _c(256, 256)
        self.conv4, self.conv4_1 = _c(256, 512, s=2), _c(512, 512)
        self.conv5, self.conv5_1 = _c(512, 512, s=2), _c(512, 512)
        self.conv6, self.conv6_1 = _c(512, 1024, s=2), _c(1024, 1024)
        self.deconv5, self.deconv4 = _dc(1024, 512), _dc(1026, 256)
        self.deconv3, self.deconv2 = _dc(770, 128), _dc(386, 64)
        for lvl, (ci, co) in zip(
            (5, 4, 3, 2), ((1026, 512), (770, 256), (386, 128), (194, 64))
        ):
            setattr(self, f"inter_conv{lvl}", _ic(ci, co))
        for lvl, ci in zip((6, 5, 4, 3, 2), (1024, 512, 256, 128, 64)):
            setattr(self, f"predict_flow{lvl}", _pf(ci))
        for lvl in (6, 5, 4, 3):
            setattr(self, f"upsampled_flow{lvl}_to_{lvl - 1}", _uf(True))

    def forward(self, x):
        c0 = self.conv0(x)
        c1 = self.conv1_1(self.conv1(c0))
        c2 = self.conv2_1(self.conv2(c1))
        c3 = self.conv3_1(self.conv3(c2))
        c4 = self.conv4_1(self.conv4(c3))
        c5 = self.conv5_1(self.conv5(c4))
        c6 = self.conv6_1(self.conv6(c5))
        f6 = self.predict_flow6(c6)
        cat5 = torch.cat([c5, self.deconv5(c6), self.upsampled_flow6_to_5(f6)], 1)
        f5 = self.predict_flow5(self.inter_conv5(cat5))
        cat4 = torch.cat([c4, self.deconv4(cat5), self.upsampled_flow5_to_4(f5)], 1)
        f4 = self.predict_flow4(self.inter_conv4(cat4))
        cat3 = torch.cat([c3, self.deconv3(cat4), self.upsampled_flow4_to_3(f4)], 1)
        f3 = self.predict_flow3(self.inter_conv3(cat3))
        cat2 = torch.cat([c2, self.deconv2(cat3), self.upsampled_flow3_to_2(f3)], 1)
        return self.predict_flow2(self.inter_conv2(cat2))


class TFlowNetFusion(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv0 = _c(11, 64)
        self.conv1, self.conv1_1 = _c(64, 64, s=2), _c(64, 128)
        self.conv2, self.conv2_1 = _c(128, 128, s=2), _c(128, 128)
        self.deconv1, self.deconv0 = _dc(128, 32), _dc(162, 16)
        self.inter_conv1, self.inter_conv0 = _ic(162, 32), _ic(82, 16)
        self.predict_flow2 = _pf(128)
        self.predict_flow1, self.predict_flow0 = _pf(32), _pf(16)
        self.upsampled_flow2_to_1 = _uf(True)
        self.upsampled_flow1_to_0 = _uf(True)

    def forward(self, x):
        c0 = self.conv0(x)
        c1 = self.conv1_1(self.conv1(c0))
        c2 = self.conv2_1(self.conv2(c1))
        f2 = self.predict_flow2(c2)
        cat1 = torch.cat([c1, self.deconv1(c2), self.upsampled_flow2_to_1(f2)], 1)
        f1 = self.predict_flow1(self.inter_conv1(cat1))
        cat0 = torch.cat([c0, self.deconv0(cat1), self.upsampled_flow1_to_0(f1)], 1)
        return self.predict_flow0(self.inter_conv0(cat0))


class TFlowNet2(tnn.Module):
    """Composite dataflow (models.py:96-161): C -> S1 -> S2 || SD -> Fusion."""

    def __init__(self, div_flow=20.0):
        super().__init__()
        self.div_flow = div_flow
        self.flownetc = TFlowNetC()
        self.flownets_1 = TFlowNetS()
        self.flownets_2 = TFlowNetS()
        self.flownets_d = TFlowNetSD()
        self.flownetfusion = TFlowNetFusion()

    @staticmethod
    def _up4b(x):
        return F.interpolate(x, scale_factor=4, mode="bilinear", align_corners=False)

    @staticmethod
    def _up4n(x):
        return F.interpolate(x, scale_factor=4, mode="nearest")

    def forward(self, x1, x2):
        mean = torch.stack([x1, x2], 2).reshape(x1.shape[:2] + (-1,)).mean(-1)
        mean = mean.reshape(mean.shape + (1, 1))
        x1, x2 = x1 - mean, x2 - mean
        x = torch.cat([x1, x2], 1)

        c_flow = self._up4b(self.flownetc(x) * self.div_flow)
        warped = _warp(x2, c_flow)
        cat1 = torch.cat([x, warped, c_flow / self.div_flow, _cnorm(x1 - warped)], 1)

        s1_flow = self._up4b(self.flownets_1(cat1) * self.div_flow)
        warped = _warp(x2, s1_flow)
        cat2 = torch.cat([x, warped, s1_flow / self.div_flow, _cnorm(x1 - warped)], 1)

        s2_flow = self._up4n(self.flownets_2(cat2) * self.div_flow)
        sd_flow = self._up4n(self.flownets_d(x) / self.div_flow)
        cat3 = torch.cat(
            [
                x1,
                sd_flow,
                s2_flow,
                _cnorm(sd_flow),
                _cnorm(s2_flow),
                _cnorm(x1 - _warp(x2, sd_flow)),
                _cnorm(x1 - _warp(x2, s2_flow)),
            ],
            1,
        )
        return self.flownetfusion(cat3)


def _convert(oracle, prefix, mapping):
    sd = {f"{prefix}.{k}": v.numpy() for k, v in oracle.state_dict().items()}
    tree = apply_mapping(sd, mapping)
    return {"params": tree["params"][prefix]}


# ------------------------------------------------------------------- tests


class TestBranchParity:
    def test_flownetc(self, rng):
        torch.manual_seed(10)
        oracle = TFlowNetC().eval()
        variables = _convert(oracle, "flownetc", flownet_c_mapping("flownetc"))
        x = rng.standard_normal((1, 6, 64, 128)).astype(np.float32) * 0.3
        with torch.no_grad():
            expected = oracle(torch.from_numpy(x)).numpy()
        (got,) = FlowNetC().apply(variables, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(to_nhwc(expected), np.asarray(got), atol=2e-4)

    def test_flownets(self, rng):
        torch.manual_seed(11)
        oracle = TFlowNetS().eval()
        variables = _convert(oracle, "flownets_1", flownet_s_mapping("flownets_1"))
        x = rng.standard_normal((1, 12, 64, 64)).astype(np.float32) * 0.3
        with torch.no_grad():
            expected = oracle(torch.from_numpy(x)).numpy()
        (got,) = FlowNetS().apply(variables, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(to_nhwc(expected), np.asarray(got), atol=2e-4)

    def test_flownetsd(self, rng):
        torch.manual_seed(12)
        oracle = TFlowNetSD().eval()
        variables = _convert(oracle, "flownets_d", flownet_sd_mapping("flownets_d"))
        x = rng.standard_normal((1, 6, 64, 64)).astype(np.float32) * 0.3
        with torch.no_grad():
            expected = oracle(torch.from_numpy(x)).numpy()
        (got,) = FlowNetSD().apply(variables, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(to_nhwc(expected), np.asarray(got), atol=2e-4)

    def test_flownetfusion(self, rng):
        torch.manual_seed(13)
        oracle = TFlowNetFusion().eval()
        variables = _convert(
            oracle, "flownetfusion", flownet_fusion_mapping("flownetfusion")
        )
        x = rng.standard_normal((1, 11, 64, 64)).astype(np.float32) * 0.3
        with torch.no_grad():
            expected = oracle(torch.from_numpy(x)).numpy()
        got = FlowNetFusion().apply(variables, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(to_nhwc(expected), np.asarray(got), atol=2e-4)


class TestCompositeParity:
    @pytest.fixture(scope="class")
    def oracle_and_params(self):
        torch.manual_seed(14)
        oracle = TFlowNet2().eval()
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
        variables = {"params": apply_mapping(sd, flownet2_mapping())["params"]}
        return oracle, variables

    def test_full_flownet2(self, oracle_and_params, rng):
        """End-to-end composite: every warp/channelnorm/upsample glue op."""
        oracle, variables = oracle_and_params
        im1 = rng.random((1, 3, 64, 64)).astype(np.float32)
        im2 = np.clip(
            im1 + rng.standard_normal(im1.shape).astype(np.float32) * 0.05, 0, 1
        )
        with torch.no_grad():
            expected = oracle(torch.from_numpy(im1), torch.from_numpy(im2)).numpy()
        got = FlowNet2().apply(
            variables, jnp.asarray(to_nhwc(im1)), jnp.asarray(to_nhwc(im2))
        )
        np.testing.assert_allclose(to_nhwc(expected), np.asarray(got), atol=5e-4)

    def test_wrapper_resize_and_conf(self, oracle_and_params, rng):
        """vid2vid FlowNet wrapper (flownet.py:43-58): //64 resize round trip,
        flow magnitude rescale by old_h/new_h, conf = (sum-sq err < 0.02)."""
        oracle, variables = oracle_and_params
        im1 = rng.random((1, 3, 96, 160)).astype(np.float32)
        im2 = np.clip(
            im1 + rng.standard_normal(im1.shape).astype(np.float32) * 0.05, 0, 1
        )
        with torch.no_grad():
            t1 = F.interpolate(
                torch.from_numpy(im1), size=(64, 128), mode="bilinear",
                align_corners=False,
            )
            t2 = F.interpolate(
                torch.from_numpy(im2), size=(64, 128), mode="bilinear",
                align_corners=False,
            )
            flow_small = oracle(t1, t2)
            conf_small = ((t1 - _warp(t2, flow_small)) ** 2).sum(1, keepdim=True)
            conf_small = (conf_small < 0.02).float()
            flow_t = (
                F.interpolate(
                    flow_small, size=(96, 160), mode="bilinear", align_corners=False
                )
                * (96 / 64)
            ).numpy()
            conf_t = F.interpolate(
                conf_small, size=(96, 160), mode="bilinear", align_corners=False
            ).numpy()

        est = FlowEstimator()
        flow_j, conf_j = est(
            variables, jnp.asarray(to_nhwc(im1)), jnp.asarray(to_nhwc(im2))
        )
        np.testing.assert_allclose(to_nhwc(flow_t), np.asarray(flow_j), atol=2e-3)
        # conf is a thresholded map resized bilinearly: compare away from the
        # (measure-zero but float-sensitive) threshold boundary
        diff = np.abs(to_nhwc(conf_t) - np.asarray(conf_j))
        assert (diff < 1e-3).mean() > 0.99
