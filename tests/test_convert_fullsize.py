"""Full-size checkpoint-conversion proof for label2city_1024_g1.

The published checkpoints are unreachable from this container (gdrive
egress blocked — see PARITY.md), so this test proves the conversion
INFRASTRUCTURE at the real published architecture sizes instead: it builds
reference-arch torch generators with reference state-dict names at the
exact label2city_1024_g1 shapes (reference: scripts/street/test_g1_1024.sh
— ngf 128, n_downsample_G 2, n_blocks 9, 3 spatial scales, fg, 35+1 input
channels x tG), `torch.save`s them as the published files would be, runs
the real `tools/convert_checkpoint` CLI (.pth -> mapping -> orbax), and
checks forward parity of the restored params against the torch oracles —
including the fg branch, which no other parity test covers.

When the real .pth files are obtained, the identical CLI invocation
converts them; this test is the proof that every shape and name matches.
"""

import os

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tests.test_torch_import import (
    TorchComposite,
    _RB,
    _bn,
    _down,
    _stem,
    _up,
    to_nhwc,
)
from vid2vid_tpu.nn.composite import CompositeGenerator, CompositeLocalGenerator, CompositeOut
from vid2vid_tpu.tools import convert_checkpoint

pytestmark = pytest.mark.slow  # multi-minute golden/oracle tier


def _warp_torch(im, flow):
    b, _, h, w = im.shape
    hor = torch.linspace(-1, 1, w).view(1, 1, 1, w).expand(b, 1, h, w)
    ver = torch.linspace(-1, 1, h).view(1, 1, h, 1).expand(b, 1, h, w)
    grid = torch.cat([hor, ver], 1)
    nf = torch.cat([flow[:, 0:1] / ((w - 1) / 2), flow[:, 1:2] / ((h - 1) / 2)], 1)
    return F.grid_sample(
        im, (grid + nf).permute(0, 2, 3, 1),
        mode="bilinear", padding_mode="border", align_corners=True,
    )


class TorchCompositeFG(TorchComposite):
    """Reference CompositeGenerator incl. the fg branch
    (reference: models/networks.py:117-232, indv_* modules)."""

    def __init__(self, in_nc, prev_nc, ngf, nd, nb, norm=_bn):
        super().__init__(in_nc, prev_nc, ngf, nd, nb, norm=norm)
        ngf_i = ngf // 2 if nd > 2 else ngf
        down = _stem(in_nc, ngf_i, norm)
        for i in range(nd):
            down += _down(ngf_i * 2**i, ngf_i * 2 ** (i + 1), norm)
        self.indv_down = tnn.Sequential(*down)
        ch = ngf_i * 2**nd
        self.indv_res = tnn.Sequential(*[_RB(ch, norm) for _ in range(nb)])
        ups = []
        for i in range(nd):
            ups += _up(ngf_i * 2 ** (nd - i), ngf_i * 2 ** (nd - i - 1), norm)
        self.indv_up = tnn.Sequential(*ups)
        self.indv_final = tnn.Sequential(
            tnn.ReflectionPad2d(3), tnn.Conv2d(ngf_i, 3, 7), tnn.Tanh()
        )

    def forward(self, labels, prev, mask):
        final, flow, weight, raw = super().forward(labels, prev)
        img_fg = self.indv_final(self.indv_up(self.indv_res(self.indv_down(labels))))
        m = mask.expand_as(raw)
        return img_fg * m + final * (1 - m), flow, weight, img_fg * m + raw * (1 - m)


class TorchCompositeLocalFG(tnn.Module):
    """Reference CompositeLocalGenerator with fg branch
    (reference: models/networks.py:234-325)."""

    def __init__(self, in_nc, prev_nc, ngf, nbl, scale=1, norm=_bn):
        super().__init__()
        self.scale = scale
        ngf_i = ngf  # n_downsampling <= 2 in the g1_1024 registry

        def downs(cin, width):
            return tnn.Sequential(*(_stem(cin, width, norm) + _down(width, width * 2, norm)))

        self.model_down_seg = downs(in_nc, ngf)
        self.model_down_img = downs(prev_nc, ngf)
        for name in ("model_up_img", "model_up_flow"):
            layers = [_RB(ngf * 2, norm) for _ in range(nbl)] + _up(ngf * 2, ngf, norm)
            setattr(self, name, tnn.Sequential(*layers))
        self.model_final_img = tnn.Sequential(
            tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, 3, 7), tnn.Tanh()
        )
        self.model_final_flow = tnn.Sequential(
            tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, 2, 7)
        )
        self.model_final_w = tnn.Sequential(
            tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, 1, 7), tnn.Sigmoid()
        )
        self.indv_down = downs(in_nc, ngf_i)
        self.indv_up = tnn.Sequential(
            *([_RB(ngf_i * 2, norm) for _ in range(nbl)] + _up(ngf_i * 2, ngf_i, norm))
        )
        self.indv_final = tnn.Sequential(
            tnn.ReflectionPad2d(3), tnn.Conv2d(ngf_i, 3, 7), tnn.Tanh()
        )

    def forward(self, labels, prev, mask, img_fc, flow_fc, fg_fc):
        d = self.model_down_seg(labels) + self.model_down_img(prev)
        img_feat = self.model_up_img(d + img_fc)
        raw = self.model_final_img(img_feat)
        flow_feat = self.model_up_flow(d + flow_fc)
        flow = self.model_final_flow(flow_feat) * (20 * 2**self.scale)
        weight = self.model_final_w(flow_feat)
        warped = _warp_torch(prev[:, -3:], flow)
        final = raw * weight + warped * (1 - weight)
        img_fg = self.indv_final(self.indv_up(self.indv_down(labels) + fg_fc))
        m = mask.expand_as(raw)
        return img_fg * m + final * (1 - m), flow, weight, img_fg * m + raw * (1 - m)


@pytest.fixture(scope="module")
def rng_m():
    return np.random.default_rng(7)


class TestFullSizeG0:
    def test_g0_convert_cli_and_fg_parity(self, tmp_path, rng_m):
        """label2city_1024_g1 netG0 at real channel widths through the real
        convert CLI; forward parity incl. the fg alpha composite."""
        torch.manual_seed(100)
        in_nc, prev_nc, ngf, nd, nb = 36 * 3, 6, 128, 2, 9
        oracle = TorchCompositeFG(in_nc, prev_nc, ngf, nd, nb).eval()
        pth = tmp_path / "latest_net_G0.pth"
        torch.save(oracle.state_dict(), pth)
        out = tmp_path / "state" / "G0"
        convert_checkpoint.main([
            "--kind", "composite", "--pth", str(pth), "--out", str(out),
            "--n-downsampling", "2", "--n-blocks", "9", "--norm", "batch",
            "--fg",
        ])

        import orbax.checkpoint as ocp

        variables = ocp.PyTreeCheckpointer().restore(str(out))
        model = CompositeGenerator(
            ngf=ngf, n_downsampling=nd, n_blocks=nb, norm="batch", use_fg=True
        )
        h, w = 64, 128
        labels = rng_m.standard_normal((1, in_nc, h, w)).astype(np.float32) * 0.2
        prev = rng_m.standard_normal((1, prev_nc, h, w)).astype(np.float32) * 0.2
        mask = (rng_m.random((1, 1, h, w)) > 0.5).astype(np.float32)
        with torch.no_grad():
            t_final, t_flow, t_w, t_raw = oracle(
                torch.from_numpy(labels), torch.from_numpy(prev),
                torch.from_numpy(mask),
            )
        got = jax.jit(model.apply)(
            variables, jnp.asarray(to_nhwc(labels)), jnp.asarray(to_nhwc(prev)),
            jnp.asarray(to_nhwc(mask)),
        )
        np.testing.assert_allclose(
            to_nhwc(t_raw.numpy()), np.asarray(got.img_raw), atol=2e-3
        )
        np.testing.assert_allclose(
            to_nhwc(t_flow.numpy()), np.asarray(got.flow), atol=2e-2
        )
        np.testing.assert_allclose(
            to_nhwc(t_final.numpy()), np.asarray(got.img_final), atol=2e-3
        )
        # full-size sanity: the converted tree carries the published widths
        stems = variables["params"]["stems"]
        assert stems["down_seg_kernel"].shape == (7, 7, in_nc, ngf)
        assert stems["fg_kernel"].shape == (7, 7, in_nc, ngf)

    def test_g1_convert_cli_and_fg_parity(self, tmp_path, rng_m):
        """label2city_1024_g1 netG1 enhancer (compositeLocal ngf 64, fg)
        through the convert CLI, with coarse-feature injection."""
        torch.manual_seed(101)
        in_nc, prev_nc, ngf, nbl = 36 * 3, 6, 64, 3
        oracle = TorchCompositeLocalFG(in_nc, prev_nc, ngf, nbl, scale=1).eval()
        pth = tmp_path / "latest_net_G1.pth"
        torch.save(oracle.state_dict(), pth)
        out = tmp_path / "state" / "G1"
        convert_checkpoint.main([
            "--kind", "composite_local", "--pth", str(pth), "--out", str(out),
            "--n-blocks-local", "3", "--norm", "batch", "--fg", "--scale", "1",
        ])

        import orbax.checkpoint as ocp

        variables = ocp.PyTreeCheckpointer().restore(str(out))
        model = CompositeLocalGenerator(
            ngf=ngf, n_blocks_local=nbl, n_downsample_g=2, scale=1,
            norm="batch", use_fg=True,
        )
        h, w = 64, 128
        labels = rng_m.standard_normal((1, in_nc, h, w)).astype(np.float32) * 0.2
        prev = rng_m.standard_normal((1, prev_nc, h, w)).astype(np.float32) * 0.2
        mask = (rng_m.random((1, 1, h, w)) > 0.5).astype(np.float32)
        feats = [
            rng_m.standard_normal((1, ngf * 2, h // 2, w // 2)).astype(np.float32)
            * 0.1
            for _ in range(3)
        ]
        with torch.no_grad():
            t_final, t_flow, t_w, t_raw = oracle(
                torch.from_numpy(labels), torch.from_numpy(prev),
                torch.from_numpy(mask), *[torch.from_numpy(f) for f in feats],
            )
        coarse = CompositeOut(
            img_final=None, flow=None, weight=None, img_raw=None,
            img_feat=jnp.asarray(to_nhwc(feats[0])),
            flow_feat=jnp.asarray(to_nhwc(feats[1])),
            fg_feat=jnp.asarray(to_nhwc(feats[2])),
        )
        got = jax.jit(model.apply)(
            variables, jnp.asarray(to_nhwc(labels)), jnp.asarray(to_nhwc(prev)),
            coarse, jnp.asarray(to_nhwc(mask)),
        )
        np.testing.assert_allclose(
            to_nhwc(t_raw.numpy()), np.asarray(got.img_raw), atol=2e-3
        )
        np.testing.assert_allclose(
            to_nhwc(t_flow.numpy()), np.asarray(got.flow), atol=5e-2
        )
        np.testing.assert_allclose(
            to_nhwc(t_final.numpy()), np.asarray(got.img_final), atol=2e-3
        )
