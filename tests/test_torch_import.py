"""Checkpoint-conversion parity tests.

Builds minimal torch oracles whose parameter names follow the reference's
state-dict naming scheme (so the published checkpoints load identically),
converts their state dicts with torch_import, and checks numerical parity
of the full forward pass. The oracles are test fixtures, not product code.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vid2vid_tpu.nn.composite import CompositeGenerator
from vid2vid_tpu.nn.discriminator import NLayerDiscriminator
from vid2vid_tpu.nn.pix2pixhd import Encoder, GlobalGenerator, GlobalWithFeatures
from vid2vid_tpu.utils.torch_import import (
    apply_mapping,
    composite_generator_mapping,
    encoder_mapping,
    global_generator_mapping,
    global_with_features_mapping,
    nlayer_discriminator_mapping,
    vgg19_mapping,
)


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _bn(c):
    return tnn.BatchNorm2d(c)


def _in(c):
    return tnn.InstanceNorm2d(c, affine=False, track_running_stats=True)


class _RB(tnn.Module):
    """Residual block producing reference-style conv_block.{i} names."""

    def __init__(self, c, norm):
        super().__init__()
        self.conv_block = tnn.Sequential(
            tnn.ReflectionPad2d(1), tnn.Conv2d(c, c, 3), norm(c), tnn.ReLU(True),
            tnn.ReflectionPad2d(1), tnn.Conv2d(c, c, 3), norm(c),
        )

    def forward(self, x):
        return x + self.conv_block(x)


def _stem(cin, cout, norm):
    return [
        tnn.ReflectionPad2d(3), tnn.Conv2d(cin, cout, 7), norm(cout),
        tnn.ReLU(True),
    ]


def _down(cin, cout, norm):
    return [tnn.Conv2d(cin, cout, 3, 2, 1), norm(cout), tnn.ReLU(True)]


def _up(cin, cout, norm):
    return [
        tnn.ConvTranspose2d(cin, cout, 3, 2, 1, output_padding=1), norm(cout),
        tnn.ReLU(True),
    ]


class TorchComposite(tnn.Module):
    """Oracle with reference state-dict names (model_down_seg.* etc.)."""

    def __init__(self, in_nc, prev_nc, ngf=8, nd=2, nb=4, out_nc=3, norm=_bn):
        super().__init__()
        n_res_down, n_res_up = nb - nb // 2, nb // 2
        ch = ngf * 2**nd

        def trunk(cin):
            layers = _stem(cin, ngf, norm)
            for i in range(nd):
                layers += _down(ngf * 2**i, ngf * 2 ** (i + 1), norm)
            layers += [_RB(ch, norm) for _ in range(n_res_down)]
            return tnn.Sequential(*layers)

        self.model_down_seg = trunk(in_nc)
        self.model_down_img = trunk(prev_nc)
        self.model_res_img = tnn.Sequential(*[_RB(ch, norm) for _ in range(n_res_up)])
        ups = []
        for i in range(nd):
            ups += _up(ngf * 2 ** (nd - i), ngf * 2 ** (nd - i - 1), norm)
        self.model_up_img = tnn.Sequential(*ups)
        self.model_final_img = tnn.Sequential(
            tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, out_nc, 7), tnn.Tanh()
        )
        self.model_res_flow = tnn.Sequential(*[_RB(ch, norm) for _ in range(n_res_up)])
        ups = []
        for i in range(nd):
            ups += _up(ngf * 2 ** (nd - i), ngf * 2 ** (nd - i - 1), norm)
        self.model_up_flow = tnn.Sequential(*ups)
        self.model_final_flow = tnn.Sequential(
            tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, 2, 7)
        )
        self.model_final_w = tnn.Sequential(
            tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, 1, 7), tnn.Sigmoid()
        )

    def forward(self, labels, prev):
        d = self.model_down_seg(labels) + self.model_down_img(prev)
        img_feat = self.model_up_img(self.model_res_img(d))
        raw = self.model_final_img(img_feat)
        flow_feat = self.model_up_flow(self.model_res_flow(d))
        flow = self.model_final_flow(flow_feat) * 20
        weight = self.model_final_w(flow_feat)
        # warp prev[-3:] by flow (align_corners=True border grid_sample)
        b, _, h, w = prev.shape
        hor = torch.linspace(-1, 1, w).view(1, 1, 1, w).expand(b, 1, h, w)
        ver = torch.linspace(-1, 1, h).view(1, 1, h, 1).expand(b, 1, h, w)
        grid = torch.cat([hor, ver], 1)
        norm_flow = torch.cat(
            [flow[:, 0:1] / ((w - 1) / 2), flow[:, 1:2] / ((h - 1) / 2)], 1
        )
        warped = F.grid_sample(
            prev[:, -3:], (grid + norm_flow).permute(0, 2, 3, 1),
            mode="bilinear", padding_mode="border", align_corners=True,
        )
        final = raw * weight + warped * (1 - weight)
        return final, flow, weight, raw


class TestCompositeImport:
    def test_forward_parity(self, rng):
        torch.manual_seed(0)
        in_nc, prev_nc, ngf, nd, nb = 9, 6, 8, 2, 4
        oracle = TorchComposite(in_nc, prev_nc, ngf, nd, nb).eval()
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}

        mapping = composite_generator_mapping(nd, nb, "batch")
        variables = apply_mapping(sd, mapping)

        model = CompositeGenerator(
            ngf=ngf, n_downsampling=nd, n_blocks=nb, norm="batch"
        )
        labels = rng.standard_normal((1, 9, 32, 32)).astype(np.float32) * 0.5
        prev = rng.standard_normal((1, 6, 32, 32)).astype(np.float32) * 0.5

        with torch.no_grad():
            t_final, t_flow, t_w, t_raw = oracle(
                torch.from_numpy(labels), torch.from_numpy(prev)
            )
        out = model.apply(
            variables, jnp.asarray(to_nhwc(labels)), jnp.asarray(to_nhwc(prev))
        )
        np.testing.assert_allclose(
            to_nhwc(t_raw.numpy()), np.asarray(out.img_raw), atol=2e-4
        )
        np.testing.assert_allclose(
            to_nhwc(t_flow.numpy()), np.asarray(out.flow), atol=2e-3
        )
        np.testing.assert_allclose(
            to_nhwc(t_w.numpy()), np.asarray(out.weight), atol=2e-4
        )
        np.testing.assert_allclose(
            to_nhwc(t_final.numpy()), np.asarray(out.img_final), atol=2e-3
        )


class TorchGlobal(tnn.Module):
    def __init__(self, in_nc, out_nc=3, ngf=8, nd=2, nb=2, norm=_in):
        super().__init__()
        layers = _stem(in_nc, ngf, norm)
        for i in range(nd):
            layers += _down(ngf * 2**i, ngf * 2 ** (i + 1), norm)
        layers += [_RB(ngf * 2**nd, norm) for _ in range(nb)]
        for i in range(nd):
            layers += _up(ngf * 2 ** (nd - i), ngf * 2 ** (nd - i - 1), norm)
        layers += [tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, out_nc, 7), tnn.Tanh()]
        self.model = tnn.Sequential(*layers)

    def forward(self, x):
        return self.model(x)


class TestGlobalImport:
    def test_forward_parity_instance_norm_eval(self, rng):
        torch.manual_seed(1)
        oracle = TorchGlobal(5, ngf=8, nd=2, nb=2)
        # accumulate nontrivial running stats, then eval
        oracle.train()
        with torch.no_grad():
            for _ in range(3):
                oracle(torch.randn(2, 5, 32, 32))
        oracle.eval()
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
        sd = {k: v for k, v in sd.items() if "num_batches" not in k}

        variables = apply_mapping(sd, global_generator_mapping(2, 2, "instance"))
        model = GlobalGenerator(ngf=8, n_downsampling=2, n_blocks=2, norm="instance")
        x = rng.standard_normal((1, 5, 32, 32)).astype(np.float32)
        with torch.no_grad():
            expected = oracle(torch.from_numpy(x)).numpy()
        got = model.apply(variables, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(to_nhwc(expected), np.asarray(got), atol=2e-4)


class TorchNLayerD(tnn.Module):
    def __init__(self, in_nc, ndf=8, n_layers=3, norm=_bn):
        super().__init__()
        seqs = [[tnn.Conv2d(in_nc, ndf, 4, 2, 2), tnn.LeakyReLU(0.2, True)]]
        nf = ndf
        for n in range(1, n_layers):
            nf_prev, nf = nf, min(nf * 2, 512)
            seqs.append(
                [tnn.Conv2d(nf_prev, nf, 4, 2, 2), norm(nf), tnn.LeakyReLU(0.2, True)]
            )
        nf_prev, nf = nf, min(nf * 2, 512)
        seqs.append(
            [tnn.Conv2d(nf_prev, nf, 4, 1, 2), norm(nf), tnn.LeakyReLU(0.2, True)]
        )
        seqs.append([tnn.Conv2d(nf, 1, 4, 1, 2)])
        for n, seq in enumerate(seqs):
            setattr(self, f"model{n}", tnn.Sequential(*seq))
        self.n = len(seqs)

    def forward(self, x):
        feats = []
        for i in range(self.n):
            x = getattr(self, f"model{i}")(x)
            feats.append(x)
        return feats


class TestDiscriminatorImport:
    def test_forward_parity(self, rng):
        torch.manual_seed(2)
        oracle = TorchNLayerD(6, ndf=8, n_layers=3).eval()
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
        sd = {k: v for k, v in sd.items() if "num_batches" not in k}
        variables = apply_mapping(sd, nlayer_discriminator_mapping(3, "batch"))
        model = NLayerDiscriminator(ndf=8, n_layers=3, get_interm_feat=True)
        x = rng.standard_normal((1, 6, 32, 32)).astype(np.float32)
        with torch.no_grad():
            expected = oracle(torch.from_numpy(x))
        got = model.apply(variables, jnp.asarray(to_nhwc(x)))
        assert len(got) == len(expected)
        for e, g in zip(expected, got):
            np.testing.assert_allclose(
                to_nhwc(e.numpy()), np.asarray(g), atol=2e-4
            )


class TestVggImport:
    def test_mapping_covers_all_convs(self):
        mapping = vgg19_mapping()
        assert len(mapping) == 26  # 13 convs x (weight, bias)
        keys = {m[0] for m in mapping}
        assert "features.0.weight" in keys and "features.28.bias" in keys


class TorchGlobalWithZ(tnn.Module):
    """Reference Global_with_z (the edge2face single-image G,
    models/networks.py:421-468): z concatenated to the input, to the
    resblock stack (downsampled), to the first upsample, and to the head."""

    def __init__(self, in_nc, nz, out_nc=3, ngf=8, nd=2, nb=2, norm=_in):
        super().__init__()
        self.nd = nd
        down = _stem(in_nc + nz, ngf, norm)
        for i in range(nd):
            down += _down(ngf * 2**i, ngf * 2 ** (i + 1), norm)
        self.model_downsample = tnn.Sequential(*down)
        ch = ngf * 2**nd
        self.model_resnet = tnn.Sequential(
            *[_RB(ch + nz, norm) for _ in range(nb)]
        )
        ups = []
        for i in range(nd):
            cin = ngf * 2 ** (nd - i) + (2 * nz if i == 0 else 0)
            ups += [
                tnn.ConvTranspose2d(
                    cin, ngf * 2 ** (nd - i - 1), 3, 2, 1, output_padding=1
                ),
                norm(ngf * 2 ** (nd - i - 1)),
                tnn.ReLU(True),
            ]
        self.model_upsample = tnn.Sequential(*ups)
        self.model_upsample_conv = tnn.Sequential(
            tnn.ReflectionPad2d(3), tnn.Conv2d(ngf + nz, out_nc, 7), tnn.Tanh()
        )
        self.downsample = tnn.AvgPool2d(3, 2, 1, count_include_pad=False)

    def forward(self, x, z):
        zd = z
        for _ in range(self.nd):
            zd = self.downsample(zd)
        d = self.model_downsample(torch.cat([x, z], 1))
        r = self.model_resnet(torch.cat([d, zd], 1))
        u = self.model_upsample(torch.cat([r, zd], 1))
        return self.model_upsample_conv(torch.cat([u, z], 1))


class TorchEncoder(tnn.Module):
    """Reference Encoder netE (models/networks.py:595-632): conv U-stack
    + instance-wise average pooling."""

    def __init__(self, in_nc, out_nc, ngf=4, nd=2, norm=_in):
        super().__init__()
        self.output_nc = out_nc
        layers = _stem(in_nc, ngf, norm)
        for i in range(nd):
            layers += _down(ngf * 2**i, ngf * 2 ** (i + 1), norm)
        for i in range(nd):
            layers += _up(ngf * 2 ** (nd - i), ngf * 2 ** (nd - i - 1), norm)
        layers += [tnn.ReflectionPad2d(3), tnn.Conv2d(ngf, out_nc, 7), tnn.Tanh()]
        self.model = tnn.Sequential(*layers)

    def forward(self, x, inst):
        out = self.model(x)
        mean = out.clone()
        for b in range(x.size(0)):
            for i in np.unique(inst[b].numpy().astype(int)):
                m = inst[b : b + 1] == int(i)
                for j in range(self.output_nc):
                    vals = out[b, j][m[0, 0]]
                    mean[b, j][m[0, 0]] = vals.mean()
        return mean


class TestGlobalWithFeaturesImport:
    def test_forward_parity(self, rng):
        """edge2face single-G: converted Global_with_z forward == torch
        (reference: vid2vid_model_G.py:279-283 builds it with instance
        norm and feat_num 16; shrunk dims here)."""
        torch.manual_seed(3)
        nz = 4
        oracle = TorchGlobalWithZ(5, nz, ngf=8, nd=2, nb=2)
        oracle.train()
        with torch.no_grad():
            for _ in range(3):
                oracle(torch.randn(2, 5, 32, 32), torch.randn(2, nz, 32, 32))
        oracle.eval()
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
        sd = {k: v for k, v in sd.items() if "num_batches" not in k}

        variables = apply_mapping(sd, global_with_features_mapping(2, 2, "instance"))
        model = GlobalWithFeatures(
            feat_num=nz, ngf=8, n_downsampling=2, n_blocks=2, norm="instance"
        )
        x = rng.standard_normal((1, 5, 32, 32)).astype(np.float32)
        z = rng.standard_normal((1, nz, 32, 32)).astype(np.float32)
        with torch.no_grad():
            expected = oracle(torch.from_numpy(x), torch.from_numpy(z)).numpy()
        got = model.apply(
            variables, jnp.asarray(to_nhwc(x)), jnp.asarray(to_nhwc(z))
        )
        np.testing.assert_allclose(to_nhwc(expected), np.asarray(got), atol=2e-4)


class TestEncoderImport:
    def test_forward_parity(self, rng):
        """netE: converted Encoder forward (incl. instance-average) == torch."""
        torch.manual_seed(4)
        oracle = TorchEncoder(3, 4, ngf=4, nd=2)
        oracle.eval()
        sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
        sd = {k: v for k, v in sd.items() if "num_batches" not in k}

        variables = apply_mapping(sd, encoder_mapping(2, "instance"))
        model = Encoder(output_nc=4, ngf=4, n_downsampling=2, norm="instance")
        x = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
        inst = np.zeros((1, 1, 32, 32), np.int32)
        inst[:, :, 8:20, 4:16] = 3
        inst[:, :, 24:, 24:] = 7
        with torch.no_grad():
            expected = oracle(
                torch.from_numpy(x), torch.from_numpy(inst)
            ).numpy()
        got = model.apply(
            variables, jnp.asarray(to_nhwc(x)), jnp.asarray(inst[:, 0])
        )
        np.testing.assert_allclose(to_nhwc(expected), np.asarray(got), atol=2e-4)
