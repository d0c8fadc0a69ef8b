"""Network zoo tests: layer parity vs torch, module shapes, blend math."""

import flax.linen
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from vid2vid_tpu.nn import (
    CompositeGenerator,
    CompositeLocalGenerator,
    Conv,
    ConvTranspose,
    Encoder,
    GlobalGenerator,
    GlobalWithFeatures,
    LocalEnhancer,
    MultiscaleDiscriminator,
    NLayerDiscriminator,
    Norm,
    Vgg19Features,
    instance_average,
)


def to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def to_nchw(x):
    return np.transpose(x, (0, 3, 1, 2))


class TestLayers:
    def test_conv_matches_torch(self, rng):
        x = rng.standard_normal((2, 4, 10, 12)).astype(np.float32)
        w = rng.standard_normal((6, 4, 3, 3)).astype(np.float32)
        b = rng.standard_normal(6).astype(np.float32)
        expected = F.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=2, padding=1,
        ).numpy()

        m = Conv(6, kernel=3, stride=2, pad=1)
        params = {
            "params": {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "bias": jnp.asarray(b),
            }
        }
        got = m.apply(params, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(to_nchw(np.asarray(got)), expected, atol=1e-4)

    def test_conv_reflect_matches_torch(self, rng):
        x = rng.standard_normal((1, 3, 9, 11)).astype(np.float32)
        w = rng.standard_normal((5, 3, 7, 7)).astype(np.float32)
        b = np.zeros(5, np.float32)
        xp = F.pad(torch.from_numpy(x), (3, 3, 3, 3), mode="reflect")
        expected = F.conv2d(xp, torch.from_numpy(w), torch.from_numpy(b)).numpy()

        m = Conv(5, kernel=7, pad=3, pad_mode="reflect")
        params = {
            "params": {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                "bias": jnp.asarray(b),
            }
        }
        got = m.apply(params, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(to_nchw(np.asarray(got)), expected, atol=1e-4)

    def test_conv_transpose_matches_torch(self, rng):
        """ConvTranspose2d(3, stride=2, padding=1, output_padding=1) parity."""
        x = rng.standard_normal((2, 4, 7, 9)).astype(np.float32)
        w = rng.standard_normal((4, 6, 3, 3)).astype(np.float32)  # (in, out, kh, kw)
        b = rng.standard_normal(6).astype(np.float32)
        expected = F.conv_transpose2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            stride=2, padding=1, output_padding=1,
        ).numpy()
        assert expected.shape[-2:] == (14, 18)

        m = ConvTranspose(6)
        # torch convtranspose weight (I, O, H, W) -> ours (H, W, I, O)
        params = {
            "params": {
                "kernel": jnp.asarray(np.transpose(w, (2, 3, 0, 1))),
                "bias": jnp.asarray(b),
            }
        }
        got = m.apply(params, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(to_nchw(np.asarray(got)), expected, atol=1e-4)

    def test_batchnorm_train_eval_matches_torch(self, rng):
        x = rng.standard_normal((4, 3, 6, 6)).astype(np.float32)
        tbn = torch.nn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
        tbn.weight.data = torch.from_numpy(
            rng.standard_normal(3).astype(np.float32)
        )
        tbn.bias.data = torch.from_numpy(rng.standard_normal(3).astype(np.float32))
        tbn.train()
        expected_train = tbn(torch.from_numpy(x)).detach().numpy()
        tbn.eval()
        expected_eval = tbn(torch.from_numpy(x)).detach().numpy()

        m = Norm("batch")
        variables = {
            "params": {
                "BatchNorm_0": {
                    "scale": jnp.asarray(tbn.weight.detach().numpy()),
                    "bias": jnp.asarray(tbn.bias.detach().numpy()),
                }
            },
            "batch_stats": {
                "BatchNorm_0": {
                    "mean": jnp.zeros(3),
                    "var": jnp.ones(3),
                }
            },
        }
        got_train, new_vars = m.apply(
            variables, jnp.asarray(to_nhwc(x)), train=True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(
            to_nchw(np.asarray(got_train)), expected_train, atol=1e-4
        )
        # running stats after one train step
        np.testing.assert_allclose(
            np.asarray(new_vars["batch_stats"]["BatchNorm_0"]["mean"]),
            tbn.running_mean.numpy(),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(new_vars["batch_stats"]["BatchNorm_0"]["var"]),
            tbn.running_var.numpy(),
            atol=1e-4,
        )
        got_eval = m.apply(
            {"params": variables["params"], "batch_stats": new_vars["batch_stats"]},
            jnp.asarray(to_nhwc(x)),
            train=False,
        )
        np.testing.assert_allclose(
            to_nchw(np.asarray(got_eval)), expected_eval, atol=1e-4
        )

    def test_instancenorm_matches_torch(self, rng):
        x = rng.standard_normal((2, 3, 5, 7)).astype(np.float32)
        tin = torch.nn.InstanceNorm2d(3, affine=False, track_running_stats=True)
        tin.train()
        expected_train = tin(torch.from_numpy(x)).detach().numpy()
        tin.eval()
        expected_eval = tin(torch.from_numpy(x)).detach().numpy()

        m = Norm("instance")
        variables = {
            "batch_stats": {
                "InstanceNorm_0": {"mean": jnp.zeros(3), "var": jnp.ones(3)}
            }
        }
        got_train, new_vars = m.apply(
            variables, jnp.asarray(to_nhwc(x)), train=True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(
            to_nchw(np.asarray(got_train)), expected_train, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(new_vars["batch_stats"]["InstanceNorm_0"]["mean"]),
            tin.running_mean.numpy(),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(new_vars["batch_stats"]["InstanceNorm_0"]["var"]),
            tin.running_var.numpy(),
            atol=1e-4,
        )
        got_eval = m.apply(
            {"batch_stats": new_vars["batch_stats"]},
            jnp.asarray(to_nhwc(x)),
            train=False,
        )
        np.testing.assert_allclose(
            to_nchw(np.asarray(got_eval)), expected_eval, atol=1e-4
        )


class TestComposite:
    def _make(self, **kw):
        defaults = dict(ngf=8, n_downsampling=2, n_blocks=4, norm="batch")
        defaults.update(kw)
        return CompositeGenerator(**defaults)

    def test_forward_shapes(self, rng):
        m = self._make()
        labels = jnp.asarray(
            rng.standard_normal((1, 32, 32, 9)).astype(np.float32)
        )  # tG=3, 3ch labels
        prev = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
        variables = m.init(jax.random.key(0), labels, prev)
        out = m.apply(variables, labels, prev)
        assert out.img_final.shape == (1, 32, 32, 3)
        assert out.flow.shape == (1, 32, 32, 2)
        assert out.weight.shape == (1, 32, 32, 1)
        assert out.img_raw.shape == (1, 32, 32, 3)
        assert out.img_feat.shape == (1, 32, 32, 8)
        assert out.flow_feat.shape == (1, 32, 32, 8)

    def test_blend_math(self, rng):
        """img_final == raw*w + warp(prev[-3:], flow)*(1-w)."""
        from vid2vid_tpu.ops.warp import flow_warp

        m = self._make()
        labels = jnp.asarray(rng.standard_normal((1, 16, 16, 9)).astype(np.float32))
        prev = jnp.asarray(rng.standard_normal((1, 16, 16, 6)).astype(np.float32))
        variables = m.init(jax.random.key(1), labels, prev)
        out = m.apply(variables, labels, prev)
        warped = flow_warp(prev[..., -3:], out.flow)
        expected = out.img_raw * out.weight + warped * (1 - out.weight)
        np.testing.assert_allclose(
            np.asarray(out.img_final), np.asarray(expected), atol=1e-5
        )

    def test_use_raw_only(self, rng):
        m = self._make()
        labels = jnp.asarray(rng.standard_normal((1, 16, 16, 9)).astype(np.float32))
        prev = jnp.zeros((1, 16, 16, 6))
        variables = m.init(jax.random.key(2), labels, prev)
        out = m.apply(variables, labels, prev, use_raw_only=True)
        np.testing.assert_array_equal(
            np.asarray(out.img_final), np.asarray(out.img_raw)
        )

    def test_fg_composite(self, rng):
        m = self._make(use_fg=True, n_downsampling=3)
        labels = jnp.asarray(rng.standard_normal((1, 32, 32, 9)).astype(np.float32))
        prev = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
        mask = jnp.ones((1, 32, 32, 1))
        variables = m.init(jax.random.key(3), labels, prev, mask)
        out = m.apply(variables, labels, prev, mask)
        assert out.fg_feat is not None
        # with mask==1 everywhere, final == fg image -> bounded by tanh
        assert np.abs(np.asarray(out.img_final)).max() <= 1.0

    def test_local_enhancer_consumes_coarse(self, rng):
        coarse_m = self._make(ngf=16, n_downsampling=1, n_blocks=2)
        labels_c = jnp.asarray(rng.standard_normal((1, 16, 16, 9)).astype(np.float32))
        prev_c = jnp.asarray(rng.standard_normal((1, 16, 16, 6)).astype(np.float32))
        cvars = coarse_m.init(jax.random.key(4), labels_c, prev_c)
        coarse_out = coarse_m.apply(cvars, labels_c, prev_c)

        local = CompositeLocalGenerator(ngf=8, n_blocks_local=2, scale=1, norm="batch")
        labels_f = jnp.asarray(rng.standard_normal((1, 32, 32, 9)).astype(np.float32))
        prev_f = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
        lvars = local.init(jax.random.key(5), labels_f, prev_f, coarse_out)
        out = local.apply(lvars, labels_f, prev_f, coarse_out)
        assert out.img_final.shape == (1, 32, 32, 3)
        assert out.img_feat.shape == (1, 32, 32, 8)


class TestFusedResblocks:
    """Eval-mode Pallas fused-epilogue resblocks == the plain XLA path.

    On CPU the fused branch runs the identical kernel body in interpret
    mode, so this exercises the real epilogue math (norm folded to affine,
    relu, residual), not a stand-in.
    """

    def _vars_with_stats(self, m, rng, x):
        variables = m.init(jax.random.key(0), x)
        # nontrivial running stats so the affine fold is load-bearing
        stats = jax.tree.map(
            lambda v: jnp.asarray(
                (0.5 + 0.5 * rng.random(v.shape)).astype(np.float32)
            ),
            variables["batch_stats"],
        )
        return {**variables, "batch_stats": stats}

    @pytest.mark.parametrize("norm", ["batch", "instance"])
    def test_fused_respair_matches_plain(self, rng, norm):
        from vid2vid_tpu.nn.composite import _FusedResPair

        x = jnp.asarray(
            rng.standard_normal((1, 16, 64, 256)).astype(np.float32)
        )
        plain = _FusedResPair(128, norm, fuse=False)
        fused = _FusedResPair(128, norm, fuse=True)
        variables = self._vars_with_stats(plain, rng, x)

        want = plain.apply(variables, x, train=False)
        got = fused.apply(variables, x, train=False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-4
        )
        # training must take the plain path regardless of the flag
        t_want, _ = plain.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        t_got, _ = fused.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_want), atol=1e-6)

    def test_unfusable_width_falls_back(self, rng):
        from vid2vid_tpu.nn.composite import _FusedResPair

        x = jnp.asarray(rng.standard_normal((1, 16, 64, 16)).astype(np.float32))
        fused = _FusedResPair(8, "batch", fuse=True)  # 2c=16, not 128-aligned
        variables = fused.init(jax.random.key(0), x)
        out = fused.apply(variables, x, train=False)
        assert out.shape == x.shape

    def test_composite_generator_fused_matches(self, rng):
        """CompositeGenerator(fuse_res=True) == plain at a fusable width.

        ngf=32 / 2 downsamples puts the trunk resblocks at 32x32x128 —
        128-aligned and tileable, so the Pallas path actually engages
        (interpret mode on CPU)."""
        m0 = CompositeGenerator(ngf=32, n_downsampling=2, n_blocks=2, norm="batch")
        m1 = CompositeGenerator(
            ngf=32, n_downsampling=2, n_blocks=2, norm="batch", fuse_res=True
        )
        labels = jnp.asarray(
            rng.standard_normal((1, 128, 128, 9)).astype(np.float32)
        )
        prev = jnp.asarray(
            rng.standard_normal((1, 128, 128, 6)).astype(np.float32)
        )
        variables = m0.init(jax.random.key(0), labels, prev)
        assert jax.tree.structure(variables) == jax.tree.structure(
            m1.init(jax.random.key(0), labels, prev)
        )
        variables = {
            **variables,
            "batch_stats": jax.tree.map(
                lambda v: jnp.asarray(
                    (0.5 + 0.5 * rng.random(v.shape)).astype(np.float32)
                ),
                variables["batch_stats"],
            ),
        }
        want = m0.apply(variables, labels, prev)
        got = m1.apply(variables, labels, prev)
        np.testing.assert_allclose(
            np.asarray(got.img_final), np.asarray(want.img_final),
            atol=5e-4, rtol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(got.flow), np.asarray(want.flow), atol=5e-3, rtol=1e-4
        )

    def test_norm_want_affine_matches_eval(self, rng):
        from vid2vid_tpu.nn.layers import Norm

        for kind in ("batch", "instance", "none"):
            m = Norm(kind)
            x = jnp.asarray(rng.standard_normal((2, 6, 7, 8)).astype(np.float32))
            variables = m.init(jax.random.key(1), x)
            if kind != "none":
                variables = {
                    **variables,
                    "batch_stats": jax.tree.map(
                        lambda v: jnp.asarray(
                            (0.5 + rng.random(v.shape)).astype(np.float32)
                        ),
                        variables["batch_stats"],
                    ),
                }
            want = m.apply(variables, x, train=False)
            _, (a, b) = m.apply(variables, x, train=False, want_affine=True)
            np.testing.assert_allclose(
                np.asarray(x * a + b), np.asarray(want), atol=1e-5
            )


class TestPix2PixHD:
    def test_global_shapes(self, rng):
        m = GlobalGenerator(ngf=8, n_downsampling=2, n_blocks=2)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 35)).astype(np.float32))
        v = m.init(jax.random.key(0), x)
        assert m.apply(v, x).shape == (1, 32, 32, 3)

    def test_local_enhancer_shapes(self, rng):
        m = LocalEnhancer(ngf=4, n_downsample_global=2, n_blocks_global=2)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 35)).astype(np.float32))
        v = m.init(jax.random.key(0), x)
        assert m.apply(v, x).shape == (1, 64, 64, 3)

    def test_global_with_features_shapes(self, rng):
        m = GlobalWithFeatures(feat_num=4, ngf=8, n_downsampling=2, n_blocks=2)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 15)).astype(np.float32))
        z = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
        v = m.init(jax.random.key(0), x, z)
        assert m.apply(v, x, z).shape == (1, 32, 32, 3)

    def test_encoder_instance_average(self, rng):
        m = Encoder(output_nc=4, ngf=4, n_downsampling=2)
        x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
        inst = jnp.zeros((1, 16, 16), jnp.int32).at[:, :8].set(5)
        v = m.init(jax.random.key(0), x, inst)
        out = m.apply(v, x, inst)
        assert out.shape == (1, 16, 16, 4)
        # features constant within each instance region
        region = np.asarray(out)[0, :8]
        assert np.allclose(region, region[0, 0], atol=1e-5)

    def test_instance_average_means(self):
        feat = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
        inst = jnp.zeros((1, 4, 4), jnp.int32).at[:, 2:].set(7)
        out = instance_average(feat, inst)
        np.testing.assert_allclose(np.asarray(out)[0, 0, 0, 0], 3.5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out)[0, 3, 3, 0], 11.5, atol=1e-6)


class TestDiscriminator:
    def test_nlayer_output_size_matches_torch_formula(self, rng):
        m = NLayerDiscriminator(ndf=8, n_layers=3)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 6)).astype(np.float32))
        v = m.init(jax.random.key(0), x)
        (out,) = m.apply(v, x)
        # torch: three stride-2 4x4/p2 convs 64->33->17->9, two stride-1 -> 10, 11
        assert out.shape == (1, 11, 11, 1)

    def test_interm_feats(self, rng):
        m = NLayerDiscriminator(ndf=8, n_layers=3, get_interm_feat=True)
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
        v = m.init(jax.random.key(0), x)
        feats = m.apply(v, x)
        assert len(feats) == 5  # n_layers + 2

    def test_multiscale(self, rng):
        m = MultiscaleDiscriminator(ndf=8, num_d=3, get_interm_feat=True)
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 6)).astype(np.float32))
        v = m.init(jax.random.key(0), x)
        res = m.apply(v, x)
        assert len(res) == 3
        assert all(len(r) == 5 for r in res)
        # resolutions shrink across the pyramid
        assert res[0][-1].shape[1] > res[2][-1].shape[1]


class TestVgg:
    def test_tap_shapes(self, rng):
        m = Vgg19Features()
        x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
        v = m.init(jax.random.key(0), x)
        taps = m.apply(v, x)
        assert [t.shape for t in taps] == [
            (1, 64, 64, 64),
            (1, 32, 32, 128),
            (1, 16, 16, 256),
            (1, 8, 8, 512),
            (1, 4, 4, 512),
        ]


class TestFactoryDispatch:
    """define_G parity: every --netG kind constructs and runs
    (reference: models/networks.py:32-59)."""

    def _opt(self, **kw):
        from vid2vid_tpu.config import Options

        base = dict(
            label_nc=4, ngf=8, n_downsample_G=2, n_blocks=2,
            n_blocks_local=1, n_local_enhancers=1, feat_num=4,
            norm="instance", output_nc=3,
        )
        base.update(kw)
        return Options(**base)

    @pytest.mark.slow
    def test_all_generator_kinds(self, rng):
        import jax
        import jax.numpy as jnp

        from vid2vid_tpu.nn.factory import GENERATOR_KINDS, define_g

        opt = self._opt()
        x = jnp.asarray(rng.standard_normal((1, 32, 32, 12)).astype(np.float32))
        prev = jnp.asarray(rng.standard_normal((1, 32, 32, 6)).astype(np.float32))
        z = jnp.asarray(rng.standard_normal((1, 32, 32, 4)).astype(np.float32))
        inst = jnp.zeros((1, 32, 32), jnp.int32)

        for kind in GENERATOR_KINDS:
            mod = define_g(opt, kind)
            if kind in ("global", "local"):
                v = mod.init(jax.random.key(0), x)
                out = mod.apply(v, x)
                assert out.shape == (1, 32, 32, 3), kind
            elif kind in ("global_with_features", "local_with_features"):
                v = mod.init(jax.random.key(0), x, z)
                out = mod.apply(v, x, z)
                assert out.shape == (1, 32, 32, 3), kind
            elif kind == "composite":
                v = mod.init(jax.random.key(0), x, prev, None)
                out = mod.apply(v, x, prev, None)
                assert out.img_final.shape == (1, 32, 32, 3)
            elif kind == "compositeLocal":
                coarse_mod = define_g(opt, "composite")
                cv = coarse_mod.init(
                    jax.random.key(0), x[:, :16, :16], prev[:, :16, :16], None
                )
                coarse = coarse_mod.apply(cv, x[:, :16, :16], prev[:, :16, :16], None)
                local = define_g(opt, kind, ngf=opt.ngf_at_scale(1), scale=1)
                v = local.init(jax.random.key(0), x, prev, coarse, None)
                out = local.apply(v, x, prev, coarse, None)
                assert out.img_final.shape == (1, 32, 32, 3)
            elif kind == "encoder":
                v = mod.init(jax.random.key(0), prev[..., :3], inst)
                out = mod.apply(v, prev[..., :3], inst)
                assert out.shape == (1, 32, 32, 4)

    def test_unknown_kind_raises(self):
        import pytest as _pytest

        from vid2vid_tpu.nn.factory import define_g

        with _pytest.raises(ValueError, match="unknown --netG"):
            define_g(self._opt(), "resnet9000")

    def test_define_d_honours_opt(self):
        from vid2vid_tpu.nn.factory import define_d

        d = define_d(self._opt(num_D=2, n_layers_D=2, ndf=8, no_ganFeat=False))
        assert d.num_d == 2 and d.n_layers == 2 and d.get_interm_feat
