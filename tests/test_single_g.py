"""use_single_G first-frame path tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vid2vid_tpu.config import Options
from vid2vid_tpu.models.inference import InferenceEngine, make_single_image_generator


class TestSingleG:
    def test_cityscapes_registry(self):
        for size, expected in [(512, 3), (1024, 4)]:
            opt = Options(dataroot="datasets/Cityscapes/", loadSize=size, isTrain=False)
            g, needs_feat = make_single_image_generator(opt)
            assert not needs_feat
            assert g.n_downsampling == expected
        opt = Options(dataroot="datasets/Cityscapes/", loadSize=2048, isTrain=False)
        g, _ = make_single_image_generator(opt)
        assert type(g).__name__ == "LocalEnhancer"

    def test_face_registry(self):
        opt = Options(dataroot="datasets/face/", isTrain=False)
        g, needs_feat = make_single_image_generator(opt)
        assert needs_feat and type(g).__name__ == "GlobalWithFeatures"

    def test_unknown_raises(self):
        opt = Options(dataroot="datasets/other/", isTrain=False)
        with pytest.raises(ValueError):
            make_single_image_generator(opt)

    def test_first_frames_seed_state(self, rng):
        opt = Options(
            dataroot="datasets/Cityscapes/", loadSize=512, isTrain=False,
            label_nc=35, n_scales_spatial=2, ngf=8, n_downsample_G=2,
            n_blocks=2, use_single_G=True,
        )
        eng = InferenceEngine(opt)
        g = eng.build_single_g()
        # tiny single-G stand-in with the same module type
        from vid2vid_tpu.nn.pix2pixhd import GlobalGenerator

        eng._single_g = GlobalGenerator(ngf=4, n_downsampling=2, n_blocks=1,
                                        norm="instance")
        labels = jnp.asarray(rng.integers(0, 35, (1, 2, 32, 32)), jnp.int32)
        enc = eng.encode(labels)
        params_i = eng._single_g.init(jax.random.key(0), enc[:, 0])
        state = eng.single_g_first_frames(params_i, enc)
        assert len(state) == 2
        assert state[0].shape == (1, 2, 32, 32, 3)
        assert state[1].shape == (1, 2, 16, 16, 3)
        # frames are tanh outputs
        assert np.abs(np.asarray(state[0])).max() <= 1.0

    def test_face_features_cluster_snap(self, rng):
        opt = Options(
            dataroot="datasets/face/", isTrain=False, label_nc=0, input_nc=15,
        )
        eng = InferenceEngine(opt)
        eng.build_single_g()
        from vid2vid_tpu.nn.pix2pixhd import Encoder

        eng._encoder = Encoder(output_nc=16, ngf=4, n_downsampling=2,
                               norm="instance")
        img = jnp.asarray(rng.standard_normal((1, 16, 16, 3)).astype(np.float32))
        inst = jnp.zeros((1, 16, 16), jnp.int32).at[:, 8:].set(1)
        eparams = eng._encoder.init(jax.random.key(0), img, inst)
        clusters = {
            0: rng.standard_normal((4, 17)).astype(np.float32),
            1: rng.standard_normal((3, 17)).astype(np.float32),
        }
        feat = eng.face_features(eparams, img, inst, clusters)
        assert feat.shape == (1, 16, 16, 16)
        # all pixels of a part share one cluster's features
        region = np.asarray(feat)[0, 8:]
        assert np.allclose(region, region[0, 0])
