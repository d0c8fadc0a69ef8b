"""FlowNet2 stack tests: shapes, pyramid wiring, wrapper semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vid2vid_tpu.models.flownet2 import (
    FlowEstimator,
    FlowNet2,
    FlowNet2CS,
    FlowNetC,
    FlowNetFusion,
    FlowNetS,
    FlowNetSD,
)


def f32(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


class TestComponents:
    @pytest.mark.slow
    def test_flownetc_pyramid(self, rng):
        m = FlowNetC(train_outputs=True)
        x = f32(rng, 1, 64, 64, 6)
        v = m.init(jax.random.key(0), x)
        flows = m.apply(v, x)
        assert [f.shape for f in flows] == [
            (1, 16, 16, 2),
            (1, 8, 8, 2),
            (1, 4, 4, 2),
            (1, 2, 2, 2),
            (1, 1, 1, 2),
        ]

    def test_flownets_shape(self, rng):
        m = FlowNetS()
        x = f32(rng, 1, 64, 64, 12)
        v = m.init(jax.random.key(0), x)
        (flow2,) = m.apply(v, x)
        assert flow2.shape == (1, 16, 16, 2)

    def test_flownetsd_shape(self, rng):
        m = FlowNetSD()
        x = f32(rng, 1, 64, 64, 6)
        v = m.init(jax.random.key(0), x)
        (flow2,) = m.apply(v, x)
        assert flow2.shape == (1, 16, 16, 2)

    def test_fusion_full_res(self, rng):
        m = FlowNetFusion()
        x = f32(rng, 1, 32, 32, 11)
        v = m.init(jax.random.key(0), x)
        assert m.apply(v, x).shape == (1, 32, 32, 2)


class TestFlowNet2:
    def test_full_model(self, rng):
        m = FlowNet2()
        x1, x2 = f32(rng, 1, 64, 64, 3), f32(rng, 1, 64, 64, 3)
        v = m.init(jax.random.key(0), x1, x2)
        flow = m.apply(v, x1, x2)
        assert flow.shape == (1, 64, 64, 2)
        assert np.isfinite(np.asarray(flow)).all()

    def test_cs_variant(self, rng):
        m = FlowNet2CS()
        x1, x2 = f32(rng, 1, 64, 64, 3), f32(rng, 1, 64, 64, 3)
        v = m.init(jax.random.key(0), x1, x2)
        assert m.apply(v, x1, x2).shape == (1, 64, 64, 2)


class TestWrapper:
    def test_resize_path_and_conf(self, rng):
        est = FlowEstimator()
        params = est.init(jax.random.key(0))
        # 80x96 -> internally 64x64, back to 80x96
        im1, im2 = f32(rng, 1, 80, 96, 3), f32(rng, 1, 80, 96, 3)
        flow, conf = est(params, im1, im2)
        assert flow.shape == (1, 80, 96, 2)
        assert conf.shape == (1, 80, 96, 1)
        c = np.asarray(conf)
        assert ((c >= 0) & (c <= 1)).all()

    def test_identical_frames_high_confidence(self, rng):
        est = FlowEstimator()
        params = est.init(jax.random.key(0))
        im = f32(rng, 1, 64, 64, 3) * 0.1
        flow, conf = est(params, im, im)
        # same frame: tiny flow error -> most pixels confident even with a
        # randomly initialized net (flow magnitudes are small post-init)
        assert float(conf.mean()) > 0.5

    def test_video_batch_path(self, rng):
        est = FlowEstimator()
        params = est.init(jax.random.key(0))
        a, b = f32(rng, 1, 2, 64, 64, 3), f32(rng, 1, 2, 64, 64, 3)
        flow, conf = est(params, a, b)
        assert flow.shape == (1, 2, 64, 64, 2)
        assert conf.shape == (1, 2, 64, 64, 1)
