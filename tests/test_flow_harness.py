"""FlowNet standalone harness tests: losses, .flo IO, training step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vid2vid_tpu.models.flownet2.flow_io import read_flo, write_flo
from vid2vid_tpu.models.flownet2.harness import FlowHarness
from vid2vid_tpu.models.flownet2.losses import epe, multiscale_flow_loss
from vid2vid_tpu.models.flownet2.nets import FlowNetS


class TestFlowIO:
    def test_round_trip(self, tmp_path, rng):
        flow = rng.standard_normal((12, 16, 2)).astype(np.float32)
        path = str(tmp_path / "x.flo")
        write_flo(path, flow)
        np.testing.assert_array_equal(read_flo(path), flow)

    def test_bad_magic(self, tmp_path):
        path = tmp_path / "bad.flo"
        path.write_bytes(b"\x00" * 16)
        with pytest.raises(ValueError):
            read_flo(str(path))


class TestFlowLosses:
    def test_epe(self):
        a = jnp.zeros((1, 4, 4, 2))
        b = jnp.ones((1, 4, 4, 2)) * jnp.array([3.0, 4.0])
        assert float(epe(a, b)) == pytest.approx(5.0)

    def test_multiscale(self, rng):
        target = jnp.asarray(rng.standard_normal((1, 64, 64, 2)).astype(np.float32))
        pyr = tuple(
            jnp.zeros((1, 64 >> k, 64 >> k, 2)) for k in range(2, 7)
        )
        loss, err = multiscale_flow_loss(pyr, target)
        assert float(loss) > 0 and np.isfinite(float(err))


class TestHarness:
    def test_train_step_reduces_epe_on_constant_flow(self, rng):
        net = FlowNetS(train_outputs=True)
        harness = FlowHarness(net, lr=1e-3)
        params, opt_state = harness.init(jax.random.key(0), 64, 64, 6)

        pair = jnp.asarray(
            rng.standard_normal((1, 2, 64, 64, 3)).astype(np.float32)
        )
        flow = jnp.full((1, 64, 64, 2), 2.0)
        errs = []
        for _ in range(8):
            params, opt_state, loss, err = harness._train_step(
                params, opt_state, pair, flow
            )
            errs.append(float(err))
        assert errs[-1] < errs[0]

    def test_infer_to_flo(self, tmp_path, rng):
        net = FlowNetS(train_outputs=True)
        harness = FlowHarness(net)
        params, _ = harness.init(jax.random.key(0), 64, 64, 6)

        class DS:
            def __len__(self):
                return 2

            def __getitem__(self, i):
                r = np.random.default_rng(i)
                return (
                    r.standard_normal((2, 64, 64, 3)).astype(np.float32),
                    np.zeros((64, 64, 2), np.float32),
                )

        harness.infer_to_flo(params, DS(), str(tmp_path / "out"))
        flow = read_flo(str(tmp_path / "out" / "000000.flo"))
        assert flow.shape == (64, 64, 2)
