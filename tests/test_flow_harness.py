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
    @pytest.mark.slow
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

    @pytest.mark.slow
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


@pytest.mark.slow
class TestBestEpeCheckpointing:
    def test_fit_tracks_best_and_restores(self, tmp_path, rng):
        from vid2vid_tpu.models.flownet2.flow_io import write_flo

        net = FlowNetS(train_outputs=True)
        harness = FlowHarness(net, lr=1e-3)
        params, opt_state = harness.init(jax.random.key(0), 64, 64, 6)

        class DS:
            def __len__(self):
                return 2

            def __getitem__(self, i):
                r = np.random.default_rng(i)
                return (
                    r.standard_normal((2, 64, 64, 3)).astype(np.float32),
                    np.full((64, 64, 2), 2.0, np.float32),
                )

        params, opt_state, best = harness.fit(
            params, opt_state, DS(), DS(), n_epochs=2,
            save_dir=str(tmp_path), prefix="t",
        )
        assert np.isfinite(best)
        assert (tmp_path / "t_checkpoint").is_dir()
        assert (tmp_path / "t_model_best").is_dir()

        p2, o2 = harness.init(jax.random.key(1), 64, 64, 6)
        rp, ro, epoch, best2 = harness.restore_checkpoint(
            p2, o2, str(tmp_path), prefix="t", best=True
        )
        assert epoch >= 1 and best2 <= best + 1e-6
        # restored best-EPE params validate to (close to) the tracked best
        assert harness.validate(rp, DS()) == pytest.approx(best2, rel=1e-3)

    def test_mixed_precision_step_runs(self, rng):
        net = FlowNetS(train_outputs=True)
        harness = FlowHarness(net, lr=1e-3, mixed_precision=True)
        params, opt_state = harness.init(jax.random.key(0), 64, 64, 6)
        pair = jnp.asarray(
            rng.standard_normal((1, 2, 64, 64, 3)).astype(np.float32)
        )
        flow = jnp.full((1, 64, 64, 2), 2.0)
        params, opt_state, loss, err = harness._train_step(
            params, opt_state, pair, flow
        )
        # master params stay f32
        assert all(
            a.dtype == jnp.float32
            for a in jax.tree.leaves(params)
            if jnp.issubdtype(a.dtype, jnp.floating)
        )
        assert np.isfinite(float(loss))


class TestFlowDatasetReaders:
    def _img(self, path, seed):
        from PIL import Image

        r = np.random.default_rng(seed)
        Image.fromarray(
            r.integers(0, 255, (64, 96, 3), np.uint8), "RGB"
        ).save(path)

    def test_flying_things_layout(self, tmp_path):
        from vid2vid_tpu.models.flownet2.datasets import FlyingThingsClean
        from vid2vid_tpu.models.flownet2.flow_io import write_flo

        idir = tmp_path / "frames_cleanpass" / "TRAIN" / "A" / "0000" / "left"
        fdir = (
            tmp_path / "optical_flow_flo_format" / "TRAIN" / "A" / "0000"
            / "into_future" / "left"
        )
        idir.mkdir(parents=True)
        fdir.mkdir(parents=True)
        for i in range(3):
            self._img(str(idir / f"{i:04d}.png"), i)
        for i in range(2):
            write_flo(
                str(fdir / f"{i:04d}.flo"),
                np.full((64, 96, 2), i, np.float32),
            )
        ds = FlyingThingsClean(str(tmp_path))
        assert len(ds) == 2
        pair, flow = ds[1]
        assert pair.shape == (2, 64, 64, 3)
        np.testing.assert_allclose(flow, 1.0)

    def test_chairs_sdhom_layout_and_flip(self, tmp_path):
        from vid2vid_tpu.models.flownet2.datasets import ChairsSDHom
        from vid2vid_tpu.models.flownet2.flow_io import write_flo

        for sub in ("t0", "t1", "flow"):
            (tmp_path / "train" / sub).mkdir(parents=True)
        self._img(str(tmp_path / "train" / "t0" / "0.png"), 0)
        self._img(str(tmp_path / "train" / "t1" / "0.png"), 1)
        flow = np.zeros((64, 96, 2), np.float32)
        flow[0, :, 0] = 7.0  # top row marker
        write_flo(str(tmp_path / "train" / "flow" / "0.flo"), flow)
        ds = ChairsSDHom(str(tmp_path))
        assert len(ds) == 1
        pair, f = ds[0]
        # stored flow is vertically flipped on read (reference: flow[::-1])
        np.testing.assert_allclose(f[-1, :, 0], 7.0)
        np.testing.assert_allclose(f[0, :, 0], 0.0)


@pytest.mark.slow
class TestMainCli:
    def test_reflection_cli_trains_and_saves(self, tmp_path):
        """main_cli end-to-end: reflection flags reach the dataset class,
        one epoch trains, best checkpoint lands in --save."""
        from PIL import Image

        from vid2vid_tpu.models.flownet2.flow_io import write_flo
        from vid2vid_tpu.models.flownet2.main_cli import main

        r = np.random.default_rng(0)
        data = tmp_path / "chairs"
        data.mkdir()
        for i in range(2):
            for tag in ("img1", "img2"):
                Image.fromarray(
                    r.integers(0, 255, (64, 64, 3), np.uint8), "RGB"
                ).save(str(data / f"{i:05d}_{tag}.ppm"))
            write_flo(
                str(data / f"{i:05d}_flow.flo"),
                np.ones((64, 64, 2), np.float32),
            )
        rc = main([
            "--model", "FlowNetS",
            "--training_dataset", "FlyingChairs",
            "--training_dataset_root", str(data),
            "--validation_dataset", "FlyingChairs",
            "--validation_dataset_root", str(data),
            "--total_epochs", "1",
            "--save", str(tmp_path / "work"),
            "--name", "smoke",
        ])
        assert rc == 0
        assert (tmp_path / "work" / "smoke_model_best").is_dir()
