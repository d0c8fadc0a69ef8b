"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from vid2vid_tpu.config import Options
from vid2vid_tpu.models.generator import Vid2VidGenerator
from vid2vid_tpu.parallel import batch_sharding, make_mesh, replicated, shard_batch


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(8, data=2)
        assert mesh.shape == {"data": 2, "model": 4}
        mesh = make_mesh(8)
        assert mesh.shape == {"data": 8, "model": 1}

    def test_shard_batch_placement(self, rng):
        mesh = make_mesh(8, data=2)
        x = jnp.asarray(rng.standard_normal((2, 4, 16, 64, 3)).astype(np.float32))
        xs = shard_batch(x, mesh, width_axis=3)
        assert xs.sharding.spec == P("data", None, None, "model", None)

    def test_sharded_inference_matches_single_device(self, rng):
        """Width-sharded generation must equal unsharded (GSPMD halo check)."""
        opt = Options(
            label_nc=4, ngf=8, n_downsample_G=2, n_blocks=2,
            n_scales_spatial=2, n_frames_G=3, norm="batch",
        )
        gen = Vid2VidGenerator(opt)
        b, h, w = 1, 32, 64
        params = gen.init(jax.random.key(0), b, h, w)
        labels = jnp.asarray(rng.integers(0, 4, (b, 5, h, w)), jnp.int32)
        enc = gen.encode_input(labels)
        state = gen.zero_state(b, h, w)

        ref, _ = jax.jit(lambda p, e, s: gen.generate_clip(p, e, s))(
            params, enc, state
        )

        mesh = make_mesh(4, data=1)
        repl = replicated(mesh)
        enc_sh = jax.device_put(enc, NamedSharding(mesh, P(None, None, None, "model", None)))
        params_sh = jax.device_put(params, repl)
        state_sh = jax.device_put(state, repl)
        with mesh:
            out, _ = jax.jit(lambda p, e, s: gen.generate_clip(p, e, s))(
                params_sh, enc_sh, state_sh
            )
        np.testing.assert_allclose(
            np.asarray(out.fake), np.asarray(ref.fake), atol=2e-5
        )


class TestSparseD:
    def test_sparse_d_training(self):
        from vid2vid_tpu.data.synthetic import SyntheticVideoDataset
        from vid2vid_tpu.train.loop import Trainer

        opt = Options(
            label_nc=2, ngf=8, ndf=8, n_downsample_G=2, n_blocks=2,
            n_scales_spatial=1, num_D=1, n_layers_D=2, n_frames_D=3,
            n_scales_temporal=2, n_frames_total=6, max_frames_per_gpu=3,
            no_vgg=True, sparse_D=True, fineSize=32,
        )
        trainer = Trainer(opt)
        state = trainer.init_state(32, 32)
        ds = SyntheticVideoDataset(opt, height=32, width=32)
        labels, imgs = ds.clip(8)
        state, losses = trainer.train_clip(
            state, jnp.asarray(labels), jnp.asarray(imgs)
        )
        assert any(k.startswith("D_T_real") for k in losses)
        assert all(np.isfinite(v) for v in losses.values())
