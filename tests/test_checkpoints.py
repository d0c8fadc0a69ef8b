"""Checkpoint round-trip tests (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vid2vid_tpu.config import Options
from vid2vid_tpu.train.checkpoints import (
    checkpoint_exists,
    restore_checkpoint,
    restore_params,
    save_checkpoint,
)
from vid2vid_tpu.train.loop import Trainer


@pytest.mark.slow
def test_round_trip(tmp_path):
    opt = Options(
        label_nc=2, ngf=8, ndf=8, n_downsample_G=2, n_blocks=2,
        num_D=1, n_layers_D=2, n_scales_temporal=1, no_vgg=True,
        checkpoints_dir=str(tmp_path), name="ckpt_test", fineSize=32,
    )
    trainer = Trainer(opt)
    state = trainer.init_state(32, 32)
    trainer.schedule.epoch = 7
    trainer.schedule.n_frames_total = 12
    save_checkpoint(opt, state, trainer.schedule)
    assert checkpoint_exists(opt)
    assert checkpoint_exists(opt, "G_latest")

    # perturb then restore
    trainer2 = Trainer(opt)
    state2 = trainer2.init_state(32, 32)
    restored, sched = restore_checkpoint(opt, state2, trainer2.schedule)
    assert sched.epoch == 7
    assert sched.n_frames_total == 12
    for a, b in zip(
        jax.tree.leaves(state.gparams), jax.tree.leaves(restored.gparams)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(state.opt_g), jax.tree.leaves(restored.opt_g)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # generator-only snapshot matches too
    gparams = restore_params(opt, state2.gparams, "G_latest")
    for a, b in zip(
        jax.tree.leaves(state.gparams), jax.tree.leaves(gparams)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_load_pretrain_fuzzy_merge(tmp_path):
    """Warm-start a 2-scale model from a finished 1-scale run: G0 tensors
    load where shapes intersect, the new enhancer scale stays at init
    (the reference's fuzzy load_network path behind --load_pretrain,
    reference: models/base_model.py:76-107, scripts/street/train_1024.sh:5)."""
    from vid2vid_tpu.train.checkpoints import load_pretrain

    base = Options(
        label_nc=2, ngf=8, ndf=8, n_downsample_G=2, n_blocks=2,
        num_D=1, n_layers_D=2, n_scales_temporal=1, no_vgg=True,
        checkpoints_dir=str(tmp_path), name="pretrain_512", fineSize=32,
    )
    t1 = Trainer(base)
    s1 = t1.init_state(32, 32)
    save_checkpoint(base, s1, t1.schedule)

    opt2 = base.replace(
        name="scale_up", n_scales_spatial=2,
        load_pretrain=str(tmp_path / "pretrain_512"),
    )
    t2 = Trainer(opt2)
    s2 = t2.init_state(64, 64)
    init_g1 = jax.tree.map(jnp.copy, s2.gparams["G1"])
    merged = load_pretrain(opt2, s2)

    for a, b in zip(
        jax.tree.leaves(s1.gparams["G0"]),
        jax.tree.leaves(merged.gparams["G0"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(init_g1), jax.tree.leaves(merged.gparams["G1"])
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
