"""End-to-end training tests on synthetic data (CPU, tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vid2vid_tpu.config import Options
from vid2vid_tpu.data.synthetic import SyntheticVideoDataset
from vid2vid_tpu.train.loop import Trainer
from vid2vid_tpu.train.state import Schedule


def tiny_opt(**kw):
    defaults = dict(
        label_nc=2,
        ngf=8,
        ndf=8,
        n_downsample_G=2,
        n_blocks=2,
        n_scales_spatial=1,
        n_frames_G=3,
        num_D=1,
        n_layers_D=2,
        n_frames_D=3,
        n_scales_temporal=1,
        n_frames_total=6,
        max_frames_per_gpu=2,
        no_vgg=True,  # keep the test fast
        norm="batch",
        fineSize=32,
        lr=1e-4,
    )
    defaults.update(kw)
    return Options(**defaults)


class TestTrainer:
    def test_chunked_clip_trains_and_losses_finite(self):
        opt = tiny_opt()
        trainer = Trainer(opt)
        state = trainer.init_state(32, 32)
        ds = SyntheticVideoDataset(opt, height=32, width=32)
        # clip with 2 chunks: n_load=2, t_len=4, total = 2*2+2 = 6 frames
        labels, imgs = ds.clip(6)
        state, losses = trainer.train_clip(
            state, jnp.asarray(labels), jnp.asarray(imgs)
        )
        for k, v in losses.items():
            assert np.isfinite(v), (k, v)
        assert "G_GAN" in losses and "D_real" in losses
        assert "loss_G_total" in losses

    def test_params_change_after_training(self):
        opt = tiny_opt()
        trainer = Trainer(opt)
        state = trainer.init_state(32, 32)
        ds = SyntheticVideoDataset(opt, height=32, width=32)
        labels, imgs = ds.clip(6)
        g0 = jax.tree.map(jnp.copy, state.gparams)
        d0 = jax.tree.map(jnp.copy, state.dparams["D"])
        state, _ = trainer.train_clip(state, jnp.asarray(labels), jnp.asarray(imgs))

        def max_delta(a, b):
            return max(
                float(jnp.abs(x - y).max())
                for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
            )

        assert max_delta(state.gparams["G0"]["params"], g0["G0"]["params"]) > 0
        assert max_delta(state.dparams["D"]["params"], d0["params"]) > 0

    def test_temporal_d_receives_groups(self):
        opt = tiny_opt(n_frames_total=6, max_frames_per_gpu=3)
        trainer = Trainer(opt)
        state = trainer.init_state(32, 32)
        ds = SyntheticVideoDataset(opt, height=32, width=32)
        labels, imgs = ds.clip(8)  # n_load=3 -> chunks of 3 current frames
        state, losses = trainer.train_clip(
            state, jnp.asarray(labels), jnp.asarray(imgs)
        )
        assert any(k.startswith("D_T_real") for k in losses)

    def test_no_first_img_mode(self):
        opt = tiny_opt(no_first_img=True)
        trainer = Trainer(opt)
        state = trainer.init_state(32, 32)
        ds = SyntheticVideoDataset(opt, height=32, width=32)
        labels, imgs = ds.clip(6)
        state, losses = trainer.train_clip(
            state, jnp.asarray(labels), jnp.asarray(imgs)
        )
        assert np.isfinite(losses["W"])


class TestSchedule:
    def test_lr_decay(self):
        opt = tiny_opt(niter=10, niter_decay=10)
        s = Schedule(opt)
        assert s.lr_factor(5) == 1.0
        assert s.lr_factor(15) == pytest.approx(0.5)
        assert s.lr_factor(20) == pytest.approx(0.0)

    def test_curriculum_growth(self):
        opt = tiny_opt(
            niter_step=2, n_frames_total=24, max_frames_per_gpu=4,
            max_frames_backpropagate=4,
        )
        s = Schedule(opt)
        start_total = s.n_frames_total
        for _ in range(2):
            s.end_of_epoch()
        assert s.n_frames_total == min(start_total * 2, 24)

    def test_unfreeze_event(self):
        opt = tiny_opt(niter_fix_global=2)
        s = Schedule(opt)
        assert not s.finetune_all
        s.end_of_epoch()
        events = s.end_of_epoch()
        assert events["unfreeze"] and s.finetune_all

    def test_end_of_epoch_updates_lr(self):
        opt = tiny_opt(niter=1, niter_decay=4)
        trainer = Trainer(opt)
        state = trainer.init_state(32, 32)
        trainer.schedule.epoch = 2  # advances to 3 -> factor 1-(3-1)/4 = 0.5
        state = trainer.end_of_epoch(state)
        lr = state.opt_g.hyperparams["learning_rate"]
        assert float(lr) == pytest.approx(opt.lr * 0.5)


class TestStatsRefresh:
    def test_refresh_updates_running_stats(self):
        import jax.numpy as jnp

        from vid2vid_tpu.data.synthetic import SyntheticVideoDataset
        from vid2vid_tpu.train.loop import Trainer, refresh_batch_stats

        opt = tiny_opt()
        trainer = Trainer(opt)
        state = trainer.init_state(32, 32)
        ds = SyntheticVideoDataset(opt, height=32, width=32)

        def clips():
            for _ in range(2):
                labels, imgs = ds.clip(4)
                yield jnp.asarray(labels), jnp.asarray(imgs), None

        before = jax.tree.leaves(state.gparams["G0"]["batch_stats"])
        new_state = refresh_batch_stats(trainer, state, clips(), n_batches=2)
        after = jax.tree.leaves(new_state.gparams["G0"]["batch_stats"])
        deltas = [float(jnp.abs(a - b).max()) for a, b in zip(after, before)]
        assert max(deltas) > 0
