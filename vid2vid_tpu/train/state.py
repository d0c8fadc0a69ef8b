"""Train state: the three optimizer groups + schedules + curriculum.

Reference semantics reproduced (reference: models/models.py:86-164,
models/base_model.py:154-180, models/vid2vid_model_G.py:66-84,
models/vid2vid_model_D.py:76-91):

  - optimizer_G over generator params — Adam(lr, (beta1, 0.999)), or
    TTUR variant Adam(lr/2, (0, 0.9));
  - optimizer_D over spatial (+face) discriminator — Adam(lr) or TTUR 2lr;
  - optimizer_D_T[s] per temporal scale — always Adam(lr, (beta1, 0.999));
  - linear LR decay after `niter` epochs over `niter_decay` epochs;
  - `niter_fix_global`: for the first N epochs only the finest generator
    scale is trained; at unfreeze the G optimizer is re-created (moments
    reset) — we re-init the optax state to match;
  - curriculum: every `niter_step` epochs the dataset's n_frames_total
    doubles and the per-step frame window / BPTT length grow
    (update_training_batch, reference: models/base_model.py:169-180).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vid2vid_tpu.config import Options


@struct.dataclass
class TrainState:
    gparams: Any
    dparams: Any  # {'D', 'D_f'?, 'D_T{s}', 'vgg'?}
    opt_g: Any
    opt_d: Any
    opt_dt: tuple  # per temporal scale


@dataclasses.dataclass
class Schedule:
    """Host-side training schedule & curriculum state (not traced).

    Curriculum semantics follow the reference exactly:
      - dataset sequence length `n_frames_total` starts at the flag value
        (reference: data/base_dataset.py:37) and, every `niter_step` epochs,
        jumps to `opt.n_frames_total * 2**(epoch//niter_step)` capped at
        `min(128, seq_len_max) - (tG - 1)` (data/base_dataset.py:19-24) —
        the flag is the *starting* length, not the ceiling;
      - per-step window: `n_frames_per_dev` starts at
        `min(max_frames_per_gpu, opt.n_frames_total // n_dev)` and doubles
        toward `max_frames_per_gpu` (vid2vid_model_G.py:58-60,
        base_model.py:177-180);
      - BPTT cadence `n_frames_bp` starts at 1 and grows as
        `n_frames_load // ceil(n_frames_load / min(max_frames_backpropagate,
        2**ratio))` (base_model.py:169-175).
    """

    opt: Options
    seq_len_max: int = 128  # longest training sequence; dataset reports it
    epoch: int = 1
    epoch_iter: int = 0
    total_steps: int = 0
    n_frames_total: int = 6
    n_frames_per_dev: int = 1
    n_frames_load: int = 1
    n_frames_bp: int = 1
    finetune_all: bool = True

    def __post_init__(self):
        o = self.opt
        n_dev = max(o.n_devices, 1)
        # reference: vid2vid_model_G.py:68 (with one spatial scale nothing is
        # ever frozen — the detach applies to s != n_scales-1 only)
        self.finetune_all = o.niter_fix_global == 0
        self.n_frames_total = o.n_frames_total
        self.n_frames_per_dev = max(
            1, min(o.max_frames_per_gpu, o.n_frames_total // n_dev)
        )
        self.n_frames_load = n_dev * self.n_frames_per_dev
        self.n_frames_bp = 1

    def lr_factor(self, epoch: int | None = None) -> float:
        """Linear decay past niter (reference: base_model.py:154-159)."""
        o = self.opt
        e = self.epoch if epoch is None else epoch
        if e <= o.niter or o.niter_decay <= 0:
            return 1.0
        return max(0.0, 1.0 - (e - o.niter) / o.niter_decay)

    def end_of_epoch(self) -> dict:
        """Advance schedule; returns events {'unfreeze': bool, 'grow': bool}.

        Mirrors update_models (reference: models/models.py:151-164).
        """
        o = self.opt
        n_dev = max(o.n_devices, 1)
        events = {"unfreeze": False, "grow": False}
        if (
            o.n_scales_spatial > 1
            and o.niter_fix_global != 0
            and self.epoch == o.niter_fix_global
        ):
            self.finetune_all = True
            events["unfreeze"] = True
        if self.epoch % o.niter_step == 0:
            ratio = self.epoch // o.niter_step
            # dataset curriculum (reference: data/base_dataset.py:19-24)
            cap = max(1, min(128, self.seq_len_max) - (o.n_frames_G - 1))
            old = self.n_frames_total
            if self.n_frames_total < cap:
                self.n_frames_total = min(cap, o.n_frames_total * 2**ratio)
            events["grow"] = old != self.n_frames_total
            # BPTT window then frames-per-device window
            # (reference: base_model.py:169-180)
            if self.n_frames_bp < self.n_frames_load:
                nfb = min(o.max_frames_backpropagate, 2**ratio)
                self.n_frames_bp = self.n_frames_load // max(
                    1, -(-self.n_frames_load // nfb)
                )
            if self.n_frames_per_dev < o.max_frames_per_gpu:
                self.n_frames_per_dev = min(
                    self.n_frames_per_dev * 2, o.max_frames_per_gpu
                )
                self.n_frames_load = n_dev * self.n_frames_per_dev
        self.epoch += 1
        return events


def _adam(lr, b1, b2):
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr, b1=b1, b2=b2)


def make_optimizers(opt: Options):
    """The three optimizer groups with TTUR handling."""
    if opt.TTUR:
        g_tx = _adam(opt.lr / 2, 0.0, 0.9)
        d_tx = _adam(opt.lr * 2, 0.0, 0.9)
    else:
        g_tx = _adam(opt.lr, opt.beta1, 0.999)
        d_tx = _adam(opt.lr, opt.beta1, 0.999)
    dt_tx = _adam(opt.lr, opt.beta1, 0.999)
    return g_tx, d_tx, dt_tx


def d_param_labels(dparams) -> Any:
    """Split D params into the spatial-D group vs temporal/frozen groups."""
    return {
        k: ("d" if k in ("D", "D_f") else "frozen") for k in dparams
    }


def create_train_state(
    opt: Options, gparams, dparams
) -> tuple[TrainState, tuple]:
    """Build TrainState; returns (state, (g_tx, d_tx, dt_tx)) transforms.

    The D transform applies to the {'D','D_f'} subtree only; vgg and D_T
    params are untouched by opt_d (D_T have their own optimizers, vgg is
    frozen).
    """
    g_tx, d_tx, dt_tx = make_optimizers(opt)
    d_masked = optax.multi_transform(
        {"d": d_tx, "frozen": optax.set_to_zero()}, d_param_labels(dparams)
    )
    opt_dt = tuple(
        dt_tx.init(dparams[f"D_T{s}"]) for s in range(opt.n_scales_temporal)
    )
    state = TrainState(
        gparams=gparams,
        dparams=dparams,
        opt_g=g_tx.init(gparams),
        opt_d=d_masked.init(dparams),
        opt_dt=opt_dt,
    )
    return state, (g_tx, d_masked, dt_tx)


def reinit_g_optimizer(state: TrainState, opt: Options) -> TrainState:
    """Reset G optimizer moments at the niter_fix_global unfreeze point
    (the reference re-creates the Adam, reference: base_model.py:161-167)."""
    g_tx, _, _ = make_optimizers(opt)
    return state.replace(opt_g=g_tx.init(state.gparams))


def set_learning_rate(state: TrainState, opt: Options, factor: float) -> TrainState:
    """Linear-decay hook for the G and D learning rates.

    Two reference quirks reproduced faithfully (reference:
    models/models.py:151-155, base_model.py:154-159):
      - only `optimizer_G` and `optimizer_D` decay; the temporal
        discriminators' `optimizer_D_T[s]` keep their initial lr forever;
      - `update_learning_rate` assigns the *absolute* value
        `opt.lr * (1 - (epoch-niter)/niter_decay)` to both groups, so under
        TTUR the lr/2 and 2*lr asymmetry vanishes at the first decay epoch.
    Before decay starts (factor >= 1) the initial (TTUR-scaled) lrs stand.

    Rebuilds the optax state trees functionally (InjectHyperparamsState /
    MultiTransformState / MaskedState are NamedTuples) — no in-place
    mutation, safe under donation/copies.
    """

    def upd(opt_state, lr_value):
        lr = jnp.asarray(
            lr_value,
            dtype=jnp.asarray(opt_state.hyperparams["learning_rate"]).dtype,
        )
        return opt_state._replace(
            hyperparams={**opt_state.hyperparams, "learning_rate": lr}
        )

    if factor >= 1.0:
        lr_g = (opt.lr / 2) if opt.TTUR else opt.lr
        lr_d = (opt.lr * 2) if opt.TTUR else opt.lr
    else:
        lr_g = lr_d = opt.lr * factor
    new_opt_g = upd(state.opt_g, lr_g)
    # opt_d is a multi_transform: inner_states['d'] wraps the injected adam
    masked = state.opt_d.inner_states["d"]
    new_masked = masked._replace(inner_state=upd(masked.inner_state, lr_d))
    new_opt_d = state.opt_d._replace(
        inner_states={**state.opt_d.inner_states, "d": new_masked}
    )
    return state.replace(opt_g=new_opt_g, opt_d=new_opt_d)
