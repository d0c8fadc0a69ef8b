"""Checkpoint save/restore (orbax) + train-cursor persistence.

Improves on the reference (which dropped optimizer state and kept only a
2-line iter.txt, reference: models/base_model.py:43-48, models/models.py:
105-110,135-149): the full TrainState (params + all three optimizer
states) and the schedule counters round-trip losslessly. Layout:

  checkpoints/<name>/state/<tag>/   — orbax pytree of TrainState
  checkpoints/<name>/iter.txt       — "epoch epoch_iter" (reference compat)
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from vid2vid_tpu.train.state import Schedule, TrainState


def _ckpt_dir(opt, tag: str) -> str:
    return os.path.abspath(
        os.path.join(opt.checkpoints_dir, opt.name, "state", tag)
    )


def save_checkpoint(opt, state: TrainState, schedule: Schedule, tag: str = "latest"):
    path = _ckpt_dir(opt, tag)
    ckpt = ocp.PyTreeCheckpointer()
    payload = {
        "gparams": state.gparams,
        "dparams": state.dparams,
        "opt_g": state.opt_g,
        "opt_d": state.opt_d,
        "opt_dt": list(state.opt_dt),
        "schedule": {
            "epoch": schedule.epoch,
            "epoch_iter": schedule.epoch_iter,
            "total_steps": schedule.total_steps,
            "n_frames_total": schedule.n_frames_total,
            "n_frames_per_dev": schedule.n_frames_per_dev,
            "n_frames_load": schedule.n_frames_load,
            "n_frames_bp": schedule.n_frames_bp,
            "seq_len_max": schedule.seq_len_max,
            "finetune_all": schedule.finetune_all,
        },
    }
    ckpt.save(path, payload, force=True)
    # separate generator-only snapshot: the test CLI restores just this
    # subtree (restoring the full optimizer payload is needlessly slow,
    # especially through a remote-device tunnel)
    ckpt.save(_ckpt_dir(opt, f"G_{tag}"), state.gparams, force=True)
    with open(os.path.join(opt.checkpoints_dir, opt.name, "iter.txt"), "w") as fh:
        fh.write(f"{schedule.epoch} {schedule.epoch_iter}")


def restore_checkpoint(opt, state: TrainState, schedule: Schedule, tag: str = "latest"):
    """Restore into the given (template) state; returns (state, schedule)."""
    path = _ckpt_dir(opt, tag)
    ckpt = ocp.PyTreeCheckpointer()
    template = {
        "gparams": state.gparams,
        "dparams": state.dparams,
        "opt_g": state.opt_g,
        "opt_d": state.opt_d,
        "opt_dt": list(state.opt_dt),
        "schedule": {
            "epoch": 0, "epoch_iter": 0, "total_steps": 0,
            "n_frames_total": 0, "n_frames_per_dev": 1, "n_frames_load": 0,
            "n_frames_bp": 0, "seq_len_max": 128,
            "finetune_all": True,
        },
    }
    payload = ckpt.restore(path, item=template)
    new_state = state.replace(
        gparams=payload["gparams"],
        dparams=payload["dparams"],
        opt_g=payload["opt_g"],
        opt_d=payload["opt_d"],
        opt_dt=tuple(payload["opt_dt"]),
    )
    s = payload["schedule"]
    schedule.epoch = int(s["epoch"])
    schedule.epoch_iter = int(s["epoch_iter"])
    schedule.total_steps = int(s["total_steps"])
    schedule.n_frames_total = int(s["n_frames_total"])
    schedule.n_frames_per_dev = int(s["n_frames_per_dev"])
    schedule.n_frames_load = int(s["n_frames_load"])
    schedule.n_frames_bp = int(s["n_frames_bp"])
    schedule.seq_len_max = int(s["seq_len_max"])
    schedule.finetune_all = bool(s["finetune_all"])
    return new_state, schedule


def save_params(opt, params: Any, tag: str):
    """Inference-only param snapshot (e.g. generator for test CLI)."""
    ocp.PyTreeCheckpointer().save(_ckpt_dir(opt, tag), params, force=True)


def restore_params(opt, template: Any, tag: str):
    return ocp.PyTreeCheckpointer().restore(_ckpt_dir(opt, tag), item=template)


def checkpoint_exists(opt, tag: str = "latest") -> bool:
    return os.path.isdir(_ckpt_dir(opt, tag))
