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
    """Save the full train state (params + all three optimizer states +
    schedule counters — improves on the reference, which drops optimizer
    state, models/base_model.py:43-48).

    Compatibility notes for restored checkpoints:
      - Discriminator param SHAPES for configs with ndf < 64 changed in
        round 4 (the per-scale width ordering now matches the reference's
        min(64, ndf*2^(num_D-1-j)), models/networks.py:643-645).
        Checkpoints saved before that fix restore via `fuzzy_merge` with
        the mismatched D scales re-initialized — expect a brief D warmup.
      - D BatchNorm running stats are saved at their INIT values (mean 0 /
        var 1): training forwards use per-batch stats and never update the
        running buffers (see models/loss_engine.py module docstring), so
        an eval-mode (train=False) D forward on a restored checkpoint
        normalizes with init stats. Training math is unaffected; anyone
        exporting a D for eval-mode metrics must refresh stats first
        (one pass with mutable=['batch_stats']).
    """
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


def fuzzy_merge(template: Any, loaded: Any, path: str = ""):
    """Shape-intersection merge: take `loaded` leaves whose path and shape
    match the template, keep the template elsewhere.

    The reference's load_network fallback (reference: models/base_model.py:
    76-107) loads the intersection of state dicts with matching sizes and
    leaves the rest initialized — the mechanism behind `--load_pretrain`
    warm-starts of higher resolutions from lower ones
    (reference: scripts/street/train_1024.sh:5).

    Returns (merged, n_loaded, skipped_paths).
    """
    if isinstance(template, dict):
        merged = {}
        n_loaded = 0
        skipped: list[str] = []
        for k, v in template.items():
            if isinstance(loaded, dict) and k in loaded:
                m, n, sp = fuzzy_merge(v, loaded[k], f"{path}/{k}")
                merged[k] = m
                n_loaded += n
                skipped += sp
            else:
                merged[k] = v
                skipped.append(f"{path}/{k}")
        return merged, n_loaded, skipped
    t_shape = tuple(getattr(template, "shape", ()))
    l_shape = tuple(getattr(loaded, "shape", ()))
    if t_shape == l_shape:
        import jax.numpy as jnp

        dtype = getattr(template, "dtype", None)
        return jnp.asarray(loaded, dtype), 1, []
    return template, 0, [f"{path} (shape {l_shape} != {t_shape})"]


def load_pretrain(opt, state: TrainState) -> TrainState:
    """Warm-start from another run's checkpoint directory (--load_pretrain).

    Accepts either a full train-state checkpoint (`state/latest`) or a
    generator-only snapshot (`state/G_latest`); leaves whose path or shape
    don't match (e.g. a new enhancer scale) stay at init, mirroring the
    reference's fuzzy load_network.
    """
    root = os.path.abspath(opt.load_pretrain)
    ckpt = ocp.PyTreeCheckpointer()
    full = os.path.join(root, "state", "latest")
    gonly = os.path.join(root, "state", "G_latest")
    if os.path.isdir(full):
        payload = ckpt.restore(full)
        g_loaded, d_loaded = payload.get("gparams"), payload.get("dparams")
    elif os.path.isdir(gonly):
        g_loaded, d_loaded = ckpt.restore(gonly), None
    else:
        raise FileNotFoundError(
            f"--load_pretrain {opt.load_pretrain}: no checkpoint under "
            f"{full} or {gonly}"
        )
    gparams, n_g, skipped = fuzzy_merge(state.gparams, g_loaded)
    msg = f"load_pretrain: {n_g} generator tensors from {root}"
    dparams = state.dparams
    if d_loaded is not None:
        dparams, n_d, skipped_d = fuzzy_merge(state.dparams, d_loaded)
        skipped += skipped_d
        msg += f", {n_d} discriminator tensors"
    print(msg)
    if skipped:
        print(f"  not initialized from pretrain ({len(skipped)}):")
        for s in skipped[:12]:
            print(f"    {s}")
        if len(skipped) > 12:
            print(f"    ... +{len(skipped) - 12} more")
    return state.replace(gparams=gparams, dparams=dparams)
