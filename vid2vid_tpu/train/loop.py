"""Training orchestration: per-clip chunk loop, temporal buffers, curriculum.

Mirrors the reference's epoch → clip → chunk structure (reference:
train.py:37-128, data/base_dataset.py:56-80):

  for each clip (a (B, n_frames, H, W, *) stack from the data pipeline):
    reset generator state and temporal buffers;
    for each chunk of n_frames_load frames:
      - encode inputs, compute FlowNet reference flows;
      - G step (generate + all G losses + Adam update);
      - D step; one D_T step per active temporal scale;
      - carry generator ring buffers and temporal frame buffers forward.

Host-side state (buffer lengths, chunk phase, curriculum) stays in Python —
each distinct configuration jits once and is reused every epoch.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from vid2vid_tpu.config import Options
from vid2vid_tpu.models.generator import Vid2VidGenerator
from vid2vid_tpu.models.loss_engine import LossEngine
from vid2vid_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from vid2vid_tpu.models.temporal import (
    skipped_flows,
    skipped_frames,
    skipped_frames_sparse,
)
from vid2vid_tpu.train.state import (
    Schedule,
    TrainState,
    create_train_state,
    reinit_g_optimizer,
    set_learning_rate,
)
from vid2vid_tpu.train.steps import make_d_step, make_dt_step, make_g_step


@dataclasses.dataclass
class ClipCarry:
    """Cross-chunk state within one clip."""

    gen_state: Any = None
    fake_prev_first: Any = None  # (B,1,H,W,3) for the warp-consistency loss
    real_all: Any = None
    fake_buf: Any = None
    flow_all: Any = None
    conf_all: Any = None
    chunk_start: int = 0


def zero_flow_fn(real_b, real_b_prev):
    """Test/no-flownet fallback: zero flow, full confidence."""
    b = real_b.shape[:-1]
    return jnp.zeros(b + (2,)), jnp.ones(b + (1,))


class Trainer:
    """Owns models, optimizers, and the jitted step functions."""

    def __init__(
        self,
        opt: Options,
        flow_fn: Callable | None = None,
        rng: jax.Array | None = None,
    ):
        self.opt = opt
        self.gen = Vid2VidGenerator(opt)
        self.engine = LossEngine(opt)
        self.flow_fn = flow_fn or zero_flow_fn
        self.schedule = Schedule(opt)
        self.rng = rng if rng is not None else jax.random.key(opt.seed)
        # --n_devices > 1: build the ('data','model') mesh here so the real
        # training path shards (the reference's DataParallel + G/D split,
        # models/models.py:10-59, collapse into these annotations). Batch
        # shards over 'data' (largest common divisor with batchSize); the
        # leftover devices shard activation width over 'model' — GSPMD
        # inserts the conv halo exchanges.
        self.mesh = None
        if opt.n_devices > 1:
            import math

            avail = len(jax.devices())
            n = min(opt.n_devices, avail)
            if n < opt.n_devices:
                print(
                    f"WARNING: --n_devices {opt.n_devices} requested but only "
                    f"{avail} devices visible; using {n}"
                )
            if n > 1:
                self.mesh = make_mesh(n, data=math.gcd(opt.batchSize, n))
        # jit the host-side temporal bookkeeping: each eager op is a device
        # round trip on remote platforms; shapes recur per chunk config so
        # the jit cache stays small
        import functools

        self._skipped_frames = jax.jit(
            functools.partial(
                skipped_frames, t_scales=opt.n_scales_temporal, td=opt.n_frames_D
            )
        )
        # NOTE: flow_fn must NOT be traced inside this jit — it closes over
        # the FlowNet2 params and an outer jit would bake them into the HLO
        # as constants. The coarse-scale flow recomputation is hoisted into
        # train_chunk, where flow_fn runs eagerly (it jits internally with
        # params as a traced argument).
        self._skipped_flows = jax.jit(
            functools.partial(
                skipped_flows,
                t_scales=opt.n_scales_temporal,
                td=opt.n_frames_D,
            )
        )
        # perf accounting hook: when record_costs is set, train_chunk stores
        # ShapeDtypeStructs of each step's arguments (captured BEFORE the
        # call — donation invalidates the real buffers) so bench.py can
        # .lower() the jitted steps and sum cost_analysis FLOPs per iteration
        self.record_costs = False
        self.last_step_shapes: list | None = None

    # ------------------------------------------------------------------ setup

    def init_state(self, height: int, width: int, batch: int = 1) -> TrainState:
        kg, kd = jax.random.split(self.rng)
        init_g = jax.jit(
            lambda k: self.gen.init(k, batch, height, width),
        )
        gparams = init_g(kg)
        dparams = jax.jit(lambda k: self.engine.init(k, height, width))(kd)
        state, (self.g_tx, self.d_tx, self.dt_tx) = create_train_state(
            self.opt, gparams, dparams
        )
        if self.mesh is not None:
            state = jax.device_put(state, replicated(self.mesh))
        self.g_step = make_g_step(self.gen, self.engine, self.opt, self.g_tx)
        self.d_step = make_d_step(self.engine, self.opt, self.d_tx)
        self.dt_step = make_dt_step(self.engine, self.opt, self.dt_tx)
        return state

    # ------------------------------------------------------------------ clip

    def start_clip(self) -> ClipCarry:
        return ClipCarry()

    def train_chunk(
        self,
        state: TrainState,
        carry: ClipCarry,
        labels: jax.Array,       # (B, t_len, H, W) or (B, t_len, H, W, C)
        real_b: jax.Array,       # (B, t_len, H, W, 3)
        inst: jax.Array | None = None,
    ):
        """One optimization step over a chunk of t_len frames.

        Returns (state, carry, loss_dict).
        """
        opt = self.opt
        tG = opt.n_frames_G
        t_scales = opt.n_scales_temporal
        td = opt.n_frames_D
        first_chunk = carry.gen_state is None
        if opt.sparse_D and carry.fake_buf is None:
            carry.fake_buf = (None,) * t_scales

        if self.mesh is not None:
            # batch over 'data', width over 'model'; all downstream arrays
            # (encodings, flows, generator state) inherit the layout. A
            # remainder batch that doesn't divide the data axis (the
            # reference zero-pads + strips dummies, models/models.py:26-59)
            # stays replicated over 'data' instead — correct, just unsharded.
            b_axis = 0 if labels.shape[0] % self.mesh.shape["data"] == 0 else None
            labels = shard_batch(labels, self.mesh, width_axis=3, batch_axis=b_axis)
            real_b = shard_batch(real_b, self.mesh, width_axis=3, batch_axis=b_axis)
            if inst is not None:
                inst = shard_batch(inst, self.mesh, width_axis=3, batch_axis=b_axis)

        enc_a = self.gen.encode_input(labels, inst)
        b, t_len, h, w = real_b.shape[:4]
        n_load = t_len - tG + 1

        # --- generator seed state (reference: vid2vid_model_G.py:231-251)
        use_raw_only = False
        if first_chunk:
            if opt.no_first_img:
                carry.gen_state = self.gen.zero_state(b, h, w)
                use_raw_only = True
            else:
                carry.gen_state = self.gen.state_from_frames(real_b[:, : tG - 1])
            carry.fake_prev_first = real_b[:, tG - 2 : tG - 1]
        # else: fake_prev_first was set at the end of the previous chunk

        # --- reference flows for the chunk's current frames
        real_b_cur = real_b[:, tG - 1:]
        real_b_prev = real_b[:, tG - 2 : -1]
        flow_ref, conf_ref = self.flow_fn(real_b_cur, real_b_prev)

        # --- temporal real/flow buffers + groups (host-static shapes)
        if opt.sparse_D:
            if carry.real_all is None:
                carry.real_all = [None] * t_scales
                carry.flow_all = [None] * t_scales
                carry.conf_all = [None] * t_scales
            i0 = carry.chunk_start
            carry.real_all, real_skipped = skipped_frames_sparse(
                carry.real_all, real_b_cur, t_scales, td, n_load, i0
            )
            carry.flow_all, flow_skipped = skipped_frames_sparse(
                carry.flow_all, flow_ref, t_scales, td, n_load, i0, is_flow=True
            )
            carry.conf_all, conf_skipped = skipped_frames_sparse(
                carry.conf_all, conf_ref, t_scales, td, n_load, i0, is_flow=True
            )
        else:
            carry.real_all, real_skipped = self._skipped_frames(
                carry.real_all, real_b_cur
            )
            carry.flow_all, carry.conf_all, flow_skipped, conf_skipped = (
                self._skipped_flows(
                    carry.flow_all, carry.conf_all, flow_ref, conf_ref
                )
            )
            # coarser temporal scales: reference flow between the skipped
            # real frames (reference: vid2vid_model_D.py:292-302), computed
            # here outside the bookkeeping jit (see __init__ note)
            for s in range(1, t_scales):
                rb = real_skipped[s]
                if rb is not None:
                    flow_skipped[s], conf_skipped[s] = self.flow_fn(
                        rb[:, 1:], rb[:, :-1]
                    )

        # --- G step
        def _sds(tree):
            return jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree
            )

        g_kwargs = dict(
            use_raw_only=use_raw_only,
            n_frames_bp=self.schedule.n_frames_bp,
            finetune_all=self.schedule.finetune_all,
            first_chunk=first_chunk,
            chunk_start=carry.chunk_start,
        )
        g_args = (
            state, enc_a, real_b, carry.gen_state, flow_ref, conf_ref,
            carry.fake_prev_first, carry.fake_buf,
            tuple(real_skipped), tuple(flow_skipped),
        )
        if self.record_costs:
            self.last_step_shapes = [("g", _sds(g_args), g_kwargs)]
        state, loss_g, aux = self.g_step(*g_args, **g_kwargs)
        outs = aux["outs"]
        self.last_outs = outs  # for visualization (device arrays, lazy)
        self.last_inputs = (labels, real_b, flow_ref, conf_ref)
        carry.gen_state = aux["gen_state"]
        carry.fake_buf = aux["fake_buf"]
        carry.fake_prev_first = outs.fake[:, -1:]
        fake_skipped = aux["fake_skipped"]

        # --- D step
        d_args = (
            state, enc_a, real_b, outs.fake,
            outs.raw if not use_raw_only else None,
        )
        if self.record_costs:
            self.last_step_shapes.append(
                ("d", _sds(d_args), dict(with_raw=not use_raw_only))
            )
        state, loss_d, d_losses = self.d_step(
            *d_args, with_raw=not use_raw_only
        )

        # --- temporal D steps
        dt_losses = []
        for s in range(t_scales):
            if real_skipped[s] is None or fake_skipped[s] is None:
                continue
            dt_args = (
                state, real_skipped[s], fake_skipped[s], flow_skipped[s],
            )
            if self.record_costs:
                self.last_step_shapes.append(("dt", _sds(dt_args), dict(scale=s)))
            state, loss_dt, dtl = self.dt_step(*dt_args, scale=s)
            dt_losses.append(dtl)

        carry.chunk_start += n_load
        self.schedule.total_steps += self.opt.batchSize

        # ONE batched transfer for every loss scalar: each float(v) is a
        # separate device->host round trip (20+ per iteration), which is
        # pure latency on a remote/tunneled device — measured 2.7x the
        # whole-dict cost in the round-5 train ledger (PERF.md).
        dev = dict(aux["losses"])
        dev["G_grad_norm"] = aux["grad_norm"]
        dev.update(d_losses)
        for s, dtl in enumerate(dt_losses):
            dev.update({f"{k}{s}": v for k, v in dtl.items()})
        for s, tl in enumerate(aux["t_losses"]):
            dev.update({f"{k}{s}": v for k, v in tl.items()})
        dev["loss_G_total"] = loss_g
        dev["loss_D_total"] = loss_d
        return state, carry, {
            k: float(v) for k, v in jax.device_get(dev).items()
        }

    def train_clip(self, state, labels, real_b, inst=None):
        """Run all chunks of one clip; returns (state, last loss_dict)."""
        opt = self.opt
        tG = opt.n_frames_G
        n_total = labels.shape[1]  # includes the tG-1 warmup frames
        n_load = min(self.schedule.n_frames_load, n_total - tG + 1)
        t_len = n_load + tG - 1
        carry = self.start_clip()
        losses = {}
        for i in range(0, n_total - t_len + 1, n_load):
            state, carry, losses = self.train_chunk(
                state,
                carry,
                labels[:, i : i + t_len],
                real_b[:, i : i + t_len],
                inst[:, i : i + t_len] if inst is not None else None,
            )
        return state, losses

    # ------------------------------------------------------------------ epoch

    def end_of_epoch(self, state: TrainState) -> TrainState:
        """LR decay, curriculum growth, scale unfreeze."""
        events = self.schedule.end_of_epoch()
        if events["unfreeze"]:
            state = reinit_g_optimizer(state, self.opt)
        state = set_learning_rate(state, self.opt, self.schedule.lr_factor())
        return state


def refresh_batch_stats(
    trainer: Trainer,
    state: TrainState,
    clips,
    n_batches: int = 8,
    max_windows_per_clip: int = 8,
):
    """Recalibrate generator norm running statistics for eval.

    GAN training here runs with per-batch norm stats and does not update the
    running buffers inside the jitted steps; imported torch checkpoints carry
    their own stats, but a model trained from scratch needs this pass before
    eval-mode inference: run the generator forward in train mode with the
    batch_stats collection mutable over a few clips, walking up to
    `max_windows_per_clip` tG-frame windows across each clip (first-window
    only would calibrate eval-mode BN from ~4 samples).

    Args:
      clips: iterable of (labels, real_b, inst) arrays as in train_clip —
        host numpy is fine (and preferred: the caller should not pin clip
        HBM between checkpoint saves).
    Returns: TrainState with refreshed gparams batch_stats.
    """
    gen = trainer.gen
    tG = trainer.opt.n_frames_G
    if "batch_stats" not in state.gparams.get("G0", {}):
        return state  # norm='none': nothing to recalibrate

    @jax.jit
    def refresh(gparams, enc, gen_state):
        # run each scale's module with mutable batch_stats through one clip
        new_params = dict(gparams)
        coarse = None
        n_scales = gen.n_scales
        from vid2vid_tpu.models.generator import stack_time
        from vid2vid_tpu.ops.pool import build_pyramid_video
        from vid2vid_tpu.ops.encode import fg_mask_from_onehot

        a_pyr = build_pyramid_video(enc, n_scales)
        for s in range(n_scales):
            si = n_scales - 1 - s
            lab = stack_time(a_pyr[si][:, :tG])
            prev = stack_time(gen_state[si])
            mask = (
                fg_mask_from_onehot(a_pyr[si][:, tG - 1], trainer.opt.fg_labels)
                if trainer.opt.fg
                else None
            )
            if s == 0:
                out, updates = gen.scales[0].apply(
                    gparams["G0"], lab, prev, mask, False, True,
                    mutable=["batch_stats"],
                )
            else:
                out, updates = gen.scales[s].apply(
                    gparams[f"G{s}"], lab, prev, coarse, mask, False, True,
                    mutable=["batch_stats"],
                )
            coarse = out
            merged = dict(gparams[f"G{s}"])
            merged["batch_stats"] = updates["batch_stats"]
            new_params[f"G{s}"] = merged
        return new_params

    gparams = state.gparams
    count = 0
    for labels, real_b, inst in clips:
        if count >= n_batches:
            break
        labels = jnp.asarray(labels)
        real_b = jnp.asarray(real_b)
        inst = jnp.asarray(inst) if inst is not None else None
        enc_full = gen.encode_input(labels, inst)
        n_win = max(1, real_b.shape[1] - tG + 1)
        stride = max(1, -(-n_win // max_windows_per_clip))
        for t0 in range(0, n_win, stride):
            enc = enc_full[:, t0 : t0 + tG]
            gen_state = gen.state_from_frames(real_b[:, t0 : t0 + tG - 1])
            gparams = refresh(gparams, enc, gen_state)
        count += 1
    return state.replace(gparams=gparams)
