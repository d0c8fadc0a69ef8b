"""Jitted training steps: generator, spatial D, temporal Ds.

Each chunk of `n_frames_load` frames runs one G step, one D step, and one
D_T step per active temporal scale — the reference's three backward passes
(reference: train.py:84-93) — as separate jitted functions whose gradient
boundaries are enforced by stop_gradient placement in the loss engine.

Step factories close over the model definitions and optimizer transforms;
the returned functions are pure in (TrainState, arrays) and are re-jitted
per static chunk configuration (first-chunk flags, buffer lengths,
curriculum window) — a small bounded set of shapes per run.
"""

from __future__ import annotations

import functools
from typing import Any

import optax

import jax
import jax.numpy as jnp

from vid2vid_tpu.models.generator import Vid2VidGenerator
from vid2vid_tpu.models.loss_engine import LossEngine
from vid2vid_tpu.models.temporal import skipped_frames, skipped_frames_sparse
from vid2vid_tpu.train.state import TrainState


def _flat(x):
    """(B, T, H, W, C) -> (B*T, H, W, C)."""
    return x.reshape((-1,) + x.shape[2:])


def _param_grad_norm(grads) -> jax.Array:
    """Global L2 norm over the 'params' collections only.

    Gradient trees here mirror flax variable dicts ({'params', possibly
    'batch_stats'}); torch's parameter grad norm counts weights only, so
    the (identically zero) batch_stats cotangents are excluded.
    """
    leaves = []
    for key, sub in grads.items():
        if isinstance(sub, dict) and "params" in sub:
            leaves.append(sub["params"])
        else:
            leaves.append(sub)
    return optax.global_norm(leaves)


def make_g_step(gen: Vid2VidGenerator, engine: LossEngine, opt, g_tx):
    """Generator step factory.

    The returned fn generates the chunk's frames, computes every G-side
    loss (spatial + flow supervision + temporal GAN terms), and applies
    one Adam update to the generator params.
    """
    tG = opt.n_frames_G
    td = opt.n_frames_D
    t_scales = opt.n_scales_temporal

    @functools.partial(
        jax.jit,
        static_argnames=(
            "use_raw_only", "n_frames_bp", "finetune_all", "first_chunk",
            "chunk_start",
        ),
        donate_argnums=(0,),  # state buffers update in place (411M-param G:
        # f32 master + grads + Adam moments would otherwise double-allocate)
    )
    def g_step(
        state: TrainState,
        enc_a: jax.Array,        # (B, T+tG-1, H, W, C_enc)
        real_b_all: jax.Array,   # (B, T+tG-1, H, W, 3)
        gen_state: tuple,        # generator pyramid ring buffers
        flow_ref: jax.Array,     # (B, T, H, W, 2)
        conf_ref: jax.Array,     # (B, T, H, W, 1)
        fake_prev_first: jax.Array,  # (B, 1, H, W, 3)
        fake_buf: jax.Array | None,  # (B, L, H, W, 3) past fakes or None
        real_skipped: tuple,     # per-scale (G, td, H, W, 3) or None
        flow_skipped: tuple,     # per-scale (G, td-1, H, W, 2) or None
        *,
        use_raw_only: bool,
        n_frames_bp: int,
        finetune_all: bool,
        first_chunk: bool,
        chunk_start: int = 0,
    ):
        def loss_fn(gparams):
            if opt.bf16 or opt.fp16:
                # mixed precision: f32 master params, bf16 generator forward
                # (grads return f32 through the cast; losses stay f32)
                from vid2vid_tpu.models.inference import cast_pytree

                gp = cast_pytree(gparams, jnp.bfloat16)
                enc = enc_a.astype(jnp.bfloat16)
                gs = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16), gen_state
                )
            else:
                gp, enc, gs = gparams, enc_a, gen_state
            outs, new_gen_state = gen.generate_clip(
                gp,
                enc,
                gs,
                use_raw_only=use_raw_only,
                train=True,
                n_frames_bp=n_frames_bp,
                finetune_all=finetune_all,
            )
            if opt.bf16 or opt.fp16:
                outs = jax.tree.map(lambda x: x.astype(jnp.float32), outs)
                new_gen_state = jax.tree.map(
                    lambda x: x.astype(jnp.float32), new_gen_state
                )
            real_a = enc_a[:, tG - 1:]
            real_b = real_b_all[:, tG - 1:]
            real_b_prev = real_b_all[:, tG - 2:-1]
            fake_prev = jnp.concatenate(
                [fake_prev_first, jax.lax.stop_gradient(outs.fake[:, :-1])], 1
            )
            losses = engine.generator_losses(
                state.dparams,
                _flat(real_a),
                _flat(real_b),
                _flat(outs.fake),
                _flat(outs.raw) if not use_raw_only else None,
                _flat(real_b_prev),
                _flat(fake_prev),
                _flat(outs.flow) if outs.flow is not None else None,
                _flat(outs.weight) if outs.weight is not None else None,
                _flat(flow_ref),
                _flat(conf_ref),
                train=True,
            )
            if opt.sparse_D:
                n_load = enc_a.shape[1] - tG + 1
                new_fake_buf, fake_skipped = skipped_frames_sparse(
                    list(fake_buf), outs.fake, t_scales, td, n_load, chunk_start
                )
                new_fake_buf = tuple(new_fake_buf)
            else:
                new_fake_buf, fake_skipped = skipped_frames(
                    fake_buf, outs.fake, t_scales, td
                )
            t_losses = []
            for s in range(t_scales):
                if real_skipped[s] is None or fake_skipped[s] is None:
                    continue
                t_losses.append(
                    engine.temporal_g_losses(
                        state.dparams, s, real_skipped[s], fake_skipped[s],
                        flow_skipped[s], train=True,
                    )
                )
            total = engine.total_g_loss(losses, t_losses)
            aux = dict(
                outs=outs,
                gen_state=new_gen_state,
                losses=losses,
                t_losses=t_losses,
                fake_buf=jax.lax.stop_gradient(new_fake_buf),
                fake_skipped=jax.lax.stop_gradient(fake_skipped),
            )
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.gparams
        )
        # the reference reports/clips nothing, but the per-group grad norm is
        # the cheapest training-health scalar and the oracle tests pin it
        aux["grad_norm"] = _param_grad_norm(grads)
        updates, new_opt_g = g_tx.update(grads, state.opt_g, state.gparams)
        new_gparams = optax.apply_updates(state.gparams, updates)
        new_state = state.replace(gparams=new_gparams, opt_g=new_opt_g)
        return new_state, loss, aux

    return g_step


def make_d_step(engine: LossEngine, opt, d_tx):
    """Spatial (+face) discriminator step factory."""

    tG = opt.n_frames_G

    @functools.partial(
        jax.jit, static_argnames=("with_raw",), donate_argnums=(0,)
    )
    def d_step(
        state: TrainState,
        enc_a: jax.Array,
        real_b_all: jax.Array,
        fake: jax.Array,
        raw: jax.Array | None,
        *,
        with_raw: bool,
    ):
        real_a = _flat(enc_a[:, tG - 1:])
        real_b = _flat(real_b_all[:, tG - 1:])
        fake_f = _flat(fake)
        raw_f = _flat(raw) if with_raw else None

        def loss_fn(dparams):
            losses = engine.discriminator_losses(
                dparams, real_a, real_b, fake_f, raw_f, train=True
            )
            return LossEngine.total_d_loss(losses), losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.dparams
        )
        losses = dict(losses)
        losses["D_grad_norm"] = _param_grad_norm(
            {k: v for k, v in grads.items() if k in ("D", "D_f")}
        )
        updates, new_opt_d = d_tx.update(grads, state.opt_d, state.dparams)
        new_dparams = optax.apply_updates(state.dparams, updates)
        return state.replace(dparams=new_dparams, opt_d=new_opt_d), loss, losses

    return d_step


def make_dt_step(engine: LossEngine, opt, dt_tx):
    """Temporal discriminator step factory (one scale per call)."""

    @functools.partial(
        jax.jit, static_argnames=("scale",), donate_argnums=(0,)
    )
    def dt_step(
        state: TrainState,
        real_groups: jax.Array,
        fake_groups: jax.Array,
        flow_groups: jax.Array | None,
        *,
        scale: int,
    ):
        key = f"D_T{scale}"

        def loss_fn(dt_params):
            dparams = dict(state.dparams)
            dparams[key] = dt_params
            losses = engine.temporal_d_losses(
                dparams, scale, real_groups, fake_groups, flow_groups,
                train=True,
            )
            return (losses["D_T_fake"] + losses["D_T_real"]) * 0.5, losses

        (loss, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.dparams[key]
        )
        losses = dict(losses)
        losses["D_T_grad_norm"] = _param_grad_norm({key: grads})
        opt_state = state.opt_dt[scale]
        updates, new_opt = dt_tx.update(grads, opt_state, state.dparams[key])
        new_dt = optax.apply_updates(state.dparams[key], updates)
        new_dparams = dict(state.dparams)
        new_dparams[key] = new_dt
        new_opt_dt = tuple(
            new_opt if i == scale else s for i, s in enumerate(state.opt_dt)
        )
        return (
            state.replace(dparams=new_dparams, opt_dt=new_opt_dt),
            loss,
            losses,
        )

    return dt_step
