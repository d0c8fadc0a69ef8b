"""Standalone FlowNet train/eval harness (reference:
models/flownet2_pytorch/main.py — the vendored trainer vid2vid ships for
(re)training its flow nets).

Provides jitted train/eval steps over any of the component nets with the
multiscale pyramid loss, best-EPE checkpoint tracking, and an inference
loop writing .flo files.
"""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vid2vid_tpu.models.flownet2.flow_io import write_flo
from vid2vid_tpu.models.flownet2.losses import epe, multiscale_flow_loss


class FlowHarness:
    """Train/validate one flow network (FlowNetC/S/SD with train_outputs)."""

    def __init__(self, net, lr: float = 1e-4, div_flow: float = 0.05):
        self.net = net
        self.div_flow = div_flow
        self.tx = optax.adam(lr)
        self._train_step = jax.jit(self._train_step_impl)
        self._eval_step = jax.jit(self._eval_step_impl)

    def init(self, key, height: int = 64, width: int = 64, in_ch: int = 6):
        params = jax.jit(self.net.init)(
            key, jnp.zeros((1, height, width, in_ch))
        )
        return params, self.tx.init(params)

    def _train_step_impl(self, params, opt_state, pair, flow):
        x = jnp.concatenate([pair[:, 0], pair[:, 1]], -1)

        def loss_fn(p):
            flows = self.net.apply(p, x)
            return multiscale_flow_loss(flows, flow, self.div_flow)

        (loss, err), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, err

    def _eval_step_impl(self, params, pair, flow):
        x = jnp.concatenate([pair[:, 0], pair[:, 1]], -1)
        flows = self.net.apply(params, x)
        pred = jax.image.resize(
            flows[0], flow.shape, "bilinear"
        ) / self.div_flow
        return epe(pred, flow)

    def train_epoch(self, params, opt_state, dataset, log_every: int = 50):
        losses = []
        for i in range(len(dataset)):
            pair, flow = dataset[i]
            params, opt_state, loss, err = self._train_step(
                params, opt_state, jnp.asarray(pair)[None], jnp.asarray(flow)[None]
            )
            losses.append(float(err))
            if (i + 1) % log_every == 0:
                print(f"  [{i + 1}/{len(dataset)}] EPE {np.mean(losses[-log_every:]):.3f}")
        return params, opt_state, float(np.mean(losses))

    def validate(self, params, dataset) -> float:
        errs = [
            float(
                self._eval_step(
                    params,
                    jnp.asarray(dataset[i][0])[None],
                    jnp.asarray(dataset[i][1])[None],
                )
            )
            for i in range(len(dataset))
        ]
        return float(np.mean(errs))

    def infer_to_flo(self, params, dataset, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        for i in range(len(dataset)):
            pair, _ = dataset[i]
            x = jnp.concatenate(
                [jnp.asarray(pair[0])[None], jnp.asarray(pair[1])[None]], -1
            )
            flows = jax.jit(self.net.apply)(params, x)
            pred = np.asarray(
                jax.image.resize(
                    flows[0], (1,) + pair[0].shape[:2] + (2,), "bilinear"
                )[0]
            ) / self.div_flow
            write_flo(os.path.join(out_dir, f"{i:06d}.flo"), pred)
