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

    def __init__(
        self, net, lr: float = 1e-4, div_flow: float = 0.05,
        mixed_precision: bool = False,
    ):
        """mixed_precision: bf16 forward with f32 master params — the TPU
        analog of the reference's fp16 path, which keeps an fp32 master
        copy of the params (reference: flownet2_pytorch/main.py:278-289);
        bf16's range makes the reference's loss scaling unnecessary."""
        self.net = net
        self.div_flow = div_flow
        self.compute_dtype = jnp.bfloat16 if mixed_precision else jnp.float32
        self.tx = optax.adam(lr)
        self._train_step = jax.jit(self._train_step_impl)
        self._eval_step = jax.jit(self._eval_step_impl)

    def init(self, key, height: int = 64, width: int = 64, in_ch: int = 6):
        params = jax.jit(self.net.init)(
            key, jnp.zeros((1, height, width, in_ch))
        )
        return params, self.tx.init(params)

    def _train_step_impl(self, params, opt_state, pair, flow):
        x = jnp.concatenate([pair[:, 0], pair[:, 1]], -1).astype(
            self.compute_dtype
        )

        def loss_fn(p):
            if self.compute_dtype != jnp.float32:
                p = jax.tree.map(
                    lambda a: a.astype(self.compute_dtype)
                    if jnp.issubdtype(a.dtype, jnp.floating) else a,
                    p,
                )
            flows = self.net.apply(p, x)
            flows = [f.astype(jnp.float32) for f in flows]
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

    # ------------------------------------------------------------ checkpoints

    def save_checkpoint(
        self, params, opt_state, epoch: int, best_epe: float,
        save_dir: str, prefix: str = "flownet", is_best: bool = False,
    ):
        """Persist train state; mirror to `<prefix>_model_best` on a new best
        EPE (reference: flownet2_pytorch/utils/tools.py:137-142)."""
        import orbax.checkpoint as ocp

        payload = {
            "params": params,
            "opt_state": opt_state,
            "epoch": epoch,
            "best_epe": float(best_epe),
        }
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(
            os.path.abspath(os.path.join(save_dir, f"{prefix}_checkpoint")),
            payload, force=True,
        )
        if is_best:
            ckpt.save(
                os.path.abspath(os.path.join(save_dir, f"{prefix}_model_best")),
                payload, force=True,
            )

    def restore_checkpoint(
        self, params, opt_state, save_dir: str, prefix: str = "flownet",
        best: bool = False,
    ):
        """Returns (params, opt_state, epoch, best_epe) from the latest (or
        best) snapshot, using the given trees as the restore template."""
        import orbax.checkpoint as ocp

        tag = f"{prefix}_model_best" if best else f"{prefix}_checkpoint"
        template = {
            "params": params, "opt_state": opt_state,
            "epoch": 0, "best_epe": 0.0,
        }
        payload = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(os.path.join(save_dir, tag)), item=template
        )
        return (
            payload["params"], payload["opt_state"],
            int(payload["epoch"]), float(payload["best_epe"]),
        )

    def fit(
        self, params, opt_state, train_ds, val_ds, n_epochs: int,
        save_dir: str | None = None, prefix: str = "flownet",
        log_every: int = 50,
    ):
        """Epoch loop with per-epoch validation and best-EPE tracking
        (reference: flownet2_pytorch/main.py:406-423).

        Returns (params, opt_state, best_epe).
        """
        best_epe = float("inf")
        for epoch in range(1, n_epochs + 1):
            t0 = time.time()
            params, opt_state, train_epe = self.train_epoch(
                params, opt_state, train_ds, log_every=log_every
            )
            val_epe = self.validate(params, val_ds)
            is_best = val_epe < best_epe
            best_epe = min(best_epe, val_epe)
            print(
                f"epoch {epoch}/{n_epochs}: train EPE {train_epe:.3f}, "
                f"val EPE {val_epe:.3f}{' (best)' if is_best else ''} "
                f"[{time.time() - t0:.0f}s]"
            )
            if save_dir is not None:
                self.save_checkpoint(
                    params, opt_state, epoch, best_epe, save_dir, prefix,
                    is_best=is_best,
                )
        return params, opt_state, best_epe

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
