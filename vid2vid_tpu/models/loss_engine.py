"""The GAN loss engine (Vid2VidModelD equivalent).

Owns the spatial multiscale PatchGAN, the optional face discriminator, the
per-scale temporal discriminators, and the VGG network, and computes the
reference's full loss set (reference: models/vid2vid_model_D.py:93-213):

  G side: G_VGG (fake and raw), G_GAN, G_GAN_Feat, G_Warp, F_Flow, F_Warp,
          W, [G_f_GAN, G_f_GAN_Feat], per-temporal-scale G_T_GAN/G_T_GAN_Feat
  D side: D_real, D_fake, [D_f_*], per-scale D_T_real/D_T_fake

JAX split: `generator_losses` treats discriminator params as constants (the
caller differentiates w.r.t. generator params only), `discriminator_losses`
takes pre-generated frames as constants. This reproduces the reference's
three optimizer groups without its retain-graph bookkeeping.

`train=True` applies the discriminators with per-batch norm statistics —
the reference's D modules are in train() mode during training, so their
BatchNorm layers normalize each forward with the current batch's stats
(reference: models/networks.py:688-707 norm_layer default BatchNorm2d;
train.py never calls eval() on the Ds). Running stats are not updated
inside the jitted loss (the reference's running-stat updates never affect
train-time forwards or gradients). Consequence for checkpoints: a saved D
carries its INIT running stats (mean 0 / var 1), so any future eval-mode
(train=False) D forward — exported Ds, eval metrics — would normalize
with init stats and diverge from a torch-trained D; refresh with one
mutable=['batch_stats'] pass first (documented on the save path,
train/checkpoints.py::save_checkpoint).

All frame tensors arrive flattened over time — (B*T, H, W, C) — matching
the reference's `reshape` before the D call (reference: train.py:140-145).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from vid2vid_tpu.config import Options
from vid2vid_tpu.losses import (
    feature_matching_loss,
    gan_loss,
    masked_l1,
    vgg_loss,
)
from vid2vid_tpu.nn.discriminator import MultiscaleDiscriminator
from vid2vid_tpu.nn.vgg import Vgg19Features
from vid2vid_tpu.ops.warp import flow_warp


class LossEngine:
    def __init__(self, opt: Options):
        self.opt = opt
        input_nc = opt.label_nc if opt.label_nc != 0 else opt.input_nc
        if opt.use_instance:
            input_nc += 1
        self.d_input_nc = input_nc + opt.output_nc
        interm = not opt.no_ganFeat

        self.netD = MultiscaleDiscriminator(
            opt.ndf, opt.n_layers_D, opt.norm, opt.num_D, interm
        )
        self.netD_f = (
            MultiscaleDiscriminator(
                opt.ndf, opt.n_layers_D, opt.norm, max(1, opt.num_D - 2), interm
            )
            if opt.add_face_disc
            else None
        )
        td = opt.n_frames_D
        self.dt_input_nc = opt.output_nc * td + 2 * (td - 1)
        self.netD_T = [
            MultiscaleDiscriminator(
                opt.ndf, opt.n_layers_D, opt.norm, opt.num_D, interm
            )
            for _ in range(opt.n_scales_temporal)
        ]
        self.vgg = None if opt.no_vgg else Vgg19Features()

    # ------------------------------------------------------------------ init

    def init(self, key: jax.Array, height: int, width: int) -> dict[str, Any]:
        opt = self.opt
        keys = jax.random.split(key, 3 + len(self.netD_T))
        params: dict[str, Any] = {}
        dx = jnp.zeros((1, height, width, self.d_input_nc))
        params["D"] = self.netD.init(keys[0], dx)
        if self.netD_f is not None:
            face = opt.fineSize // 32 * 8
            params["D_f"] = self.netD_f.init(
                keys[1], jnp.zeros((1, face, face, self.d_input_nc))
            )
        tx = jnp.zeros((1, height, width, self.dt_input_nc))
        for s, net in enumerate(self.netD_T):
            params[f"D_T{s}"] = net.init(keys[3 + s], tx)
        if self.vgg is not None:
            params["vgg"] = self.vgg.init(
                keys[2], jnp.zeros((1, height, width, 3))
            )
        return params

    # ----------------------------------------------------------- primitives

    def _vgg_apply(self, vgg_params, x):
        return self.vgg.apply(vgg_params, x)

    def _gan_and_fm(self, pred_fake, pred_real):
        opt = self.opt
        g_gan = gan_loss(pred_fake, True, opt.gan_mode, for_discriminator=False)
        g_fm = jnp.zeros(())
        if not opt.no_ganFeat:
            g_fm = feature_matching_loss(
                pred_fake, pred_real, opt.num_D, opt.n_layers_D, opt.lambda_feat
            )
        return g_gan, g_fm

    def face_region(self, real_a: jax.Array):
        """Fixed-size face bbox from pose conditioning (reference:
        models/vid2vid_model_D.py:215-230): densepose channel 2 > 0.9, or an
        openpose color key; returns (found, y_start, x_start) with a static
        (fineSize//32*8)^2 crop window."""
        opt = self.opt
        h, w = real_a.shape[1], real_a.shape[2]
        size = opt.fineSize // 32 * 8
        if not opt.openpose_only:
            mask = real_a[..., 2] > 0.9
        else:
            r, g, b = real_a[..., 0], real_a[..., 1], real_a[..., 2]
            mask = (
                (r > 0.19) & (r < 0.21) & (g < -0.99) & (b > -0.61) & (b < -0.59)
            )
        found = jnp.any(mask)
        ys_i = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
        xs_i = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 2)
        big = jnp.iinfo(jnp.int32).max
        ys = jnp.min(jnp.where(mask, ys_i, big))
        ye = jnp.max(jnp.where(mask, ys_i, -1))
        xs = jnp.min(jnp.where(mask, xs_i, big))
        xe = jnp.max(jnp.where(mask, xs_i, -1))
        yc = jnp.clip((ys + ye) // 2, size // 2, h - 1 - size // 2)
        xc = jnp.clip((xs + xe) // 2, size // 2, w - 1 - size // 2)
        return found, yc - size // 2, xc - size // 2

    def _crop_face(self, x, y0, x0):
        size = self.opt.fineSize // 32 * 8
        return jax.lax.dynamic_slice(
            x, (0, y0, x0, 0), (x.shape[0], size, size, x.shape[3])
        )

    # -------------------------------------------------------------- G losses

    def generator_losses(
        self,
        params,
        real_a,
        real_b,
        fake_b,
        fake_b_raw,
        real_b_prev,
        fake_b_prev,
        flow,
        weight,
        flow_ref,
        conf_ref,
        train: bool = False,
    ) -> dict[str, jax.Array]:
        """All generator-side spatial losses; D/VGG params held constant.

        Shapes: every tensor (B*T, H, W, C); flow/weight may be None.
        """
        opt = self.opt
        zero = jnp.zeros(())
        losses: dict[str, jax.Array] = {}

        # flow supervision (reference: vid2vid_model_D.py:118-132)
        if flow is not None:
            losses["F_Flow"] = (
                masked_l1(flow, flow_ref, conf_ref)
                * opt.lambda_F
                / (2 ** (opt.n_scales_spatial - 1))
            )
            real_b_warp = flow_warp(real_b_prev, flow)
            losses["F_Warp"] = (
                masked_l1(real_b_warp, real_b, conf_ref) * opt.lambda_T
            )
            if opt.no_first_img:
                losses["W"] = masked_l1(weight, jnp.zeros_like(weight), conf_ref)
            else:
                losses["W"] = zero
        else:
            losses["F_Flow"] = losses["F_Warp"] = losses["W"] = zero

        # VGG perceptual on blended and raw frames
        if self.vgg is not None:
            vgg_p = jax.lax.stop_gradient(params["vgg"])
            losses["G_VGG"] = (
                vgg_loss(self._vgg_apply, vgg_p, fake_b, real_b) * opt.lambda_feat
            )
            if fake_b_raw is not None:
                losses["G_VGG"] = losses["G_VGG"] + (
                    vgg_loss(self._vgg_apply, vgg_p, fake_b_raw, real_b)
                    * opt.lambda_feat
                )
        else:
            losses["G_VGG"] = zero

        # GAN + feature matching (live fake; D params constant to the caller)
        d_params = jax.lax.stop_gradient(params["D"])
        pred_real = self.netD.apply(
            d_params, jnp.concatenate([real_a, real_b], -1), train
        )
        pred_fake = self.netD.apply(
            d_params, jnp.concatenate([real_a, fake_b], -1), train
        )
        g_gan, g_fm = self._gan_and_fm(pred_fake, pred_real)
        if fake_b_raw is not None:
            pred_fake_raw = self.netD.apply(
                d_params, jnp.concatenate([real_a, fake_b_raw], -1), train
            )
            g2, f2 = self._gan_and_fm(pred_fake_raw, pred_real)
            g_gan, g_fm = g_gan + g2, g_fm + f2
        losses["G_GAN"], losses["G_GAN_Feat"] = g_gan, g_fm

        # warp-consistency against the FlowNet reference flow
        warp_ref = jax.lax.stop_gradient(flow_warp(fake_b_prev, flow_ref))
        losses["G_Warp"] = masked_l1(fake_b, warp_ref, conf_ref) * opt.lambda_T

        if self.netD_f is not None:
            losses.update(
                self._face_g_losses(params, real_a, real_b, fake_b, train)
            )
        return losses

    def _face_g_losses(self, params, real_a, real_b, fake_b, train=False):
        found, y0, x0 = self.face_region(real_a)
        df_params = jax.lax.stop_gradient(params["D_f"])

        def compute(_):
            ra = self._crop_face(real_a, y0, x0)
            rb = self._crop_face(real_b, y0, x0)
            fb = self._crop_face(fake_b, y0, x0)
            pr = self.netD_f.apply(df_params, jnp.concatenate([ra, rb], -1), train)
            pf = self.netD_f.apply(df_params, jnp.concatenate([ra, fb], -1), train)
            g, f = self._gan_and_fm(pf, pr)
            return g * 2.0, f * 2.0  # face_weight = 2

        def zeros(_):
            return jnp.zeros(()), jnp.zeros(())

        g, f = jax.lax.cond(found, compute, zeros, None)
        return {"G_f_GAN": g, "G_f_GAN_Feat": f}

    # -------------------------------------------------------------- D losses

    def discriminator_losses(
        self, params, real_a, real_b, fake_b, fake_b_raw, train: bool = False
    ) -> dict[str, jax.Array]:
        """D-side losses on detached fakes (caller differentiates w.r.t. D)."""
        opt = self.opt
        fake_b = jax.lax.stop_gradient(fake_b)
        pred_real = self.netD.apply(
            params["D"], jnp.concatenate([real_a, real_b], -1), train
        )
        pred_fake = self.netD.apply(
            params["D"], jnp.concatenate([real_a, fake_b], -1), train
        )
        d_real = gan_loss(pred_real, True, opt.gan_mode)
        d_fake = gan_loss(pred_fake, False, opt.gan_mode)
        if fake_b_raw is not None:
            raw = jax.lax.stop_gradient(fake_b_raw)
            pred_fr = self.netD.apply(
                params["D"], jnp.concatenate([real_a, raw], -1), train
            )
            d_real = d_real + gan_loss(pred_real, True, opt.gan_mode)
            d_fake = d_fake + gan_loss(pred_fr, False, opt.gan_mode)
        losses = {"D_real": d_real, "D_fake": d_fake}

        if self.netD_f is not None:
            found, y0, x0 = self.face_region(real_a)

            def compute(_):
                ra = self._crop_face(real_a, y0, x0)
                rb = self._crop_face(real_b, y0, x0)
                fb = self._crop_face(fake_b, y0, x0)
                pr = self.netD_f.apply(
                    params["D_f"], jnp.concatenate([ra, rb], -1), train
                )
                pf = self.netD_f.apply(
                    params["D_f"], jnp.concatenate([ra, fb], -1), train
                )
                return (
                    gan_loss(pr, True, opt.gan_mode),
                    gan_loss(pf, False, opt.gan_mode),
                )

            def zeros(_):
                return jnp.zeros(()), jnp.zeros(())

            dfr, dff = jax.lax.cond(found, compute, zeros, None)
            losses["D_f_real"], losses["D_f_fake"] = dfr, dff
        return losses

    # ------------------------------------------------------- temporal losses

    def _dt_input(self, frames, flow_ref):
        """(G, tD, H, W, 3) frames + (G, tD-1, H, W, 2) flows -> stacked input."""
        g, td = frames.shape[0], frames.shape[1]
        h, w = frames.shape[2], frames.shape[3]
        x = jnp.transpose(frames, (0, 2, 3, 1, 4)).reshape(g, h, w, -1)
        if flow_ref is not None:
            f = jnp.transpose(flow_ref / 20.0, (0, 2, 3, 1, 4)).reshape(g, h, w, -1)
            x = jnp.concatenate([x, f], -1)
        return x

    def temporal_g_losses(
        self, params, scale_t, real_groups, fake_groups, flow_ref_groups,
        train: bool = False,
    ):
        dt_params = jax.lax.stop_gradient(params[f"D_T{scale_t}"])
        net = self.netD_T[scale_t]
        pr = net.apply(
            dt_params, self._dt_input(real_groups, flow_ref_groups), train
        )
        pf = net.apply(
            dt_params, self._dt_input(fake_groups, flow_ref_groups), train
        )
        g, f = self._gan_and_fm(pf, pr)
        return {
            f"G_T_GAN": g,
            f"G_T_GAN_Feat": f,
            f"G_T_Warp": jnp.zeros(()),
        }

    def temporal_d_losses(
        self, params, scale_t, real_groups, fake_groups, flow_ref_groups,
        train: bool = False,
    ):
        opt = self.opt
        net = self.netD_T[scale_t]
        fake_groups = jax.lax.stop_gradient(fake_groups)
        pr = net.apply(
            params[f"D_T{scale_t}"],
            self._dt_input(real_groups, flow_ref_groups),
            train,
        )
        pf = net.apply(
            params[f"D_T{scale_t}"],
            self._dt_input(fake_groups, flow_ref_groups),
            train,
        )
        return {
            "D_T_real": gan_loss(pr, True, opt.gan_mode),
            "D_T_fake": gan_loss(pf, False, opt.gan_mode),
        }

    # ------------------------------------------------------------- aggregate

    @staticmethod
    def total_g_loss(losses: dict, t_losses: list[dict]) -> jax.Array:
        """loss_G per the reference aggregation (vid2vid_model_D.py:249-264)."""
        total = (
            losses["G_GAN"]
            + losses["G_GAN_Feat"]
            + losses["G_VGG"]
            + losses["G_Warp"]
            + losses["F_Flow"]
            + losses["F_Warp"]
            + losses["W"]
        )
        if "G_f_GAN" in losses:
            total = total + losses["G_f_GAN"] + losses["G_f_GAN_Feat"]
        for tl in t_losses:
            total = total + tl["G_T_GAN"] + tl["G_T_GAN_Feat"] + tl["G_T_Warp"]
        return total

    @staticmethod
    def total_d_loss(losses: dict) -> jax.Array:
        total = (losses["D_fake"] + losses["D_real"]) * 0.5
        if "D_f_fake" in losses:
            total = total + (losses["D_f_fake"] + losses["D_f_real"]) * 0.5
        return total
