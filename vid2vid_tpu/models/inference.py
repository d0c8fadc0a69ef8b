"""Streaming inference engine (the test.py path).

Reference behavior (reference: models/vid2vid_model_G.py:198-251, test.py):
frames are generated one at a time from a rolling window of tG label maps
and the last tG-1 generated frames; the first tG-1 frames come from one of
the first-frame strategies (zeros / real frames / a single-image generator).

TPU design: two entry points —
  - `generate_clip`: whole-clip scan (maximum throughput; the bench path);
  - `step`: one-frame jitted step with explicit state (true streaming).
Both share the generator's scan body. Optional bfloat16 compute policy:
master params stay f32; params and inputs are cast at the jit boundary.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from vid2vid_tpu.config import Options
from vid2vid_tpu.models.generator import Vid2VidGenerator
from vid2vid_tpu.nn.pix2pixhd import (
    Encoder,
    GlobalGenerator,
    GlobalWithFeatures,
    LocalEnhancer,
)


def cast_pytree(tree, dtype):
    """Cast all floating leaves of a pytree to dtype."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree.map(cast, tree)


def make_single_image_generator(opt: Options):
    """The single-image G used for first frames (reference:
    models/vid2vid_model_G.py:261-288 hard-codes arch by dataset/loadSize).

    Returns (module, needs_features). Cityscapes: GlobalGenerator
    (ngf 64, nd 3/4) or LocalEnhancer at 2048; face: GlobalWithFeatures +
    Encoder for instance features.
    """
    root = opt.dataroot.lower()
    if "city" in root:
        if opt.loadSize == 512:
            return GlobalGenerator(ngf=64, n_downsampling=3, norm="instance"), False
        if opt.loadSize == 1024:
            return GlobalGenerator(ngf=64, n_downsampling=4, norm="instance"), False
        if opt.loadSize == 2048:
            return (
                LocalEnhancer(ngf=32, n_downsample_global=4, norm="instance"),
                False,
            )
        raise ValueError(f"no single-image generator for loadSize {opt.loadSize}")
    if "face" in root:
        return (
            GlobalWithFeatures(feat_num=16, ngf=64, n_downsampling=3, norm="instance"),
            True,
        )
    raise ValueError(f"no single-image generator for dataroot {opt.dataroot!r}")


class InferenceEngine:
    """Functional inference wrapper around Vid2VidGenerator."""

    def __init__(self, opt: Options):
        self.opt = opt
        self.gen = Vid2VidGenerator(opt)
        self.compute_dtype = jnp.bfloat16 if (opt.bf16 or opt.fp16) else jnp.float32
        self._clip_fn = None
        self._clip_raw_fn = None
        self._step_fn = None
        # --n_devices > 1: width-shard activations over a 'model' mesh for
        # multi-chip serving (params/state replicated; GSPMD inserts conv
        # halo exchanges — equivalence proven in tests/test_parallel.py).
        # The reference's analog is the G/D device split + DataParallel
        # (models/models.py:10-59); here one chip holds the params and the
        # frame is cut along width across chips.
        self.mesh = None
        if getattr(opt, "n_devices", 1) > 1:
            from vid2vid_tpu.parallel.mesh import make_mesh

            n = min(opt.n_devices, len(jax.devices()))
            if n > 1:
                self.mesh = make_mesh(n, data=1)

    def _shard_width(self, x, width_axis):
        """Place an activation with its width axis sharded over 'model'."""
        if self.mesh is None or x is None:
            return x
        from vid2vid_tpu.parallel.mesh import batch_sharding

        return jax.device_put(
            x, batch_sharding(self.mesh, x.ndim, width_axis, batch_axis=None)
        )

    # ------------------------------------------------------------------ init

    def init(self, key: jax.Array, batch: int, height: int, width: int):
        return jax.jit(
            lambda k: self.gen.init(k, batch, height, width)
        )(key)

    # ---------------------------------------------------------------- encode

    def encode(self, labels, inst=None):
        return self.gen.encode_input(labels, inst)

    # ------------------------------------------------------------- first frame

    def initial_state(
        self,
        batch: int,
        height: int,
        width: int,
        real_frames: jax.Array | None = None,
        single_g_frames: jax.Array | None = None,
    ):
        """Seed state per the first-frame strategy.

        Priority: explicit single-G frames > real frames > zeros
        (reference: models/vid2vid_model_G.py:231-246).
        """
        tG = self.opt.n_frames_G
        if single_g_frames is not None:
            return self.gen.state_from_frames(single_g_frames)
        if real_frames is not None:
            return self.gen.state_from_frames(real_frames[:, : tG - 1])
        return self.gen.zero_state(batch, height, width)

    # ------------------------------------------------------------------ clip

    def generate_clip(self, params, enc_a, state, use_raw_only=False):
        """(B, T+tG-1, H, W, C) encoded labels -> (ClipOutputs, new state)."""
        if self._clip_fn is None:
            dt = self.compute_dtype

            @partial(jax.jit, static_argnames=("use_raw_only",))
            def fn(params, enc_a, state, use_raw_only):
                params = cast_pytree(params, dt)
                enc_a = enc_a.astype(dt)
                state = cast_pytree(state, dt)
                outs, new_state = self.gen.generate_clip(
                    params, enc_a, state, use_raw_only=use_raw_only, train=False
                )
                return (
                    jax.tree.map(lambda x: x.astype(jnp.float32), outs),
                    new_state,
                )

            self._clip_fn = fn
        enc_a = self._shard_width(enc_a, 3)
        return self._clip_fn(params, enc_a, state, use_raw_only)

    def _ensure_clip_raw_fn(self):
        """Build (or return) the jitted raw-label clip fn — exposed so tests
        can AOT-lower it with sharded ShapeDtypeStructs (GSPMD halo checks
        at full resolution without materializing full-res arrays)."""
        if self._clip_raw_fn is None:
            dt = self.compute_dtype

            @partial(jax.jit, static_argnames=("use_raw_only", "has_inst"))
            def fn(params, labels, inst, state, use_raw_only, has_inst):
                params = cast_pytree(params, dt)
                state = cast_pytree(state, dt)
                outs, new_state = self.gen.generate_clip_streaming(
                    params, labels, inst if has_inst else None, state,
                    use_raw_only=use_raw_only, compute_dtype=dt,
                )
                return (
                    jax.tree.map(lambda x: x.astype(jnp.float32), outs),
                    new_state,
                )

            self._clip_raw_fn = fn
        return self._clip_raw_fn

    def generate_clip_raw(self, params, labels, inst, state, use_raw_only=False):
        """Clip from RAW labels/instances — encodes inside the scan.

        Preferred serving path at high resolution: the clip-wide one-hot
        pyramid is never materialized (see generate_clip_streaming).
        """
        self._ensure_clip_raw_fn()
        has_inst = inst is not None
        labels = self._shard_width(labels, 3)
        if inst is None:
            inst = jnp.zeros((1,), jnp.int32)  # placeholder, unused when has_inst=False
        else:
            inst = self._shard_width(inst, 3)
        return self._clip_raw_fn(params, labels, inst, state, use_raw_only, has_inst)

    # ------------------------------------------------------------------ step

    def _ensure_step_fn(self):
        """Build (or return) the jitted one-frame step fn (see
        _ensure_clip_raw_fn for why this is a separate method)."""
        if self._step_fn is None:
            dt = self.compute_dtype

            @partial(jax.jit, static_argnames=("use_raw_only",))
            def fn(params, labels_window, inst_window, state, use_raw_only):
                enc = self.gen.encode_input(labels_window, inst_window)
                params = cast_pytree(params, dt)
                enc = enc.astype(dt)
                state = cast_pytree(state, dt)
                outs, new_state = self.gen.generate_clip(
                    params, enc, state,
                    use_raw_only=use_raw_only, train=False,
                )
                return outs.fake[:, 0].astype(jnp.float32), new_state

            self._step_fn = fn
        return self._step_fn

    def step(self, params, labels_window, inst_window, state, use_raw_only=False):
        """One frame from a raw (B, tG, H, W[, C]) label window + state.

        Encoding (one-hot, instance edges) happens inside the jit — every
        eager op is a round trip on remote-device platforms.
        """
        self._ensure_step_fn()
        labels_window = self._shard_width(labels_window, 3)
        inst_window = self._shard_width(inst_window, 3)
        return self._step_fn(params, labels_window, inst_window, state, use_raw_only)

    def seed_state(self, frames):
        """Jitted state_from_frames (pyramid build) for sequence starts."""
        if not hasattr(self, "_seed_fn") or self._seed_fn is None:
            self._seed_fn = jax.jit(self.gen.state_from_frames)
        return self._seed_fn(frames)

    # ------------------------------------------------------ single-image G

    def build_single_g(self, sg_cfg: dict | None = None):
        """Instantiate the single-image first-frame generator for this opt.

        sg_cfg optionally overrides the hard-coded published dims (the
        reference registry, vid2vid_model_G.py:261-288) with
        {'feat_num', 'g': {ngf, nd, nb, norm}, 'e': {out_nc, ngf, nd, norm}}
        — used by tools/verify_published's shrunk fabricated-checkpoint CI.
        """
        if sg_cfg is not None:
            g = sg_cfg["g"]
            self._single_g = GlobalWithFeatures(
                feat_num=sg_cfg["feat_num"], ngf=g["ngf"],
                n_downsampling=g["nd"], n_blocks=g.get("nb", 9),
                norm=g["norm"],
            )
            self._single_needs_feat = True
            e = sg_cfg["e"]
            self._encoder = Encoder(
                output_nc=e["out_nc"], ngf=e["ngf"], n_downsampling=e["nd"],
                norm=e["norm"],
            )
            return self._single_g
        self._single_g, self._single_needs_feat = make_single_image_generator(
            self.opt
        )
        if self._single_needs_feat:
            self._encoder = Encoder(
                output_nc=16, ngf=16, n_downsampling=4, norm="instance"
            )
        return self._single_g

    def single_g_first_frames(
        self,
        params_i,
        enc_first: jax.Array,
        real_first: jax.Array | None = None,
        pool_map: jax.Array | None = None,
        encoder_params=None,
        feature_clusters: dict | None = None,
    ):
        """Generate the first tG-1 frames with the single-image generator.

        enc_first: (B, tG-1, H, W, C) encoded label maps (one-hot only, no
        instance channel — reference strips it, vid2vid_model_G.py:239-240).
        Face mode additionally retrieves per-part feature maps from the
        nearest training cluster (reference: vid2vid_model_G.py:290-320).
        """
        tG = self.opt.n_frames_G
        frames = []
        apply_g = jax.jit(lambda p, x, f: self._single_g.apply(p, x, f))
        for i in range(tG - 1):
            x = enc_first[:, i]
            if self.opt.label_nc > 0 and self.opt.use_instance:
                x = x[..., : self.opt.label_nc]
            feat = None
            if self._single_needs_feat:
                feat = self.face_features(
                    encoder_params, real_first[:, i], pool_map[:, i],
                    feature_clusters,
                )
            frames.append(apply_g(params_i, x, feat))
        return self.gen.state_from_frames(jnp.stack(frames, axis=1))

    def face_features(
        self, encoder_params, real_image, inst, feature_clusters: dict
    ):
        """Instance features snapped to the nearest training image's clusters.

        Reference (models/vid2vid_model_G.py:290-320 + dists_min,
        base_model.py:136-144): encode the real image, take the encoding at
        the FIRST pixel of each facial part, then pick ONE training-image
        index by the squared distance summed JOINTLY over all parts and
        feature dims (`dists_min` reduces dims 0 and 1 — a single argmin
        shared by every part, not per-part), and fill each part's region
        with that image's centroid row (index clamped per part).

        Reference quirk not reproduced: `feat_ori = torch.FloatTensor(...)`
        is UNINITIALIZED, so parts absent from `inst` contribute garbage
        rows to the distance sum; here absent parts contribute nothing —
        identical whenever all parts are present (the normal case for the
        face part maps).
        """
        feat_num = int(
            np.asarray(next(iter(feature_clusters.values()))).shape[1] - 1
        )
        enc = jax.jit(
            lambda p, x, i: self._encoder.apply(p, x, i)
        )(encoder_params, real_image, inst)
        enc_np = np.asarray(enc)
        inst_np = np.asarray(inst).astype(int)
        out = np.zeros(
            (inst_np.shape[0],) + inst_np.shape[1:3] + (feat_num,), np.float32
        )
        present = [
            int(l) for l in np.unique(inst_np) if int(l) in feature_clusters
        ]
        if not present:
            return jnp.asarray(out)
        num_images = min(
            np.asarray(feature_clusters[l]).shape[0] for l in present
        )
        dists = np.zeros((num_images,), np.float64)
        firsts = {}
        for label in present:
            mask = inst_np[0] == label
            yx = np.argwhere(mask)[0]  # first pixel, row-major (torch idx[0])
            firsts[label] = mask
            feat_ori = enc_np[0, yx[0], yx[1], :feat_num]
            ref = np.asarray(feature_clusters[label])[:num_images, :feat_num]
            dists += ((ref - feat_ori) ** 2).sum(-1)
        best = int(np.argmin(dists))
        for label in present:
            clusters = np.asarray(feature_clusters[label])  # (n, feat_num+1)
            out[0][firsts[label]] = clusters[
                min(best, len(clusters) - 1), :feat_num
            ]
        return jnp.asarray(out)
