"""Serialized serving artifact for the streaming generator (jax.export).

Packages the one-frame inference step — (params, label window, instance
window, recurrent state) -> (frame, next state) — as a portable StableHLO
artifact plus a params archive, so a serving process can run the model
without the Python model definition (deploy-time analog of the
reference's test.py checkpoint loading; reference: test.py:15-54,
vid2vid_model_G.py:198-229).

    # build + save
    python -m vid2vid_tpu.tools.export --name label2city_512 --label_nc 35 \
        --loadSize 512 --out exported/label2city_512

    # load + serve
    from vid2vid_tpu.tools.export import load_exported
    step = load_exported("exported/label2city_512")
    frame, state = step(labels_window, inst_window, state)  # state=None first

The artifact directory contains:
  step.hlo    — jax.export serialization of the jitted step (includes the
                input tree structure and shapes)
  params.npz  — flattened parameter leaves
  meta.json   — state/params treedefs (jax.tree flattened order), shapes,
                and the Options fields needed to rebuild initial state
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def build_exported(opt, params, batch: int, height: int, width: int):
    """jax.export the one-frame step; returns (Exported, state0, treedefs)."""
    from vid2vid_tpu.models.inference import InferenceEngine, cast_pytree

    eng = InferenceEngine(opt)
    state0 = eng.initial_state(batch, height, width)
    state_leaves, state_def = jax.tree.flatten(state0)
    params_leaves, params_def = jax.tree.flatten(params)
    n_state = len(state_leaves)
    tg = opt.n_frames_G
    dt = eng.compute_dtype

    def step_flat(*args):
        p_leaves = args[:len(params_leaves)]
        labels, inst = args[len(params_leaves):len(params_leaves) + 2]
        s_leaves = args[len(params_leaves) + 2:]
        p = jax.tree.unflatten(params_def, list(p_leaves))
        s = jax.tree.unflatten(state_def, list(s_leaves))
        enc = eng.gen.encode_input(labels, inst if opt.use_instance else None)
        outs, new_state = eng.gen.generate_clip(
            cast_pytree(p, dt), enc.astype(dt), cast_pytree(s, dt),
            use_raw_only=False, train=False,
        )
        # state round-trips through the fixed exported signature: cast the
        # compute-dtype carry back to the initial-state dtypes
        new_leaves = tuple(
            leaf.astype(ref.dtype)
            for leaf, ref in zip(jax.tree.leaves(new_state), state_leaves)
        )
        return (outs.fake[:, 0].astype(jnp.float32),) + new_leaves

    label_spec = jax.ShapeDtypeStruct((batch, tg, height, width), jnp.int32)
    arg_specs = (
        tuple(jax.ShapeDtypeStruct(x.shape, x.dtype) for x in params_leaves)
        + (label_spec, label_spec)
        + tuple(jax.ShapeDtypeStruct(x.shape, x.dtype) for x in state_leaves)
    )
    exported = jax.export.export(jax.jit(step_flat))(*arg_specs)
    return exported, state0, (params_def, state_def, n_state)


def save_exported(out_dir: str, opt, params, batch, height, width) -> None:
    exported, state0, (params_def, state_def, n_state) = build_exported(
        opt, params, batch, height, width
    )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "step.hlo"), "wb") as fh:
        fh.write(exported.serialize())
    leaves = [np.asarray(x) for x in jax.tree.leaves(params)]
    np.savez(
        os.path.join(out_dir, "params.npz"),
        **{f"p{i}": leaf for i, leaf in enumerate(leaves)},
    )
    state_leaves = [np.asarray(x) for x in jax.tree.leaves(state0)]
    np.savez(
        os.path.join(out_dir, "state0.npz"),
        **{f"s{i}": leaf for i, leaf in enumerate(state_leaves)},
    )
    meta = {
        "n_params": len(leaves),
        "n_state": n_state,
        "batch": batch,
        "height": height,
        "width": width,
        "n_frames_G": opt.n_frames_G,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as fh:
        json.dump(meta, fh, indent=1)


def load_exported(out_dir: str):
    """Rebuild the serving step from an artifact directory.

    Returns `step(labels_window, inst_window, state=None) -> (frame, state)`
    where state is an opaque tuple carried between calls (None resets).
    """
    with open(os.path.join(out_dir, "meta.json")) as fh:
        meta = json.load(fh)
    with open(os.path.join(out_dir, "step.hlo"), "rb") as fh:
        exported = jax.export.deserialize(fh.read())
    pz = np.load(os.path.join(out_dir, "params.npz"))
    params = tuple(jnp.asarray(pz[f"p{i}"]) for i in range(meta["n_params"]))
    sz = np.load(os.path.join(out_dir, "state0.npz"))
    state0 = tuple(jnp.asarray(sz[f"s{i}"]) for i in range(meta["n_state"]))

    def step(labels_window, inst_window, state=None):
        s = state0 if state is None else state
        outs = exported.call(
            *params, jnp.asarray(labels_window, jnp.int32),
            jnp.asarray(inst_window, jnp.int32), *s,
        )
        return outs[0], tuple(outs[1:])

    return step


def main(argv=None) -> None:
    import argparse
    import sys

    from vid2vid_tpu.config import parse_args

    argv = list(sys.argv[1:] if argv is None else argv)
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--out", default=None)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--width", type=int, default=None)
    own, rest = ap.parse_known_args(argv)
    opt = parse_args(rest, is_train=False, save=False)
    out = own.out or os.path.join("exported", opt.name)
    width = own.width or opt.loadSize
    height = own.height or width // 2

    from vid2vid_tpu.models.inference import InferenceEngine
    from vid2vid_tpu.train.checkpoints import checkpoint_exists, restore_params

    eng = InferenceEngine(opt)
    params = eng.init(jax.random.key(0), own.batch, height, width)
    tag = f"G_{opt.which_epoch}"
    if checkpoint_exists(opt, tag):
        params = restore_params(opt, params, tag)
    else:
        print(
            f"WARNING: no checkpoint {tag!r} under {opt.checkpoints_dir}/"
            f"{opt.name} — exporting randomly initialized params",
        )
    save_exported(out, opt, params, own.batch, height, width)
    print(f"exported serving artifact -> {out}")


if __name__ == "__main__":
    main()
