"""Inference CLI — the reference test.py equivalent.

Streams a test dataset frame-by-frame through the sequential generator,
resetting state on sequence changes, and writes real_A / fake_B images to
results/<name>/<phase>_<epoch>/ (reference: test.py:15-54).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from vid2vid_tpu.config import parse_args
    from vid2vid_tpu.data.loader import create_dataset
    from vid2vid_tpu.models.inference import InferenceEngine
    from vid2vid_tpu.train.checkpoints import checkpoint_exists, restore_params
    from vid2vid_tpu.utils.images import label_to_color, to_image
    from vid2vid_tpu.utils.visualizer import Visualizer

    opt = parse_args(argv, is_train=False, save=False)
    opt = opt.replace(
        phase="test" if opt.phase == "train" else opt.phase,
        nThreads=1, serial_batches=True, no_flip=True, isTrain=False,
        dataset_mode="test" if opt.dataset_mode == "temporal" else opt.dataset_mode,
    )

    eng = InferenceEngine(opt)
    visualizer = Visualizer(opt)
    save_dir = os.path.join(
        opt.results_dir, opt.name, f"{opt.phase}_{opt.which_epoch}"
    )
    os.makedirs(save_dir, exist_ok=True)

    stream = create_dataset(opt)
    params = None
    state = None
    window = []  # rolling tG-frame label window
    tG = opt.n_frames_G
    count = 0

    for item in stream:
        if count >= opt.how_many:
            break
        a = item["A"]
        if item["change_seq"] or params is None:
            h, w = a.shape[0], a.shape[1] if a.ndim >= 2 else None
            h, w = a.shape[:2]
            if params is None:
                params = _load_params(opt, eng, h, w)
            state = None
            window = []

        window.append(a)
        if len(window) > tG:
            window.pop(0)
        while len(window) < tG:  # left-pad the first window
            window.insert(0, window[0])

        labels = np.stack(window)[None]  # (1, tG, H, W[, C])
        inst = (
            np.stack([item["inst"]] * tG)[None]
            if item.get("inst") is not None
            else None
        )

        if state is None:
            h, w = a.shape[:2]
            if item.get("B") is not None and opt.use_real_img:
                state = eng.seed_state(
                    jnp.asarray(np.stack([item["B"]] * (tG - 1))[None])
                )
            else:
                state = eng.initial_state(1, h, w)
            use_raw_only = opt.no_first_img
        else:
            use_raw_only = False

        frame, state = eng.step(
            params, jnp.asarray(labels),
            jnp.asarray(inst) if inst is not None else None,
            state, use_raw_only=use_raw_only,
        )

        visuals = {
            "real_A": (
                label_to_color(labels[0, -1], opt.label_nc)
                if opt.label_nc > 0
                else to_image(labels[0, -1][..., :3])
            ),
            "fake_B": to_image(np.asarray(frame[0])),
        }
        visualizer.save_images(save_dir, visuals, item["path"])
        count += 1
        if count % 10 == 0:
            print(f"processed {count} frames -> {save_dir}")

    print(f"done: {count} frames written to {save_dir}")


def _load_params(opt, eng, h, w):
    from vid2vid_tpu.train.checkpoints import checkpoint_exists, restore_params

    template = eng.init(jax.random.key(0), 1, h, w)
    tag = f"G_{opt.which_epoch}"
    if checkpoint_exists(opt, tag):
        return restore_params(opt, template, tag)
    if checkpoint_exists(opt, opt.which_epoch):
        # full train-state checkpoint: pull the generator subtree
        from vid2vid_tpu.train.checkpoints import _ckpt_dir
        import orbax.checkpoint as ocp

        payload = ocp.PyTreeCheckpointer().restore(
            _ckpt_dir(opt, opt.which_epoch)
        )
        return payload["gparams"]
    print(
        f"WARNING: no checkpoint '{tag}' under {opt.checkpoints_dir}/{opt.name}"
        " — using randomly initialized generator."
    )
    return template


if __name__ == "__main__":
    main()
