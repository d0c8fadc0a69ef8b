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
    from vid2vid_tpu.data.loader import create_test_stream
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

    stream = create_test_stream(opt)
    params = None
    state = None
    # Rolling per-sequence frame histories. The reference's first item of a
    # sequence loads tG *distinct* frames (labels 0..tG-1) and generates the
    # frame at index tG-1; use_real_img seeds from the actual previous real
    # frames (reference: data/test_dataset.py:40-48, test.py:34-41) — so we
    # buffer tG real frames of history rather than padding with repeats.
    window: list = []   # labels
    bwindow: list = []  # real frames (when present)
    iwindow: list = []  # instance maps (when present)
    tG = opt.n_frames_G
    count = 0

    for item in stream:
        if count >= opt.how_many:
            break
        a = item["A"]
        if item["change_seq"] or params is None:
            h, w = a.shape[:2]
            if params is None:
                params = _load_params(opt, eng, h, w)
            state = None
            window, bwindow, iwindow = [], [], []

        window.append(a)
        if item.get("B") is not None:
            bwindow.append(item["B"])
        if item.get("inst") is not None:
            iwindow.append(item["inst"])
        if len(window) > tG:
            window.pop(0)
            bwindow = bwindow[-tG:]
            iwindow = iwindow[-tG:]
        if len(window) < tG:
            continue  # warmup: the first output frame is at index tG-1

        labels = np.stack(window)[None]  # (1, tG, H, W[, C])
        inst = np.stack(iwindow)[None] if iwindow else None

        if state is None:
            h, w = a.shape[:2]
            if opt.use_single_G:
                state = _single_g_seed(opt, eng, labels, bwindow, iwindow)
            elif bwindow and opt.use_real_img:
                state = eng.seed_state(
                    jnp.asarray(np.stack(bwindow[: tG - 1])[None])
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


def _single_g_seed(opt, eng, labels, bwindow, iwindow):
    """use_single_G first-frame strategy: run the single-image generator on
    the first tG-1 label maps (reference: models/vid2vid_model_G.py:237-288).
    `bwindow`/`iwindow` hold the sequence's true first frames (real images /
    instance maps), used by the face variant's feature encoder.

    Single-image params live under checkpoints/<registry>/state/ as orbax
    trees (convert published .pth with vid2vid_tpu.tools.convert_checkpoint);
    face mode also loads the feature Encoder + features.npy clusters.
    """
    import numpy as np
    import orbax.checkpoint as ocp

    tG = opt.n_frames_G
    eng.build_single_g()
    enc = eng.encode(jnp.asarray(labels))[:, : tG - 1]

    root = opt.dataroot.lower()
    if "city" in root:
        reg_dir = os.path.join(opt.checkpoints_dir, "label2city_single", "state")
        tag = f"G_{opt.loadSize}"
    else:
        reg_dir = os.path.join(opt.checkpoints_dir, "edge2face_single", "state")
        tag = "G"
    path = os.path.abspath(os.path.join(reg_dir, tag))
    template = jax.jit(eng._single_g.init)(
        jax.random.key(0),
        enc[:, 0] if not eng._single_needs_feat else enc[:, 0],
        *( [jnp.zeros(enc.shape[:1] + enc.shape[2:4] + (16,))]
           if eng._single_needs_feat else [] ),
    )
    if os.path.isdir(path):
        params_i = ocp.PyTreeCheckpointer().restore(path, item=template)
    else:
        print(f"WARNING: no single-G checkpoint at {path}; using random init")
        params_i = template

    encoder_params = None
    clusters = None
    real_first = None
    pool_map = None
    if eng._single_needs_feat:
        epath = os.path.abspath(os.path.join(reg_dir, "E"))
        etemplate = jax.jit(eng._encoder.init)(
            jax.random.key(1),
            jnp.zeros(enc.shape[:1] + enc.shape[2:4] + (3,)),
            jnp.zeros(enc.shape[:1] + enc.shape[2:4], jnp.int32),
        )
        encoder_params = (
            ocp.PyTreeCheckpointer().restore(epath, item=etemplate)
            if os.path.isdir(epath)
            else etemplate
        )
        fpath = os.path.join(reg_dir, "features.npy")
        if os.path.exists(fpath):
            clusters = np.load(fpath, allow_pickle=True).item()
        else:
            clusters = {}
        if bwindow:
            reals = list(bwindow[: tG - 1])
        else:
            reals = [np.zeros(labels.shape[2:4] + (3,), np.float32)] * (tG - 1)
        real_first = jnp.asarray(np.stack(reals)[None])
        if iwindow:
            pms = list(iwindow[: tG - 1])
        else:
            pms = [np.zeros(labels.shape[2:4], np.int32)] * (tG - 1)
        pool_map = jnp.asarray(np.stack(pms)[None])

    return eng.single_g_first_frames(
        params_i, enc, real_first, pool_map, encoder_params, clusters
    )


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
