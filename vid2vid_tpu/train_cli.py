"""Training CLI — the reference train.py equivalent.

Usage (reference flag surface preserved):
  python -m vid2vid_tpu.train_cli --name label2city_512 --label_nc 35 \
      --loadSize 512 --use_instance --fg --n_frames_total 6 ...

Epoch loop -> clip loop -> chunk loop, with loss printing, image dumps,
periodic checkpointing, LR decay / curriculum / unfreeze at epoch ends
(reference: train.py:14-128).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from vid2vid_tpu.config import parse_args
    from vid2vid_tpu.data.loader import PrefetchLoader, create_dataset
    from vid2vid_tpu.train.checkpoints import (
        checkpoint_exists,
        load_pretrain,
        restore_checkpoint,
        save_checkpoint,
    )
    from vid2vid_tpu.train.loop import Trainer, refresh_batch_stats
    from vid2vid_tpu.utils.images import flow_to_color, label_to_color, to_image
    from vid2vid_tpu.utils.visualizer import Visualizer

    opt = parse_args(argv, is_train=True)
    if opt.debug:
        opt = opt.replace(display_freq=1, print_freq=1, nThreads=1)

    dataset = create_dataset(opt)
    loader = PrefetchLoader(dataset, opt)
    print(f"#training videos = {len(loader)}")

    flow_fn = None
    if not opt.effective_no_flow:
        flow_fn = _build_flow_fn(opt)

    trainer = Trainer(opt, flow_fn=flow_fn)
    trainer.schedule.seq_len_max = getattr(dataset, "seq_len_max", 128)
    visualizer = Visualizer(opt)

    # initialize lazily from the first clip's spatial size
    first = next(iter(loader))
    h, w = first["B"].shape[2], first["B"].shape[3]
    state = trainer.init_state(h, w, batch=opt.batchSize)

    if opt.continue_train and checkpoint_exists(opt):
        state, trainer.schedule = restore_checkpoint(opt, state, trainer.schedule)
        visualizer.vis_print(
            f"resumed at epoch {trainer.schedule.epoch}, "
            f"n_frames_total {trainer.schedule.n_frames_total}"
        )
    elif opt.load_pretrain:
        # warm-start (e.g. 1024 from the finished 512 run) — fuzzy
        # shape-intersection load, new scales stay at init
        state = load_pretrain(opt, state)

    # ring buffer of recent clips: checkpoints recalibrate norm running
    # stats from these before saving, so eval-mode inference of a freshly
    # trained model is correct by default (the reference's BN updates every
    # forward; our jitted steps use per-batch stats and skip the buffers).
    # Held as HOST numpy — 4 full clips of device arrays would pin O(GB)
    # of HBM at high res; refresh_batch_stats re-uploads at save time.
    recent_clips: list = []

    def save(state, tag):
        if recent_clips:
            state = refresh_batch_stats(
                trainer, state, recent_clips, n_batches=len(recent_clips)
            )
        save_checkpoint(opt, state, sched, tag)
        return state

    sched = trainer.schedule
    total_epochs = opt.niter + opt.niter_decay
    while sched.epoch <= total_epochs:
        epoch = sched.epoch
        epoch_start = time.time()
        if hasattr(dataset, "set_n_frames_total"):
            dataset.set_n_frames_total(sched.n_frames_total)
        for idx, data in enumerate(loader):
            iter_start = time.time()
            labels = jnp.asarray(data["A"])
            imgs = jnp.asarray(data["B"])
            inst = jnp.asarray(data["inst"]) if data.get("inst") is not None else None
            state, losses = trainer.train_clip(state, labels, imgs, inst)
            recent_clips.append(
                (data["A"], data["B"], data.get("inst"))  # host numpy views
            )
            if len(recent_clips) > 4:
                recent_clips.pop(0)

            if sched.total_steps % opt.print_freq < opt.batchSize:
                visualizer.print_current_errors(
                    epoch, idx, losses, time.time() - iter_start
                )
                visualizer.plot_current_errors(losses, sched.total_steps)

            if sched.total_steps % opt.display_freq < opt.batchSize:
                _dump_visuals(opt, trainer, visualizer, epoch, sched.total_steps)

            if sched.total_steps % opt.save_latest_freq < opt.batchSize:
                state = save(state, "latest")

            if opt.debug:
                from vid2vid_tpu.utils.profiling import device_memory_stats

                for dev, st in device_memory_stats().items():
                    used = st.get("bytes_in_use", 0) / 1e9
                    lim = st.get("bytes_limit", 0) / 1e9
                    print(f"  {dev}: {used:.2f} / {lim:.2f} GB")

        visualizer.vis_print(
            f"End of epoch {epoch} / {total_epochs} \t "
            f"Time Taken: {time.time() - epoch_start:.0f} sec"
        )
        state = save(state, "latest")
        if epoch % opt.save_epoch_freq == 0:
            state = save(state, str(epoch))
        state = trainer.end_of_epoch(state)

    return state


def _dump_visuals(opt, trainer, visualizer, epoch, step):
    """save_all_tensors equivalent (reference: util/util.py:13-44): dump the
    last chunk's inputs/outputs to the HTML gallery."""
    import numpy as np

    from vid2vid_tpu.utils.images import flow_to_color, label_to_color, to_image

    if not hasattr(trainer, "last_outs"):
        return
    outs = trainer.last_outs
    labels, real_b, flow_ref, conf_ref = trainer.last_inputs
    tG = opt.n_frames_G
    visuals = {
        "input_label": (
            label_to_color(np.asarray(labels[0, -1]), opt.label_nc)
            if opt.label_nc > 0
            else to_image(np.asarray(labels[0, -1])[..., :3])
        ),
        "fake_image": to_image(np.asarray(outs.fake[0, -1])),
        "fake_raw_image": to_image(np.asarray(outs.raw[0, -1])),
        "real_image": to_image(np.asarray(real_b[0, -1])),
        "flow_ref": flow_to_color(np.asarray(flow_ref[0, -1])),
        "conf_ref": to_image(np.asarray(conf_ref[0, -1]) * 2 - 1),
    }
    if outs.flow is not None:
        visuals["flow"] = flow_to_color(np.asarray(outs.flow[0, -1]))
        visuals["weight"] = to_image(np.asarray(outs.weight[0, -1]) * 2 - 1)
    visualizer.display_current_results(visuals, epoch, step)


def _build_flow_fn(opt):
    """FlowNet2-based reference flow, or zero-flow fallback without weights."""
    from vid2vid_tpu.models.flownet2 import FlowEstimator

    weights_path = os.path.join(opt.checkpoints_dir, "flownet2", "params")
    est = FlowEstimator()
    if os.path.isdir(weights_path):
        import orbax.checkpoint as ocp

        template = jax.jit(est.init)(jax.random.key(0))
        params = ocp.PyTreeCheckpointer().restore(
            os.path.abspath(weights_path), item=template
        )
    else:
        print(
            "WARNING: no FlowNet2 weights at checkpoints/flownet2/params — "
            "using randomly initialized flow net (train flow supervision "
            "will be weak; convert the published checkpoint with "
            "vid2vid_tpu.utils.torch_import)."
        )
        params = jax.jit(est.init)(jax.random.key(0))
    # NO closure-jit here: capturing params in the closure bakes all 162M
    # weights into the HLO as constants (oversized executables; remote
    # compile rejects the body outright). FlowEstimator jits internally
    # with params passed as an argument.
    return lambda a, b: est(params, a, b)


if __name__ == "__main__":
    main()
