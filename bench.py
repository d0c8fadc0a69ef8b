"""Benchmarks: label2city 2048x1024 inference throughput (the north-star
metric from BASELINE.json) + Cityscapes-512x256 training step rate + MFU.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
The primary metric stays frames/sec of the 3-scale composite generator
(one-hot 35-class + instance-edge input, fg compositing) at 2048x1024.
vs_baseline is measured fps / 2.0 (the driver's target is >=2x a V100 and
no official V100 number exists — BASELINE.md: none published).

Grounding (extra keys in the same JSON object):
  - flops_per_frame_T / mfu_pct: XLA cost_analysis of the compiled clip
    function divided by measured time against the chip's peak (v5e bf16
    ~197 TFLOP/s, override with BENCH_PEAK_TFLOPS) — makes "fast"
    falsifiable without a V100.
  - train_iters_per_sec: full G + D + D_T optimization steps per second at
    512x256, n_frames_total 6 (BASELINE.json's second driver metric),
    VGG + temporal losses included, bf16 compute.

Env knobs: BENCH_H/W/FRAMES/REPS/BF16/BATCH, BENCH_TRAIN=0 to skip the
train bench, BENCH_TRAIN_FLOW=0 for the zero-flow stub, BENCH_PEAK_TFLOPS,
BENCH_FUSED_RES=1 for the Pallas fused-epilogue enhancer resblocks.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def _cost_analysis(jitted, *args, **kwargs):
    """(flops, bytes_accessed) of one call of a jitted fn, or (None, None)."""
    try:
        compiled = jitted.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        nbytes = float(ca.get("bytes accessed", 0.0))
        return (flops if flops > 0 else None), (nbytes if nbytes > 0 else None)
    except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
        print(f"cost_analysis unavailable: {e!r}", file=sys.stderr)
        return None, None


def _cost_analysis_flops(jitted, *args, **kwargs):
    return _cost_analysis(jitted, *args, **kwargs)[0]


def bench_inference():
    from vid2vid_tpu.config import Options
    from vid2vid_tpu.models.inference import InferenceEngine

    height = int(os.environ.get("BENCH_H", 1024))
    width = int(os.environ.get("BENCH_W", 2048))
    frames = int(os.environ.get("BENCH_FRAMES", 12))
    opt = Options(
        label_nc=35,
        use_instance=True,
        fg=True,
        fg_labels=(26,),
        ngf=128,
        n_downsample_G=3,
        n_blocks=9,
        n_scales_spatial=3,
        n_frames_G=3,
        norm="batch",
        bf16=os.environ.get("BENCH_BF16", "1") == "1",
        pallas_resblocks=os.environ.get("BENCH_FUSED_RES", "0") == "1",
        isTrain=False,
    )
    eng = InferenceEngine(opt)
    b = int(os.environ.get("BENCH_BATCH", 1))
    params = eng.init(jax.random.key(0), b, height, width)

    rng = np.random.default_rng(0)
    tG = opt.n_frames_G
    labels = jnp.asarray(
        rng.integers(0, 35, (b, frames + tG - 1, height, width)), jnp.int32
    )
    inst = jnp.asarray(
        rng.integers(0, 4, (b, frames + tG - 1, height, width)), jnp.int32
    )
    state = eng.initial_state(b, height, width)
    streaming = os.environ.get("BENCH_STREAMING", "1") == "1"
    if streaming:
        # raw-label path: one-hot/edge encoding + pyramid stay inside the
        # scan (rolling window carry) — the clip-wide encoded pyramid is
        # never resident in HBM
        run = lambda: eng.generate_clip_raw(params, labels, inst, state)
    else:
        enc = eng.encode(labels, inst)
        run = lambda: eng.generate_clip(params, enc, state)

    # compile + warmup; NOTE: on the axon remote platform block_until_ready
    # does not synchronize — a host readback (float()) is the only reliable
    # completion barrier, so we time through a scalar checksum.
    outs, _ = run()
    _ = float(outs.fake[0, -1].mean())

    n_rep = int(os.environ.get("BENCH_REPS", 3))
    t0 = time.perf_counter()
    for _ in range(n_rep):
        outs, _ = run()
        _ = float(outs.fake[0, -1].mean())
    dt = (time.perf_counter() - t0) / n_rep
    fps = b * frames / dt

    # per-frame FLOPs: XLA's cost_analysis counts a lax.scan body ONCE
    # regardless of trip count (measured: T=1/2/4 clips all report the same
    # total), so lower a 1-frame clip — body flops == per-frame flops there.
    if streaming:
        flops_per_frame, bytes_per_frame = _cost_analysis(
            eng._clip_raw_fn, params, labels[:, :tG], inst[:, :tG], state,
            False, True,
        )
    else:
        flops_per_frame, bytes_per_frame = _cost_analysis(
            eng._clip_fn, params, enc[:, :tG], state, False
        )
    extras = {}
    if flops_per_frame:
        peak = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0)) * 1e12
        per_sample = flops_per_frame / b  # cost_analysis counts the whole batch
        extras["flops_per_frame_T"] = round(per_sample / 1e12, 3)
        extras["mfu_pct"] = round(100.0 * per_sample * fps / peak, 2)
        extras["peak_tflops"] = peak / 1e12
        if b > 1:
            extras["batch"] = b
        if bytes_per_frame:
            # roofline bound of the compiled graph: max(compute, HBM traffic)
            # time per frame (PERF.md "Roofline"); speed-of-light fraction =
            # measured throughput / bound throughput — the grounded
            # vs_baseline now that no external V100 anchor exists (BASELINE.md
            # "External V100 anchor")
            hbm = float(os.environ.get("BENCH_HBM_GBPS", 819.0)) * 1e9
            bound_s = max(flops_per_frame / peak, bytes_per_frame / hbm) / b
            extras["bytes_per_frame_GB"] = round(bytes_per_frame / b / 1e9, 2)
            extras["speed_of_light_frac"] = round(fps * bound_s, 3)

    # single-frame streaming latency: the serving path the export artifact
    # ships (InferenceEngine.step — one raw tG-window in, one frame out)
    if os.environ.get("BENCH_STEP_LATENCY", "1") == "1":
        extras["step_latency_ms"] = round(
            _step_latency(eng, params, labels, inst, state), 2
        )
    return fps, (height, width), extras


def _step_latency(eng, params, labels, inst, state, reps=10):
    """Median one-frame latency (ms) of the jitted streaming step."""
    tG = eng.opt.n_frames_G
    win_l = labels[:, :tG]
    win_i = inst[:, :tG] if inst is not None else None
    frame, st = eng.step(params, win_l, win_i, state)  # compile
    _ = float(frame.mean())
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        frame, st = eng.step(params, win_l, win_i, st)
        _ = float(frame.mean())  # host readback = completion barrier (axon)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2] * 1e3


def bench_train():
    """Full G+D+D_T step rate at 512x256 (canonical train_512 config,
    reference: scripts/street/train_512.sh + README.md:117-120).

    Includes the per-chunk FlowNet2 forward for flow/conf supervision by
    default (the reference's training always pays it, train.py:60);
    BENCH_TRAIN_FLOW=0 reverts to the zero-flow stub to isolate the
    G/D/D_T optimization cost.
    """
    from vid2vid_tpu.config import Options
    from vid2vid_tpu.data.synthetic import moving_square_clip
    from vid2vid_tpu.train.loop import Trainer

    height, width = 256, 512
    opt = Options(
        label_nc=35, use_instance=True, fg=True, fg_labels=(26,),
        ngf=128, n_downsample_G=3, n_blocks=9, n_scales_spatial=1,
        n_frames_G=3, n_frames_D=3, n_scales_temporal=2,
        n_frames_total=6, max_frames_per_gpu=2,
        norm="batch", bf16=True, remat=True, isTrain=True, fineSize=width,
    )
    flow_fn = None
    if os.environ.get("BENCH_TRAIN_FLOW", "1") == "1":
        from vid2vid_tpu.models.flownet2 import FlowEstimator

        est = FlowEstimator()
        # random init: measures cost, not flow quality; jit — eager init
        # dispatches op-by-op through the remote tunnel (~140 s)
        fparams = jax.jit(est.init)(jax.random.key(1))

        def flow_fn(real_b, real_b_prev):
            return est(fparams, real_b, real_b_prev)

    trainer = Trainer(opt, flow_fn=flow_fn)
    state = trainer.init_state(height, width)
    rng = np.random.default_rng(0)
    labels, imgs = moving_square_clip(rng, 8, height, width, n_classes=35)
    labels, imgs = jnp.asarray(labels), jnp.asarray(imgs)
    # --use_instance is part of the train_512 recipe: the instance-edge
    # channel widens G and D inputs. The moving square is one object, so
    # the label map doubles as instance ids.
    inst = labels

    # warmup/compile: one full clip (3 chunks of n_frames_load=2); record
    # each step's arg shapes so we can cost_analysis the compiled steps
    trainer.record_costs = True
    state, _ = trainer.train_clip(state, labels, imgs, inst)
    trainer.record_costs = False
    n_chunks = 3
    reps = int(os.environ.get("BENCH_TRAIN_REPS", 2))
    t0 = time.perf_counter()
    for _ in range(reps):
        state, losses = trainer.train_clip(state, labels, imgs, inst)
    dt = (time.perf_counter() - t0) / reps  # train_clip reads losses -> sync
    iters_per_sec = n_chunks / dt

    extras = {}
    flops = _train_iter_flops(trainer)
    if flops:
        peak = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0)) * 1e12
        extras["train_flops_per_iter_T"] = round(flops / 1e12, 3)
        extras["train_mfu_pct"] = round(100.0 * flops * iters_per_sec / peak, 2)
    return iters_per_sec, extras


def _train_iter_flops(trainer):
    """Sum cost_analysis FLOPs over one iteration's jitted steps (G+D+D_Ts),
    from the arg ShapeDtypeStructs the Trainer recorded on the last chunk.
    The flow_fn reference forward is counted too when it is a FlowEstimator
    (its _compute is a jit handle)."""
    if not trainer.last_step_shapes:
        return None
    fns = {"g": trainer.g_step, "d": trainer.d_step, "dt": trainer.dt_step}
    total = 0.0
    for name, args, kwargs in trainer.last_step_shapes:
        f = _cost_analysis_flops(fns[name], *args, **kwargs)
        if f is None:
            return None
        total += f
    return total


def bench_train_crop():
    """Steady it/s for the 2048-crop training recipe on ONE chip
    (recipes/street/train_2048_crop.sh; reference needs 8 GPUs or crops,
    README.md:136-137): 1024x1024 crops, 3 spatial scales, num_D 4, fg,
    bf16 + remat, jitted FlowNet2 reference flow."""
    from vid2vid_tpu.config import Options
    from vid2vid_tpu.data.synthetic import moving_square_clip
    from vid2vid_tpu.models.flownet2 import FlowEstimator
    from vid2vid_tpu.train.loop import Trainer

    size = int(os.environ.get("BENCH_CROP_SIZE", 1024))
    opt = Options(
        label_nc=35, use_instance=True, fg=True, fg_labels=(26,),
        ngf=128, n_downsample_G=3, n_blocks=9, n_scales_spatial=3,
        n_frames_G=3, n_frames_D=3, n_scales_temporal=2, num_D=4,
        n_frames_total=4, max_frames_per_gpu=1, lr=5e-5,
        norm="batch", bf16=True, remat=True, isTrain=True, fineSize=size,
    )
    est = FlowEstimator()
    fparams = jax.jit(est.init)(jax.random.key(1))
    trainer = Trainer(opt, flow_fn=lambda a, b: est(fparams, a, b))
    state = trainer.init_state(size, size)
    rng = np.random.default_rng(0)
    labels, imgs = moving_square_clip(rng, 6, size, size, n_classes=35)
    labels, imgs = jnp.asarray(labels), jnp.asarray(imgs)
    inst = labels  # the square is one object: label map doubles as ids

    state, _ = trainer.train_clip(state, labels, imgs, inst)  # compile + warmup
    n_chunks = 4  # 6 frames, tG-1 seed, chunks of 1
    reps = int(os.environ.get("BENCH_CROP_REPS", 1))
    t0 = time.perf_counter()
    for _ in range(reps):
        state, losses = trainer.train_clip(state, labels, imgs, inst)
    dt = (time.perf_counter() - t0) / reps
    if not all(np.isfinite(v) for v in losses.values()):
        raise RuntimeError(f"non-finite losses in crop train: {losses}")
    return n_chunks / dt


def bench_matrix():
    """fps for the remaining BASELINE.json configs (1, 2, 5) on this chip.

    - edge2face 512 (scripts/face/test_512.sh: input_nc 15, single-scale
      composite; --use_single_G affects only first-frame seeding, not the
      steady-state fps measured here)
    - label2city_1024_g1 (scripts/street/test_g1_1024.sh: --n_downsample_G 2,
      3 spatial scales, fg + instance)
    - pose2body 256p frame-prediction (scripts/pose/test_256p.sh: input_nc 6,
      --no_first_img; portrait 192x256 per scaleHeight-256 on portrait clips)
    """
    from vid2vid_tpu.config import Options
    from vid2vid_tpu.models.inference import InferenceEngine

    bf16 = os.environ.get("BENCH_BF16", "1") == "1"
    configs = {
        "edge2face_512": dict(
            opt=Options(
                label_nc=0, input_nc=15, use_instance=False, fg=False,
                ngf=128, n_downsample_G=3, n_blocks=9, n_scales_spatial=1,
                n_frames_G=3, norm="batch", bf16=bf16, isTrain=False,
            ),
            h=512, w=512, float_cond=True, zero_seed=False,
        ),
        "label2city_1024_g1": dict(
            opt=Options(
                label_nc=35, use_instance=True, fg=True, fg_labels=(26,),
                ngf=128, n_downsample_G=2, n_blocks=9, n_scales_spatial=3,
                n_frames_G=3, norm="batch", bf16=bf16, isTrain=False,
            ),
            h=512, w=1024, float_cond=False, zero_seed=False,
        ),
        "pose2body_256p_framepred": dict(
            opt=Options(
                label_nc=0, input_nc=6, use_instance=False, fg=False,
                ngf=128, n_downsample_G=3, n_blocks=9, n_scales_spatial=1,
                n_frames_G=3, norm="batch", bf16=bf16, isTrain=False,
            ),
            h=256, w=192, float_cond=True, zero_seed=True,
        ),
    }
    frames = int(os.environ.get("BENCH_MATRIX_FRAMES", 8))
    reps = int(os.environ.get("BENCH_MATRIX_REPS", 2))
    out = {}
    rng = np.random.default_rng(0)
    for name, c in configs.items():
        opt, h, w = c["opt"], c["h"], c["w"]
        tG = opt.n_frames_G
        eng = InferenceEngine(opt)
        params = eng.init(jax.random.key(0), 1, h, w)
        if c["float_cond"]:
            cond = jnp.asarray(
                rng.uniform(-1, 1, (1, frames + tG - 1, h, w, opt.input_nc)),
                jnp.float32,
            )
            enc = eng.encode(cond)
        else:
            labels = jnp.asarray(
                rng.integers(0, opt.label_nc, (1, frames + tG - 1, h, w)),
                jnp.int32,
            )
            inst = jnp.asarray(
                rng.integers(0, 4, (1, frames + tG - 1, h, w)), jnp.int32
            )
            enc = eng.encode(labels, inst)
        if c["zero_seed"]:  # --no_first_img frame-prediction mode
            state = eng.initial_state(1, h, w)
        else:
            seed = jnp.asarray(rng.uniform(-1, 1, (1, tG - 1, h, w, 3)), jnp.float32)
            state = eng.initial_state(1, h, w, real_frames=seed)
        run = lambda: eng.generate_clip(params, enc, state)
        outs, _ = run()
        _ = float(outs.fake[0, -1].mean())
        t0 = time.perf_counter()
        for _ in range(reps):
            outs, _ = run()
            _ = float(outs.fake[0, -1].mean())
        dt = (time.perf_counter() - t0) / reps
        entry = {"fps": round(frames / dt, 3), "size": f"{w}x{h}"}
        flops = _cost_analysis_flops(eng._clip_fn, params, enc[:, :tG], state, False)
        if flops:
            peak = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0)) * 1e12
            entry["mfu_pct"] = round(100.0 * flops * entry["fps"] / peak, 2)
        out[name] = entry
    return out


def main():
    fps, (height, width), extras = bench_inference()
    record = {
        "metric": f"label2city {width}x{height} 3-scale inference",
        "value": round(fps, 3),
        "unit": "frames/sec",
        # No external V100 anchor exists anywhere in this container
        # (BASELINE.md "External V100 anchor — search result"): vs_baseline
        # is now the GROUNDED ratio — measured fps over the compiled
        # graph's own roofline bound (speed-of-light fraction). The old
        # assumed-V100 ratio is kept as a secondary key for continuity.
        "vs_baseline": extras.get("speed_of_light_frac", round(fps / 2.0, 3)),
        "baseline_note": (
            "fps / roofline-bound fps of the compiled graph (no external "
            "V100 number exists; BASELINE.md round-5 search)"
        ),
        "vs_assumed_v100_2fps": round(fps / 2.0, 3),
    }
    record.update(extras)
    if os.environ.get("BENCH_TRAIN", "1") == "1":
        try:
            it_s, train_extras = bench_train()
            record["train_iters_per_sec"] = round(it_s, 3)
            record.update(train_extras)
            flow = os.environ.get("BENCH_TRAIN_FLOW", "1") == "1"
            record["train_config"] = (
                "512x256 bs1 tG3 chunk2 use_instance G+D+2xD_T vgg bf16 "
                + ("flownet2-ref" if flow else "zero-flow-ref")
            )
        except Exception as e:  # noqa: BLE001 — keep the primary metric
            print(f"train bench failed: {e!r}", file=sys.stderr)
    if os.environ.get("BENCH_MATRIX", "1") == "1":
        try:
            record["bench_matrix"] = bench_matrix()
        except Exception as e:  # noqa: BLE001
            print(f"bench matrix failed: {e!r}", file=sys.stderr)
    if os.environ.get("BENCH_TRAIN_CROP", "0") == "1":
        # heavy (multi-minute compile at 1024x1024); opt-in for the driver,
        # measured + recorded in PERF.md each round
        try:
            record["train_crop_iters_per_sec"] = round(bench_train_crop(), 3)
            record["train_crop_config"] = (
                "2048-crop recipe: 1024x1024 crops 3-scale num_D4 fg bf16 "
                "remat flownet2-ref, one chip"
            )
        except Exception as e:  # noqa: BLE001
            print(f"crop train bench failed: {e!r}", file=sys.stderr)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
