"""Per-call cost of the SHARDED serving step (ask: models/inference.py's
eager `jax.device_put` per call — free or not?).

Runs on an 8-device virtual CPU mesh (the same harness the parallel tests
use), so the numbers are indicative for the HOST-side costs only: all 8
"devices" share cores, so compute time scales with total work, not
per-device latency. What IS meaningful here:

  A. n_devices=1 engine, numpy input each call           (baseline)
  B. n_devices=8 engine, numpy input each call           (device_put inside)
  C. n_devices=8 engine, inputs PRE-placed on the mesh   (device_put hoisted)

B - C prices the per-call placement (`InferenceEngine._shard_width`);
C - A prices the sharded dispatch + GSPMD partitioning overhead
(compute-confounded on CPU). Also asserts sharded output == single-device
output (mean abs < 1e-4).

Run:  python -m vid2vid_tpu.tools.shard_serve_bench
(Sets JAX_PLATFORMS=cpu + 8 virtual devices itself; must be the process's
first jax import.)
"""

from __future__ import annotations

import os
import sys
import time

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 " + os.environ.get("XLA_FLAGS", "")
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

H, W = 256, 512
TG = 3
REPS = int(os.environ.get("SHARD_SERVE_REPS", 30))


def _mk_opt(n_dev: int):
    from vid2vid_tpu.config import Options

    return Options(
        label_nc=35, use_instance=True, output_nc=3, ngf=32,
        n_downsample_G=2, n_blocks=4, n_scales_spatial=1, n_frames_G=TG,
        norm="batch", fg=False, fg_labels=(), isTrain=False, bf16=False,
        n_devices=n_dev,
    )


def bench_engine(n_dev: int, preplace: bool):
    from vid2vid_tpu.models.inference import InferenceEngine

    eng = InferenceEngine(_mk_opt(n_dev))
    params = eng.init(jax.random.PRNGKey(0), 1, H, W)
    state = eng.initial_state(1, H, W)
    rng = np.random.default_rng(0)
    lab_np = rng.integers(0, 35, (1, TG, H, W)).astype(np.int32)
    inst_np = rng.integers(0, 8, (1, TG, H, W)).astype(np.int32)

    def inputs():
        if preplace:
            lab = eng._shard_width(jnp.asarray(lab_np), 3)
            inst = eng._shard_width(jnp.asarray(inst_np), 3)
            jax.block_until_ready((lab, inst))
            return lab, inst
        return lab_np, inst_np

    lab, inst = inputs()
    frame, _state2 = eng.step(params, lab, inst, state)  # compile
    _ = float(np.asarray(frame).mean())
    ts = []
    for _ in range(REPS):
        lab, inst = inputs()
        t0 = time.perf_counter()
        frame, _s = eng.step(params, lab, inst, state)
        _ = float(np.asarray(frame[0, 0, 0]))  # readback barrier
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] * 1e3, np.asarray(frame)


def main():
    print(f"devices: {len(jax.devices())} ({jax.devices()[0].platform})")
    a, fa = bench_engine(1, preplace=False)
    b, fb = bench_engine(8, preplace=False)
    c, fc = bench_engine(8, preplace=True)
    print(f"A single-dev, numpy-in        : {a:8.2f} ms/call")
    print(f"B 8-dev mesh, numpy-in        : {b:8.2f} ms/call")
    print(f"C 8-dev mesh, pre-placed-in   : {c:8.2f} ms/call")
    print(f"per-call device_put cost (B-C): {b - c:8.2f} ms")
    print(f"sharded vs single dispatch (C-A, compute-confounded on CPU): "
          f"{c - a:8.2f} ms")
    d = float(np.abs(fb - fa).mean())
    print(f"sharded-vs-single output mean abs delta: {d:.2e}")
    if d >= 1e-4:
        raise SystemExit("sharded step must match single-device output")
    print("OK")


if __name__ == "__main__":
    main()
