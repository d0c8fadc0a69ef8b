"""Train-side time/traffic ledger for the canonical 512x256 train step.

Reproduces the inference roofline methodology (PERF.md "Roofline closure")
for TRAINING: per-step wall split (G step / D step / D_T steps / FlowNet2
reference forward / host+bookkeeping remainder) plus per-step
cost_analysis FLOPs and bytes, each step priced against its own roofline
bound max(flops/peak, bytes/HBM_BW). Answers "what bounds the train MFU"
with numbers instead of a single aggregate percentage.

Config is bit-identical to bench.py::bench_train (the train_512 recipe,
reference scripts/street/train_512.sh + train.py:40-76): 512x256, bs1,
tG=3, chunks of 2, use_instance, fg, G+D+2xD_T, VGG, bf16+remat, jitted
random-init FlowNet2 for the flow/conf supervision (the reference always
pays this forward, reference train.py:60).

Run:  python -m vid2vid_tpu.tools.train_ledger
Env:  LEDGER_REPS (default 4 clips), LEDGER_REMAT (default 1; 0 A/Bs the
rematerialization policy out of the G step), BENCH_PEAK_TFLOPS,
BENCH_HBM_GBPS.

A trivial-call sync floor is measured first (blocked call of a jitted
x+1 on one scalar): every serialized step time includes one full
host->tunnel->device->host round trip, so `floor_ms` is the dispatch
overhead baked into each row — subtract it before comparing a step
against its roofline bound (on locally-attached TPU this floor is
~0.1 ms; through the axon tunnel it is tens of ms).

Two timings are reported:
  - steady it/s: unwrapped train_clip rate (same number bench_train prints)
  - serialized split: every device call wrapped in block_until_ready so
    each step's wall time is attributable. Serialization removes the
    host/device overlap, so the split's total >= steady total; the delta
    IS the overlap (reported).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import numpy as np

# bench.py lives at the repo root (it is the driver's entry point);
# reuse its cost_analysis helper instead of duplicating it.
_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def _readback(out):
    """Completion barrier that works on axon: block_until_ready does NOT
    synchronize through the tunnel (verified: trivial-call floor reads
    0.0 ms) — only a host readback forces completion. Fetch one scalar
    leaf; the transfer is 4 bytes, the wait is the real device time."""
    leaf = next(
        x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "ravel")
    )
    float(np.asarray(leaf.ravel()[0]))


class _TimedFn:
    """Wrap a callable: readback-barrier on outputs, accumulate wall time
    per call."""

    def __init__(self, fn, name: str, clock: dict):
        self._fn = fn
        self._name = name
        self._clock = clock

    def __call__(self, *args, **kwargs):
        t0 = time.perf_counter()
        out = self._fn(*args, **kwargs)
        _readback(out)
        dt = time.perf_counter() - t0
        sec, calls = self._clock.get(self._name, (0.0, 0))
        self._clock[self._name] = (sec + dt, calls + 1)
        return out

    # Trainer cost accounting introspects .lower on the step handles
    def __getattr__(self, item):
        return getattr(self._fn, item)


def build_trainer():
    from vid2vid_tpu.config import Options
    from vid2vid_tpu.models.flownet2 import FlowEstimator
    from vid2vid_tpu.train.loop import Trainer

    height, width = 256, 512
    opt = Options(
        label_nc=35, use_instance=True, fg=True, fg_labels=(26,),
        ngf=128, n_downsample_G=3, n_blocks=9, n_scales_spatial=1,
        n_frames_G=3, n_frames_D=3, n_scales_temporal=2,
        n_frames_total=6, max_frames_per_gpu=2,
        norm="batch", bf16=True,
        remat=os.environ.get("LEDGER_REMAT", "1") != "0",
        isTrain=True, fineSize=width,
    )
    est = FlowEstimator()
    fparams = jax.jit(est.init)(jax.random.key(1))

    def flow_fn(real_b, real_b_prev):
        return est(fparams, real_b, real_b_prev)

    return Trainer(opt, flow_fn=flow_fn), est, fparams, height, width


def main():
    from bench import _cost_analysis
    from vid2vid_tpu.data.synthetic import moving_square_clip

    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0)) * 1e12
    hbm = float(os.environ.get("BENCH_HBM_GBPS", 819.0)) * 1e9
    reps = int(os.environ.get("LEDGER_REPS", 4))

    # sync floor: blocked round-trip cost of a trivial jitted call — the
    # per-call overhead every serialized step row pays exactly once.
    triv = jax.jit(lambda x: x + 1.0)
    z = triv(0.0)
    _readback(z)
    floors = []
    for _ in range(10):
        t0 = time.perf_counter()
        _readback(triv(z))
        floors.append(time.perf_counter() - t0)
    floor_ms = sorted(floors)[len(floors) // 2] * 1e3
    print(f"trivial-call sync floor (dispatch + readback round trip): "
          f"{floor_ms:.2f} ms")

    trainer, est, fparams, height, width = build_trainer()
    print(f"remat: {trainer.opt.remat}")
    state = trainer.init_state(height, width)
    rng = np.random.default_rng(0)
    labels, imgs = moving_square_clip(rng, 8, height, width, n_classes=35)
    labels, imgs = np.asarray(labels), np.asarray(imgs)
    inst = labels
    n_chunks = 3  # 8 frames, tG-1 seed, chunks of n_frames_load=2

    # ---- compile + record step arg shapes
    trainer.record_costs = True
    state, _ = trainer.train_clip(state, labels, imgs, inst)
    trainer.record_costs = False
    shapes = list(trainer.last_step_shapes or [])

    # ---- steady (pipelined) rate: same as bench_train
    t0 = time.perf_counter()
    for _ in range(2):
        state, losses = trainer.train_clip(state, labels, imgs, inst)
    steady_it_s = 2 * n_chunks / (time.perf_counter() - t0)

    # ---- serialized per-step split
    clock: dict = {}
    trainer.g_step = _TimedFn(trainer.g_step, "g_step", clock)
    trainer.d_step = _TimedFn(trainer.d_step, "d_step", clock)
    trainer.dt_step = _TimedFn(trainer.dt_step, "dt_step", clock)
    trainer.flow_fn = _TimedFn(trainer.flow_fn, "flownet2_fwd", clock)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, losses = trainer.train_clip(state, labels, imgs, inst)
    total_s = time.perf_counter() - t0
    iters = reps * n_chunks

    # ---- cost_analysis per recorded step (one iteration's worth)
    fns = {
        "g": trainer.g_step._fn, "d": trainer.d_step._fn,
        "dt": trainer.dt_step._fn,
    }
    costs = {}
    for name, args, kwargs in shapes:
        f, b = _cost_analysis(fns[name], *args, **kwargs)
        cf, cb, n = costs.get(name, (0.0, 0.0, 0))
        costs[name] = (cf + (f or 0.0), cb + (b or 0.0), n + 1)
    # flow forward: cost one call at the per-chunk flat shape (2 frame
    # pairs, FlowEstimator flattens (B,T,...)), scale by measured calls/iter
    flat = jax.ShapeDtypeStruct((2, height, width, 3), np.float32)
    flow_flops, flow_bytes = _cost_analysis(est._compute, fparams, flat, flat)

    key_of = {"g_step": "g", "d_step": "d", "dt_step": "dt"}
    print(f"\n== train ledger: 512x256 train_512 recipe, {iters} iters ==")
    print(f"steady (pipelined) rate: {steady_it_s:.3f} it/s "
          f"({1e3 / steady_it_s:.1f} ms/iter)")
    print(f"serialized total: {total_s / iters * 1e3:.1f} ms/iter "
          f"(overlap hidden by pipelining: "
          f"{total_s / iters * 1e3 - 1e3 / steady_it_s:+.1f} ms)")
    print(f"{'step':<14}{'ms/iter':>9}{'calls':>7}{'TFLOP':>8}{'GB':>8}"
          f"{'bound ms':>10}{'MFU%':>7}{'of-bound':>9}")
    ledger = {}
    acct_ms = 0.0
    for name, (sec, calls) in sorted(clock.items()):
        ms = sec / iters * 1e3
        acct_ms += ms
        k = key_of.get(name)
        row = {"ms_per_iter": round(ms, 2), "calls_per_iter": calls / iters}
        if name == "flownet2_fwd" and flow_flops:
            costs["flownet2_fwd"] = (
                flow_flops * calls / iters, (flow_bytes or 0.0) * calls / iters, 1,
            )
            k = "flownet2_fwd"
        if k and k in costs:
            cf, cb, _ = costs[k]
            bound = max(cf / peak, cb / hbm) * 1e3
            row.update({
                "tflop_per_iter": round(cf / 1e12, 3),
                "gb_per_iter": round(cb / 1e9, 2),
                "bound_ms": round(bound, 2),
                "mfu_pct": round(100 * cf / peak / (sec / iters), 2),
                "frac_of_bound": round(bound / ms, 3) if ms else None,
                "bound_kind": "hbm" if cb / hbm > cf / peak else "mxu",
            })
            print(f"{name:<14}{ms:>9.1f}{calls / iters:>7.1f}"
                  f"{cf / 1e12:>8.2f}{cb / 1e9:>8.1f}{bound:>10.1f}"
                  f"{row['mfu_pct']:>7.2f}{row['frac_of_bound']:>9.3f}")
        else:
            print(f"{name:<14}{ms:>9.1f}{calls / iters:>7.1f}"
                  f"{'-':>8}{'-':>8}{'-':>10}{'-':>7}{'-':>9}")
        ledger[name] = row
    rem = total_s / iters * 1e3 - acct_ms
    print(f"{'host+bookkeep':<14}{rem:>9.1f}")
    ledger["host_bookkeeping_ms"] = round(rem, 2)
    ledger["steady_it_s"] = round(steady_it_s, 3)
    ledger["serialized_ms_per_iter"] = round(total_s / iters * 1e3, 1)
    ledger["sync_floor_ms"] = round(floor_ms, 1)
    ledger["remat"] = trainer.opt.remat
    print("\nJSON:", json.dumps(ledger))


if __name__ == "__main__":
    main()
