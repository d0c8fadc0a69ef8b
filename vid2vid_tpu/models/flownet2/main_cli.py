"""Standalone flow-net trainer CLI (the reference's flownet2_pytorch/main.py).

Reflection-driven flags like the reference's `tools.add_arguments_for_module`
(reference: flownet2_pytorch/utils/tools.py:55-86): every keyword argument of
the chosen model / training-dataset / validation-dataset class is exposed as
`--model_<kwarg>` / `--training_dataset_<kwarg>` / `--validation_dataset_<kwarg>`.

Usage:
  python -m vid2vid_tpu.models.flownet2.main_cli \
      --model FlowNetS --total_epochs 3 \
      --training_dataset MpiSintelClean --training_dataset_root /data/sintel \
      --validation_dataset MpiSintelClean --validation_dataset_root /data/sintel \
      --save ./work
  python -m ... --inference --resume best --inference_dataset ImagesFromFolder ...
"""

from __future__ import annotations

import argparse
import inspect
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))))
)

import jax

from vid2vid_tpu.models.flownet2 import datasets as flow_datasets
from vid2vid_tpu.models.flownet2 import nets as flow_nets


def _class_registry(module, bases=()):
    return {
        name: cls
        for name, cls in inspect.getmembers(module, inspect.isclass)
        if cls.__module__ == module.__name__ and not name.startswith("_")
    }

MODELS = {
    k: v for k, v in _class_registry(flow_nets).items()
    if k.startswith("FlowNet")
}
DATASETS = _class_registry(flow_datasets)


def add_arguments_for_module(parser, prefix: str, cls):
    """Expose `cls.__init__` keyword args as --<prefix>_<name> flags
    (reference: flownet2_pytorch/utils/tools.py:55-86)."""
    sig = inspect.signature(cls.__init__)
    for name, p in sig.parameters.items():
        if name in ("self",):
            continue
        default = None if p.default is inspect.Parameter.empty else p.default
        typ = type(default) if default is not None else str
        if typ is bool:
            parser.add_argument(
                f"--{prefix}_{name}", type=lambda s: s.lower() in ("1", "true"),
                default=default,
            )
        else:
            parser.add_argument(f"--{prefix}_{name}", type=typ, default=default)


def _kwargs_for(ns, prefix: str, cls):
    sig = inspect.signature(cls.__init__)
    out = {}
    for name in sig.parameters:
        if name == "self":
            continue
        v = getattr(ns, f"{prefix}_{name}", None)
        if v is not None:
            out[name] = v
    return out


def main(argv=None):
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--model", default="FlowNetS", choices=sorted(MODELS))
    pre.add_argument("--training_dataset", default="FlyingChairs",
                     choices=sorted(DATASETS))
    pre.add_argument("--validation_dataset", default="MpiSintelClean",
                     choices=sorted(DATASETS))
    pre.add_argument("--inference_dataset", default="ImagesFromFolder",
                     choices=sorted(DATASETS))
    known, _ = pre.parse_known_args(argv)

    parser = argparse.ArgumentParser(parents=[pre])
    parser.add_argument("--total_epochs", type=int, default=10)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--div_flow", type=float, default=0.05)
    parser.add_argument("--fp16", action="store_true",
                        help="bf16 compute, f32 master params")
    parser.add_argument("--save", default="./work")
    parser.add_argument("--name", default="run")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--inference", action="store_true")
    parser.add_argument("--resume", default="", choices=("", "latest", "best"))
    parser.add_argument("--log_frequency", type=int, default=50)
    add_arguments_for_module(parser, "model", MODELS[known.model])
    add_arguments_for_module(
        parser, "training_dataset", DATASETS[known.training_dataset]
    )
    add_arguments_for_module(
        parser, "validation_dataset", DATASETS[known.validation_dataset]
    )
    add_arguments_for_module(
        parser, "inference_dataset", DATASETS[known.inference_dataset]
    )
    args = parser.parse_args(argv)

    from vid2vid_tpu.models.flownet2.harness import FlowHarness

    model_cls = MODELS[args.model]
    mkw = _kwargs_for(args, "model", model_cls)
    if "train_outputs" in inspect.signature(model_cls.__init__).parameters:
        mkw.setdefault("train_outputs", True)
    net = model_cls(**mkw)
    harness = FlowHarness(
        net, lr=args.lr, div_flow=args.div_flow, mixed_precision=args.fp16
    )
    in_ch = 6
    params, opt_state = harness.init(jax.random.key(args.seed), in_ch=in_ch)

    os.makedirs(args.save, exist_ok=True)
    if args.resume:
        params, opt_state, epoch, best = harness.restore_checkpoint(
            params, opt_state, args.save, prefix=args.name,
            best=args.resume == "best",
        )
        print(f"resumed {args.resume} (epoch {epoch}, best EPE {best:.3f})")

    if args.inference:
        ds = DATASETS[args.inference_dataset](
            **_kwargs_for(args, "inference_dataset", DATASETS[args.inference_dataset])
        )
        out = os.path.join(args.save, f"{args.name}_inference")
        harness.infer_to_flo(params, ds, out)
        print(f"wrote {len(ds)} .flo files to {out}")
        return 0

    train_ds = DATASETS[args.training_dataset](
        **_kwargs_for(args, "training_dataset", DATASETS[args.training_dataset])
    )
    val_ds = DATASETS[args.validation_dataset](
        **_kwargs_for(args, "validation_dataset", DATASETS[args.validation_dataset])
    )
    print(f"train: {len(train_ds)} pairs, val: {len(val_ds)} pairs")
    _, _, best = harness.fit(
        params, opt_state, train_ds, val_ds, args.total_epochs,
        save_dir=args.save, prefix=args.name, log_every=args.log_frequency,
    )
    print(f"best val EPE: {best:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
