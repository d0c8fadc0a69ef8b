"""Convert reference PyTorch checkpoints into framework param trees.

Usage:
  python -m vid2vid_tpu.tools.convert_checkpoint \
      --kind composite --pth checkpoints/label2city_1024/latest_net_G0.pth \
      --out checkpoints/label2city_1024/state/G0 \
      [--n-downsampling 3 --n-blocks 9 --norm batch --fg --no-flow]

  kinds: composite | composite_local | global | global_with_features |
         encoder | nlayer_d | multiscale_d | flownet2 | vgg19

Writes an orbax pytree directory loadable by the inference/test CLIs.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    import orbax.checkpoint as ocp

    from vid2vid_tpu.utils import torch_import as ti

    p = argparse.ArgumentParser()
    p.add_argument("--kind", required=True)
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--n-downsampling", type=int, default=3)
    p.add_argument("--n-blocks", type=int, default=9)
    p.add_argument("--n-blocks-local", type=int, default=3)
    p.add_argument("--n-layers-d", type=int, default=3)
    p.add_argument("--num-d", type=int, default=2)
    p.add_argument("--norm", default="batch")
    p.add_argument("--fg", action="store_true")
    p.add_argument("--no-flow", action="store_true")
    p.add_argument("--scale", type=int, default=1)
    args = p.parse_args(argv)

    sd = ti.load_torch_state_dict(args.pth)
    if args.kind == "composite":
        mapping = ti.composite_generator_mapping(
            args.n_downsampling, args.n_blocks, args.norm, args.fg, args.no_flow
        )
    elif args.kind == "composite_local":
        mapping = ti.composite_local_mapping(
            args.n_blocks_local, args.norm, args.fg, args.no_flow
        )
    elif args.kind == "global":
        mapping = ti.global_generator_mapping(
            args.n_downsampling, args.n_blocks, args.norm
        )
    elif args.kind == "global_with_features":
        mapping = ti.global_with_features_mapping(
            args.n_downsampling, args.n_blocks, args.norm
        )
    elif args.kind == "encoder":
        mapping = ti.encoder_mapping(args.n_downsampling, args.norm)
    elif args.kind == "nlayer_d":
        mapping = ti.nlayer_discriminator_mapping(args.n_layers_d, args.norm)
    elif args.kind == "multiscale_d":
        mapping = ti.multiscale_discriminator_mapping(
            args.num_d, args.n_layers_d, args.norm
        )
    elif args.kind == "flownet2":
        mapping = ti.flownet2_mapping()
    elif args.kind == "vgg19":
        mapping = ti.vgg19_mapping()
    else:
        raise SystemExit(f"unknown kind {args.kind}")

    tree = ti.apply_mapping(sd, mapping, strict=False)
    out = os.path.abspath(args.out)
    ocp.PyTreeCheckpointer().save(out, tree, force=True)
    n = sum(x.size for x in _leaves(tree))
    print(f"converted {len(sd)} torch tensors -> {out} ({n/1e6:.1f}M params)")


def _leaves(tree):
    import jax

    return jax.tree.leaves(tree)


if __name__ == "__main__":
    main()
