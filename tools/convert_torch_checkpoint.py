#!/usr/bin/env python
"""Convert a reference (PyTorch) backbone checkpoint to our format.

Reads a ``.pth`` torch state dict (an ``emb_func_best.pth`` part checkpoint
or a full ``model_best.pth`` — ``emb_func.``-prefixed keys are extracted),
maps it onto our flax layout (utils/torch_convert.py), and writes a
``load_part``-compatible msgpack file for the ``pretrain_path`` flow:

    python tools/convert_torch_checkpoint.py emb_func_best.pth \
        --backbone resnet12 --out emb_func_converted.pth \
        --num_channels 1 --example_shape 1,128,157

Then in a config: ``pretrain_path: emb_func_converted.pth``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help="reference torch .pth state dict")
    ap.add_argument("--backbone", required=True,
                    help="backbone registry name (Conv64F, resnet12, ...)")
    ap.add_argument("--out", required=True, help="output msgpack path")
    ap.add_argument("--num_channels", type=int, default=1)
    ap.add_argument("--example_shape", default="1,128,157",
                    help="C,F,T example input used to init the template")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (conversion needs no "
                         "accelerator; tests use this to stay off a "
                         "possibly-unreachable remote TPU)")
    ap.add_argument("--backbone_kwargs", default="",
                    help="extra kwargs as k=v,k=v (values YAML-parsed)")
    args = ap.parse_args()

    import numpy as np
    import torch
    import yaml

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import audio_fewshot_tpu.models  # noqa: F401  (populate registries)
    from audio_fewshot_tpu.registry import BACKBONES
    from audio_fewshot_tpu.utils.checkpoint import save_variables
    from audio_fewshot_tpu.utils.torch_convert import convert_backbone_state_dict

    raw = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
    if hasattr(raw, "state_dict"):
        raw = raw.state_dict()
    state = {k: v.numpy() for k, v in raw.items() if hasattr(v, "numpy")}

    kwargs = {"num_channels": args.num_channels, "dtype": jnp.float32}
    for pair in filter(None, args.backbone_kwargs.split(",")):
        k, v = pair.split("=", 1)
        kwargs[k.strip()] = yaml.safe_load(v)
    backbone = BACKBONES.build(args.backbone, **kwargs)

    shape = tuple(int(s) for s in args.example_shape.split(","))
    template = backbone.init(
        jax.random.PRNGKey(0), jnp.zeros((1,) + shape, jnp.float32), train=False
    )
    converted = convert_backbone_state_dict(state, args.backbone, template)
    save_variables(
        args.out,
        {col: {"emb_func": tree} for col, tree in converted.items()},
    )
    n = sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(converted))
    print(f"wrote {args.out}: {n / 1e6:.2f}M parameters "
          f"({args.backbone}, part 'emb_func')")
    return 0


if __name__ == "__main__":
    sys.exit(main())
