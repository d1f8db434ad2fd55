#!/usr/bin/env python
"""Generate the experiment config matrix programmatically.

The reference duplicates 771 YAML files across ``config/<method>/[ood/]
<method>_<shot>shot_<iid|ood>_seed<k>.yaml`` (SURVEY §5.6).  This tool emits
any slice of the same matrix from one parametric description — and the
framework still accepts the reference's hand-written YAMLs unchanged.

Usage:
    python tools/generate_configs.py --methods proto deepbdc maml \
        --shots 1 5 10 --seeds 0 1 42 --splits iid ood --out config
"""

from __future__ import annotations

import argparse
import os

import yaml

# method key → (classifier include, backbone include, extra leaf keys)
METHODS = {
    "proto": ("classifiers/Proto.yaml", "backbones/Conv64F.yaml", {}),
    "deepbdc": ("classifiers/DeepBDC.yaml", "backbones/resnet12Bdc.yaml", {}),
    "maml": ("classifiers/MAML.yaml", "backbones/Conv64F.yaml",
             {"episode_size": 2}),
}

ALPHA_ROOTS = {
    "iid": "KOS_1_alpha_spec",
    "ood": "KOS_0_alpha_spec",
}


def leaf_config(method, shot, split, seed):
    cls_inc, bk_inc, extra = METHODS[method]
    cfg = {
        "includes": [
            "headers/data.yaml",
            "headers/device.yaml",
            "headers/misc.yaml",
            "headers/model.yaml",
            "headers/optimizer.yaml",
            cls_inc,
            bk_inc,
        ],
        "way_num": 5,
        "shot_num": shot,
        "query_num": 10,
        "seed": seed,
        "ood": split == "ood",
        "tag": f"{method}_{shot}shot_{split}_seed{seed}",
    }
    cfg.update(extra)
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", nargs="+", default=sorted(METHODS))
    ap.add_argument("--shots", nargs="+", type=int, default=[1, 5, 10])
    ap.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 42])
    ap.add_argument("--splits", nargs="+", default=["iid", "ood"])
    ap.add_argument("--out", default="config")
    args = ap.parse_args()

    count = 0
    for method in args.methods:
        for split in args.splits:
            outdir = os.path.join(args.out, method)
            if split == "ood":
                outdir = os.path.join(outdir, "ood")
            os.makedirs(outdir, exist_ok=True)
            for shot in args.shots:
                for seed in args.seeds:
                    path = os.path.join(
                        outdir, f"{method}_{shot}shot_{split}_seed{seed}.yaml"
                    )
                    with open(path, "w") as f:
                        yaml.safe_dump(
                            leaf_config(method, shot, split, seed), f,
                            sort_keys=False,
                        )
                    count += 1
    print(f"wrote {count} configs under {args.out}/")


if __name__ == "__main__":
    main()
