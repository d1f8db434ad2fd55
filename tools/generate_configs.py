#!/usr/bin/env python
"""Generate the experiment config matrix programmatically.

The reference duplicates 771 YAML files across ``config/<method>/[ood/]
<method>_<shot>shot_<iid|ood>_seed<k>.yaml`` (SURVEY §5.6).  This tool emits
any slice of the same matrix — all 34 methods × shots × splits × seeds —
from one parametric description; the framework also accepts the reference's
hand-written YAMLs unchanged.

Usage:
    python tools/generate_configs.py                      # default slice
    python tools/generate_configs.py --methods proto maml --shots 1 5
    python tools/generate_configs.py --methods all --out config
"""

from __future__ import annotations

import argparse
import os

import yaml

CONV = "backbones/Conv64F.yaml"
R12 = "backbones/resnet12.yaml"
BDC = "backbones/resnet12Bdc.yaml"

# method key → (classifier section, backbone include, extra leaf keys)
METHODS = {
    # metric family
    "proto": ({"name": "ProtoNet", "kwargs": None}, CONV, {}),
    "metabaseline": ({"name": "MetaBaseline", "kwargs": None}, R12, {}),
    "dn4": ({"name": "DN4", "kwargs": {"n_k": 3}}, CONV,
            {"_no_flatten": True}),
    "relationnet": ({"name": "RelationNet", "kwargs": {"feat_dim": 64}}, CONV,
                    {"_no_flatten": True}),
    "adm": ({"name": "ADM", "kwargs": {"n_k": 3}}, CONV, {"_no_flatten": True}),
    "adm_kl": ({"name": "ADM_KL", "kwargs": {"n_k": 3}}, CONV,
               {"_no_flatten": True}),
    "atlnet": ({"name": "ATLNet", "kwargs": {"feat_dim": 64}}, CONV,
               {"_no_flatten": True}),
    "can": ({"name": "CAN", "kwargs": {"scale_cls": 7, "num_classes": 25}},
            R12, {"_no_flatten": True}),
    "convmnet": ({"name": "ConvMNet", "kwargs": None}, CONV,
                 {"_no_flatten": True}),
    # reference config/dsn.yaml ships discriminative: True
    "dsn": ({"name": "DSN", "kwargs": {"discriminative": True}}, R12, {}),
    # temperature/balance mirror the reference's shipped audio recipe
    # (config/feat.yaml:17-22) — the image-paper values (64/16/0.1)
    # underfit under the reference's inverted loss weighting (feat.py:230)
    "feat": ({"name": "FEAT", "kwargs": {"hdim": 640, "temperature": 1.0,
                                         "temperature2": 1.0, "balance": 0.5,
                                         "mode": "euclidean"}}, R12, {}),
    "frn": ({"name": "FRN", "kwargs": None}, R12, {"_no_flatten": True}),
    "deepbdc": ({"name": "DeepBDC", "kwargs": None}, BDC, {}),
    "kendall": ({"name": "MetaBaselineKendall", "kwargs": None}, R12, {}),
    "mcl": ({"name": "MCL", "kwargs": {"katz_factor": 0.5, "gamma": 20.0,
                                       "gamma2": 10.0}}, CONV,
            {"_no_flatten": True}),
    "cpea": ({"name": "CPEANet", "kwargs": {"in_dim": 192}},
             "backbones/Conv64F.yaml", {"_vit": True}),
    # meta family
    "maml": ({"name": "MAML", "kwargs": {"inner_param": {
        "lr": 0.01, "train_iter": 5, "test_iter": 10}}}, CONV,
        {"episode_size": 2}),
    "anil": ({"name": "ANIL", "kwargs": {"inner_param": {
        "lr": 0.01, "train_iter": 5, "test_iter": 10}}}, CONV, {}),
    # mirrors reference config/classifiers/BOIL.yaml exactly: equal inner
    # LRs, NIL eval, and NO train_iter override (the reference trains with
    # a single inner step, boil.py:126-135 — see heads/maml.py BOIL)
    "boil": ({"name": "BOIL", "kwargs": {
        "inner_param": {"extractor_lr": 0.01, "classifier_lr": 0.01},
        "testing_method": "NIL"}}, CONV, {}),
    "r2d2": ({"name": "R2D2", "kwargs": None}, CONV, {}),
    "leo": ({"name": "LEO", "kwargs": {
        "hid_dim": 64, "kl_weight": 0.001, "encoder_penalty_weight": 1e-9,
        "orthogonality_penalty_weight": 1e-3,
        # inner LRs mirror reference config/leo_*.yaml (both 1e-2)
        "inner_para": {"iter": 5, "lr": 0.01, "finetune_iter": 5,
                       "finetune_lr": 0.01}}}, CONV, {}),
    "versa": ({"name": "VERSA", "kwargs": {"sample_num": 10, "d_theta": 256,
                                           "drop_rate": 0.5}}, CONV, {}),
    "mtl": ({"name": "MTL", "kwargs": {"inner_param": {
        "iter": 100, "lr": 0.01}}},
        "backbones/resnet12.yaml", {}),
    # test_iter 5 mirrors reference config/metal.yaml
    "metal": ({"name": "MeTAL", "kwargs": {"inner_param": {
        "lr": 0.01, "train_iter": 5, "test_iter": 5}}}, CONV, {}),
    "ifsl": ({"name": "DMatchingNet", "kwargs": {"ifsl_param": {
        "n_splits": 4, "class_num": 25, "temp": 10.0}}}, CONV, {}),
    # finetuning family
    "baseline": ({"name": "Baseline", "kwargs": {
        "num_class": 25, "inner_param": {
            "inner_train_iter": 20, "inner_batch_size": 4,
            "inner_optim": {"lr": 0.01, "momentum": 0.9,
                            "weight_decay": 0.001}}}}, CONV, {}),
    "baseline_plus": ({"name": "BaselinePlus", "kwargs": {
        "num_class": 25, "inner_param": {
            "inner_train_iter": 20, "inner_batch_size": 4,
            "inner_optim": {"lr": 0.01, "momentum": 0.9}}}}, CONV, {}),
    "rfs": ({"name": "RFSModel", "kwargs": {"num_class": 25}}, R12, {}),
    # gamma/alpha mirror reference config/skd.yaml (1.0 / 0.1)
    "skd": ({"name": "SKDModel", "kwargs": {"num_class": 25, "gamma": 1.0,
                                            "alpha": 0.1}}, R12, {}),
    "negnet": ({"name": "NegNet", "kwargs": {"num_class": 25,
                                             "margin": -0.01}}, R12, {}),
    "renet": ({"name": "RENet", "kwargs": {"feat_dim": 640,
                                           "num_class": 25}}, R12,
              {"_no_flatten": True}),
    "s2m2": ({"name": "S2M2", "kwargs": {"num_class": 25}},
             "backbones/Conv64F.yaml", {}),
    "metabaseline_pretrain": ({"name": "MetabaselinePretrain",
                               "kwargs": {"num_class": 25}}, R12, {}),
    "deepbdc_pretrain": ({"name": "DeepBDC_Pretrain",
                          "kwargs": {"num_class": 25, "val_type": "meta"}},
                         BDC, {}),
    "frn_pretrain": ({"name": "FRN_Pretrain", "kwargs": {"num_class": 25}},
                     R12, {}),
}

ALPHA_ROOTS = {
    "iid": "KOS_1_alpha_spec",
    "ood": "KOS_0_alpha_spec",
}


def leaf_config(method, shot, split, seed):
    cls_section, bk_inc, extra = METHODS[method]
    extra = dict(extra)
    no_flatten = extra.pop("_no_flatten", False)
    vit = extra.pop("_vit", False)
    cfg = {
        "includes": [
            "headers/data.yaml",
            "headers/device.yaml",
            "headers/misc.yaml",
            "headers/model.yaml",
            "headers/optimizer.yaml",
            bk_inc,
        ],
        "classifier": cls_section,
        "way_num": 5,
        "shot_num": shot,
        "query_num": 10,
        "seed": seed,
        "ood": split == "ood",
        "tag": f"{method}_{shot}shot_{split}_seed{seed}",
    }
    if no_flatten:
        # dense-map override: the conv nets disable pooling flags, the
        # resnets disable the avg-pool head
        if bk_inc == CONV:
            cfg["backbone"] = {"kwargs": {"is_flatten": False,
                                          "last_pool": False}}
        else:
            cfg["backbone"] = {"kwargs": {"is_flatten": False,
                                          "avg_pool": False}}
    if vit:
        cfg["includes"] = [i for i in cfg["includes"] if "backbones/" not in i]
        cfg["backbone"] = {"name": "vit_tiny",
                           "kwargs": {"patch_size": 16, "num_channels": 1}}
    cfg.update(extra)
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", nargs="+", default=["proto", "deepbdc", "maml"])
    ap.add_argument("--shots", nargs="+", type=int, default=[1, 5, 10])
    ap.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 42])
    ap.add_argument("--splits", nargs="+", default=["iid", "ood"])
    ap.add_argument("--out", default="config")
    args = ap.parse_args()

    methods = sorted(METHODS) if args.methods == ["all"] else args.methods
    count = 0
    for method in methods:
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
    print(f"wrote {count} configs under {args.out}/ ({len(methods)} methods)")


if __name__ == "__main__":
    main()
