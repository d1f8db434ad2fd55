#!/usr/bin/env python
"""Settle BASELINE.md's FEAT lr-0.05 divergence claim with the TORCH oracle
(VERDICT r4 next-round #5).

BASELINE.md records that the reference's shipped FEAT recipe
(/root/reference/config/feat.yaml: Adam lr 0.05, emb_func group 0.01,
StepLR 5/0.5) "diverges at chance on this fixture" and re-tunes to 1e-3 —
but that was only ever observed in THIS rebuild.  This probe trains the
reference torch FEAT (libfewshot_core/model/metric/feat.py, via the
ref-loader harness, CPU) on the same KOS-fixture episodes under both
recipes, so the divergence is attributed to the recipe or to our FEAT.

Finding (2026-08-20, see BASELINE.md): the snapshot's FEAT cannot train AT
ALL as shipped — ``set_forward_loss`` (feat.py:194-200) still does the
stale 4-value unpack of the 5-tuple ``split_by_episode``
(abstract_model.py:412), the same breakage its ``set_forward`` has.  This
probe applies the minimal intended repair (slice off the unused
``query_mask``) so the shipped RECIPE's training dynamics can be measured
at all; that repair choice is documented in the output.

Run: python tools/feat_lr_probe.py [--epochs 3] [--episodes 40]
Needs /tmp/kos_fixture (tools/make_kos_fixture.py).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--episodes", type=int, default=40,
                    help="episodes per epoch (shipped recipe's episode_size 1)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import torch

    import cross_framework_parity as cfp
    from ref_loader import load_ref

    from audio_fewshot_tpu.config import Config
    from audio_fewshot_tpu.data import get_dataloader
    from audio_fewshot_tpu.models.base import ModelType

    torch.manual_seed(args.seed)

    cfg = Config(
        os.path.join(REPO, "config/kos_fixture/feat_5shot.yaml"), cli_args=[]
    ).get_config_dict()
    cfg.update(device_data_bank=False, episode_size=1,
               train_episode=args.episodes, augment=False, prefetch=0)

    way, shot, query = cfg["way_num"], cfg["shot_num"], cfg["query_num"]
    loader = get_dataloader(cfg, "train", ModelType.METRIC, False, "audio")[0]

    def build_model():
        emb = load_ref("libfewshot_core.model.backbone.conv_four").Conv64F(
            is_flatten=True, last_pool=True, maxpool_last2=True,
            num_channels=1,
        )
        feat_mod = load_ref("libfewshot_core.model.metric.feat")
        with cfp.cuda_to_cpu():
            # hdim 1600 = the Conv64F is_flatten logits width, as the shipped
            # audio recipe pins it (/root/reference/config/feat.yaml)
            model = feat_mod.FEAT(
                hdim=1600, temperature=1.0, temperature2=1.0, balance=0.5,
                mode="euclidean", init_type="normal",
                way_num=way, shot_num=shot, query_num=query,
                test_way=way, test_shot=shot, test_query=query,
                emb_func=emb, device="cpu",
            )
        # minimal intended repair: set_forward_loss's stale 4-value unpack
        # of the 5-tuple split (feat.py:194-200 vs abstract_model.py:412);
        # query_mask is unused on the dense train path
        orig_split = model.split_by_episode
        model.split_by_episode = (
            lambda *a, **k: tuple(orig_split(*a, **k))[:4]
        )
        return model

    def run(tag, lr, emb_lr):
        torch.manual_seed(args.seed)
        model = build_model()
        model.train()
        emb_params = list(model.emb_func.parameters())
        emb_ids = {id(p) for p in emb_params}
        rest = [p for p in model.parameters() if id(p) not in emb_ids]
        opt = torch.optim.Adam(
            [{"params": rest, "lr": lr},
             {"params": emb_params, "lr": emb_lr}],
            weight_decay=0.0,
        )
        sched = torch.optim.lr_scheduler.StepLR(opt, step_size=5, gamma=0.5)
        history = []
        for epoch in range(args.epochs):
            accs, losses = [], []
            for b in loader.epoch(epoch):
                images, target, repeats, support_size = (
                    cfp.episode_batch_to_reference(b, way, shot, query)
                )
                batch = (
                    torch.from_numpy(np.ascontiguousarray(images)),
                    torch.from_numpy(target),
                    torch.from_numpy(repeats),
                    support_size,
                )
                with cfp.cuda_to_cpu():
                    _, acc, loss = model.set_forward_loss(batch)
                opt.zero_grad()
                loss.backward()
                opt.step()
                accs.append(float(acc))
                losses.append(float(loss.detach()))
            sched.step()
            history.append({
                "epoch": epoch,
                "train_acc": round(float(np.mean(accs)), 2),
                "loss": round(float(np.mean(losses)), 4),
            })
            print(f"[{tag}] epoch {epoch}: acc {history[-1]['train_acc']:.2f} "
                  f"loss {history[-1]['loss']:.4f}", flush=True)
        return history

    shipped = run("shipped lr0.05/0.01", 0.05, 0.01)
    retuned = run("retuned lr1e-3", 1e-3, 1e-3)
    chance = 100.0 / way
    verdict = {
        "shipped_final_acc": shipped[-1]["train_acc"],
        "retuned_final_acc": retuned[-1]["train_acc"],
        "chance": chance,
        "shipped_diverges": shipped[-1]["train_acc"] < chance + 10.0,
        "retuned_learns": retuned[-1]["train_acc"] > chance + 15.0,
        "history": {"shipped": shipped, "retuned": retuned},
    }
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()
