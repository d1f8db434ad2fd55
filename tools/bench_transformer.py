#!/usr/bin/env python
"""Transformer-backbone eval throughput on the live chip (VERDICT r4
next-round #3: every TPU number before round 5 was Conv64F/resnet12*).

Measures eval eps/s/chip with the same salt-chained anti-dedup loop
bench.py uses, for:
  - CPEANet / vit_tiny   on [1,128,157] log-mels (patch 16 -> 8x9+cls)
  - ProtoNet / swin_mini on [1,96,144] (downscaling 3/2/2/1, window 4)

Run: python tools/bench_transformer.py [--episodes-per-chip 8] [--iters 10]
Prints one JSON line; rows recorded in BASELINE.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(model_cfg, spec, e_per_chip, n_iters, way=5, shot=5, query=10):
    import jax
    import jax.numpy as jnp

    from audio_fewshot_tpu.episode import make_dense_episode_batch
    from audio_fewshot_tpu.models import build_method, eval_setting
    from audio_fewshot_tpu.parallel import get_mesh, replicate, shard_batch

    config = {
        **model_cfg,
        "modality": "audio",
        "way_num": way, "shot_num": shot, "query_num": query,
        "test_way": way, "test_shot": shot, "test_query": query,
    }
    method = build_method(config)
    setting = eval_setting(config)
    mesh = get_mesh()
    n_chips = len(mesh.devices.ravel())

    e = e_per_chip * n_chips
    rng = np.random.default_rng(0)
    sup = rng.normal(size=(e, way * shot) + spec).astype(np.float32)
    qry = rng.normal(size=(e, way * query) + spec).astype(np.float32)
    dev_batch = shard_batch(
        make_dense_episode_batch(sup, qry, way, shot, query), mesh
    )
    variables = method.init_variables(jax.random.PRNGKey(0), dev_batch, setting)
    variables = jax.device_put(variables, replicate(mesh))

    @jax.jit
    def eval_step(variables, batch, salt):
        batch = batch.replace(query=batch.query + salt * 1e-12)
        seg_logits = method.forward(variables, batch, setting)
        return jnp.sum(method.eval_episode_accuracy(seg_logits, batch))

    s = jax.device_put(np.float32(1.0), replicate(mesh))
    t0 = time.perf_counter()
    float(eval_step(variables, dev_batch, s))  # compile + warm
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_iters):
        s = eval_step(variables, dev_batch, s)
    float(s)
    dt = time.perf_counter() - t0
    return n_iters * e / dt / n_chips, compile_s


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes-per-chip", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from audio_fewshot_tpu.train import enable_compilation_cache

    enable_compilation_cache({})

    cpea, cpea_compile = measure(
        {"backbone": {"name": "vit_tiny",
                      "kwargs": {"patch_size": 16, "num_channels": 1}},
         "classifier": {"name": "CPEANet", "kwargs": None}},
        spec=(1, 128, 157),
        e_per_chip=args.episodes_per_chip, n_iters=args.iters,
    )
    print(f"cpea/vit_tiny: {cpea:.2f} eps/s/chip "
          f"(first compile {cpea_compile:.1f}s)", file=sys.stderr, flush=True)
    swin, swin_compile = measure(
        {"backbone": {"name": "swin_mini",
                      "kwargs": {"window_size": 4, "num_channels": 1}},
         "classifier": {"name": "ProtoNet", "kwargs": None}},
        spec=(1, 96, 144),
        e_per_chip=args.episodes_per_chip, n_iters=args.iters,
    )
    print(f"proto/swin_mini: {swin:.2f} eps/s/chip "
          f"(first compile {swin_compile:.1f}s)", file=sys.stderr, flush=True)
    print(json.dumps({
        "cpea_vit_tiny_eval_eps_per_sec_per_chip": round(cpea, 2),
        "cpea_vit_tiny_first_compile_s": round(cpea_compile, 1),
        "proto_swin_mini_eval_eps_per_sec_per_chip": round(swin, 2),
        "proto_swin_mini_first_compile_s": round(swin_compile, 1),
    }))


if __name__ == "__main__":
    main()
