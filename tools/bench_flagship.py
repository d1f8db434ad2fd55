"""Flagship (DeepBDC / resnet12Bdc) eval throughput sweep + roofline.

Measures eval episodes/sec across batch sizes and variants (XLA vs fused
Pallas BDC), and derives MFU from the XLA-compiled FLOP count — the evidence
VERDICT r1 item 3 asks for: either ≥250 eps/s/chip or a profiler-backed
roofline note showing the stage-4 convs are MXU-bound.

Usage: python tools/bench_flagship.py [--episodes 4 8 16] [--fused]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_TFLOPS = 197.0  # per chip


def build_step(fused: bool, reduce_dim: int = 64):
    import jax
    import jax.numpy as jnp

    from audio_fewshot_tpu.models import build_method, eval_setting

    config = {
        "backbone": {"name": "resnet12Bdc",
                     "kwargs": {"num_channels": 1, "reduce_dim": reduce_dim,
                                "fused_bdc": fused}},
        "classifier": {"name": "DeepBDC", "kwargs": None},
        "modality": "audio",
        "way_num": 5, "shot_num": 5, "query_num": 10,
        "test_way": 5, "test_shot": 5, "test_query": 10,
    }
    method = build_method(config)
    setting = eval_setting(config)

    @jax.jit
    def eval_step(variables, batch, salt):
        batch = batch.replace(query=batch.query + salt * 1e-12)
        seg_logits = method.forward(variables, batch, setting)
        acc = method.eval_episode_accuracy(seg_logits, batch)
        return jnp.sum(acc)

    return method, setting, eval_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, nargs="+", default=[4, 8, 16])
    ap.add_argument("--fused", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    from audio_fewshot_tpu.episode import make_dense_episode_batch
    from audio_fewshot_tpu.parallel import get_mesh, replicate, shard_batch

    mesh = get_mesh()
    n_chips = len(mesh.devices.ravel())
    method, setting, eval_step = build_step(args.fused)

    way, shot, query = 5, 5, 10
    spec = (1, 128, 157)
    rng = np.random.default_rng(0)

    for e_per_chip in args.episodes:
        e = e_per_chip * n_chips
        sup = rng.normal(size=(e, way * shot) + spec).astype(np.float32)
        qry = rng.normal(size=(e, way * query) + spec).astype(np.float32)
        dev_batch = shard_batch(
            make_dense_episode_batch(sup, qry, way, shot, query), mesh
        )
        variables = method.init_variables(jax.random.PRNGKey(0), dev_batch, setting)
        variables = jax.device_put(variables, replicate(mesh))

        salt0 = jax.device_put(np.float32(1.0), replicate(mesh))
        lowered = eval_step.lower(variables, dev_batch, salt0)
        compiled = lowered.compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0)) if cost else 0.0

        float(eval_step(variables, dev_batch, salt0))  # warm
        t0 = time.perf_counter()
        s = salt0
        for _ in range(args.iters):
            s = eval_step(variables, dev_batch, s)
        float(s)
        dt = time.perf_counter() - t0

        eps = args.iters * e / dt
        per_chip = eps / n_chips
        tflops = flops * args.iters / dt / 1e12 / n_chips
        mfu = tflops / V5E_BF16_PEAK_TFLOPS
        print(json.dumps({
            "episodes_per_chip": e_per_chip,
            "fused_bdc": args.fused,
            "eps_per_sec_per_chip": round(per_chip, 2),
            "step_flops_G": round(flops / 1e9, 1),
            "flops_per_episode_G": round(flops / e / 1e9, 2),
            "achieved_tflops_per_chip": round(tflops, 1),
            "mfu_vs_v5e_bf16_peak": round(mfu, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
