"""Benchmark: 5-way 5-shot eval episode throughput on the flagship path.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} to stdout.
Baseline (driver BASELINE.json north-star): 2000 eval episodes/sec on a
v5e-8 → scaled to the available chip count (episodes/sec/chip × 8 is the
vs_baseline denominator's intent; on 1 chip the target is 250 eps/s/chip).

Secondary tracked metrics (BASELINE.md: p50 episode latency, mel-frames/sec
preprocessing) go to stderr.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from audio_fewshot_tpu.episode import make_dense_episode_batch
    from audio_fewshot_tpu.models import build_method, eval_setting
    from audio_fewshot_tpu.parallel import get_mesh, replicate, shard_batch

    config = {
        "backbone": {
            "name": "Conv64F",
            "kwargs": {"is_flatten": False, "last_pool": True, "num_channels": 1},
        },
        "classifier": {"name": "ProtoNet", "kwargs": None},
        "modality": "audio",
        "way_num": 5,
        "shot_num": 5,
        "query_num": 10,
        "test_way": 5,
        "test_shot": 5,
        "test_query": 10,
    }
    method = build_method(config)
    setting = eval_setting(config)
    mesh = get_mesh()
    n_chips = len(mesh.devices.ravel())

    # One eval batch: E episodes of 5-way 5-shot, 10 query clips/way,
    # single-segment queries (the throughput-defining dense path).
    # 32 episodes/chip saturates the v5e (measured: 919→1196 eps/s from 8→32).
    e = 32 * n_chips
    way, shot, query = 5, 5, 10
    spec = (1, 128, 157)
    rng = np.random.default_rng(0)
    sup = rng.normal(size=(e, way * shot) + spec).astype(np.float32)
    qry = rng.normal(size=(e, way * query) + spec).astype(np.float32)
    batch = make_dense_episode_batch(sup, qry, way, shot, query)

    variables = method.init_variables(jax.random.PRNGKey(0), batch, setting)
    variables = jax.device_put(variables, replicate(mesh))
    dev_batch = shard_batch(batch, mesh)

    @jax.jit
    def eval_step(variables, batch):
        seg_logits = method.forward(variables, batch, setting)
        return method.eval_episode_accuracy(seg_logits, batch)

    # warmup + compile
    eval_step(variables, dev_batch).block_until_ready()

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        acc = eval_step(variables, dev_batch)
    acc.block_until_ready()
    dt = time.perf_counter() - t0

    eps_per_sec = n_iters * e / dt
    per_chip = eps_per_sec / n_chips

    # -- secondary metrics (stderr) ----------------------------------------
    # p50 single-episode latency: one episode per call, replicated (a
    # single episode can't shard across a multi-chip mesh)
    one = jax.tree_util.tree_map(
        lambda x: jax.device_put(x[:1], replicate(mesh)), dev_batch
    )
    eval_step(variables, one).block_until_ready()
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        eval_step(variables, one).block_until_ready()
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lats) * 1e3)

    # mel-frames/sec of the waveform→log-mel frontend
    from audio_fewshot_tpu.ops.mel import log_mel_spectrogram

    wave = jnp.asarray(
        rng.normal(size=(64, 22050 * 5)).astype(np.float32)
    )
    mel = log_mel_spectrogram(wave)
    mel.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        mel = log_mel_spectrogram(wave)
    mel.block_until_ready()
    frames_per_sec = 10 * mel.shape[0] * mel.shape[-1] / (time.perf_counter() - t0)
    print(
        json.dumps(
            {
                "p50_episode_latency_ms": round(p50_ms, 3),
                "mel_frames_per_sec": round(frames_per_sec, 1),
            }
        ),
        file=sys.stderr,
    )

    baseline_per_chip = 2000.0 / 8.0  # v5e-8 north-star
    print(
        json.dumps(
            {
                "metric": "eval_episodes_per_sec_per_chip_5w5s",
                "value": round(per_chip, 2),
                "unit": "episodes/s/chip",
                "vs_baseline": round(per_chip / baseline_per_chip, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
