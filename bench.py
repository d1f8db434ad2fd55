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
    from audio_fewshot_tpu.train import enable_compilation_cache

    enable_compilation_cache({})  # persistent cache — repeat runs skip compiles

    method = build_method(config)
    setting = eval_setting(config)
    mesh = get_mesh()
    n_chips = len(mesh.devices.ravel())

    # Eval batches: E episodes of 5-way 5-shot, 10 query clips/way,
    # single-segment queries (the throughput-defining dense path).
    # 32 episodes/chip saturates the v5e (measured: 919→1196 eps/s, 8→32).
    # DISTINCT device-resident batches per iteration: some runtimes
    # (the axon tunnel) dedup-cache identical (fn, args) executions, which
    # turns a same-batch loop into a no-op measurement.
    e = 32 * n_chips
    way, shot, query = 5, 5, 10
    spec = (1, 128, 157)
    rng = np.random.default_rng(0)
    sup = rng.normal(size=(e, way * shot) + spec).astype(np.float32)
    qry = rng.normal(size=(e, way * query) + spec).astype(np.float32)
    dev_batch = shard_batch(make_dense_episode_batch(sup, qry, way, shot, query), mesh)

    variables = method.init_variables(jax.random.PRNGKey(0), dev_batch, setting)
    variables = jax.device_put(variables, replicate(mesh))

    # Each timed call takes the previous call's (scalar) result as a salt
    # folded into the inputs and returns a new scalar: the data dependency
    # chains the executions, the changing salt makes every argument set
    # novel, and ONE host transfer at the end forces real completion.
    # Without this, the axon-tunnel runtime (a) treats block_until_ready as
    # a no-op ack and (b) dedup-caches identical executions — a naive
    # same-batch loop "measured" 500× the hardware's capability.
    @jax.jit
    def eval_step(variables, batch, salt):
        batch = batch.replace(query=batch.query + salt * 1e-12)
        seg_logits = method.forward(variables, batch, setting)
        acc = method.eval_episode_accuracy(seg_logits, batch)
        return jnp.sum(acc)

    salt0 = jax.device_put(np.float32(1.0), replicate(mesh))
    float(eval_step(variables, dev_batch, salt0))  # compile + warm

    n_iters = 20
    t0 = time.perf_counter()
    s = salt0
    for _ in range(n_iters):
        s = eval_step(variables, dev_batch, s)
    float(s)  # single forced sync
    dt = time.perf_counter() - t0

    eps_per_sec = n_iters * e / dt
    per_chip = eps_per_sec / n_chips

    # -- secondary metrics (stderr) ----------------------------------------
    # p50 single-episode latency: one episode per call, replicated (a
    # single episode can't shard across a multi-chip mesh)
    one = jax.tree_util.tree_map(
        lambda x: jax.device_put(x[:1], replicate(mesh)), dev_batch
    )
    s = jax.device_put(np.float32(1.0), replicate(mesh))
    float(eval_step(variables, one, s))
    lats = []
    for i in range(30):
        t0 = time.perf_counter()
        s = eval_step(variables, one, s)
        float(s)  # forced per-call sync — this IS the latency metric
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lats) * 1e3)

    # mel-frames/sec of the waveform→log-mel frontend
    from audio_fewshot_tpu.ops.mel import log_mel_spectrogram

    wave = jnp.asarray(
        rng.normal(size=(64, 22050 * 5)).astype(np.float32)
    )
    # chained salt + single final sync, same anti-caching pattern
    mel_step = jax.jit(
        lambda w, s: jnp.mean(log_mel_spectrogram(w + s * 1e-12))
    )
    mel_shape = log_mel_spectrogram(wave).shape
    s = jax.device_put(np.float32(1.0), replicate(mesh))
    float(mel_step(wave, s))
    t0 = time.perf_counter()
    for _ in range(10):
        s = mel_step(wave, s)
    float(s)
    frames_per_sec = 10 * mel_shape[0] * mel_shape[-1] / (time.perf_counter() - t0)

    # -- ragged/bucketed eval (the real KOS protocol: multi-segment query
    # clips, clip-id + mask packing — VERDICT r1 item 10) -------------------
    from audio_fewshot_tpu.episode import pack_ragged_episode_batch

    e_r = 8 * n_chips
    max_seg = 8
    rep_rng = np.random.default_rng(1)
    repeats = rep_rng.integers(1, max_seg + 1, size=(e_r * way * query,))
    seg_total = int(repeats.sum())
    sup_r = rng.normal(size=(e_r, way * shot) + spec).astype(np.float32)
    segs = rng.normal(size=(seg_total,) + spec).astype(np.float32)
    ragged = pack_ragged_episode_batch(
        sup_r.reshape(e_r, way * shot, *spec), segs, repeats, way, shot, query
    )
    dev_ragged = shard_batch(ragged, mesh)
    s = jax.device_put(np.float32(1.0), replicate(mesh))
    float(eval_step(variables, dev_ragged, s))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(10):
        s = eval_step(variables, dev_ragged, s)
    float(s)
    ragged_per_chip = 10 * e_r / (time.perf_counter() - t0) / n_chips
    # mask waste: valid segments / padded segment slots
    occupancy = float(np.asarray(ragged.query_mask).mean())

    # -- flagship DeepBDC/resnet12Bdc eval (the entry() config) -------------
    flag_per_chip, flag_mfu = _flagship_metrics(n_chips, mesh)

    # -- TRAIN-step throughput (fwd+bwd+opt; VERDICT r4 next-round #7) ------
    train_proto = _train_throughput(
        n_chips, mesh,
        {"backbone": {"name": "Conv64F",
                      "kwargs": {"is_flatten": False, "last_pool": True,
                                 "num_channels": 1}},
         "classifier": {"name": "ProtoNet", "kwargs": None}},
        e_per_chip=16, n_iters=10,
    )
    train_flag = _train_throughput(
        n_chips, mesh,
        {"backbone": {"name": "resnet12Bdc",
                      "kwargs": {"num_channels": 1, "reduce_dim": 64}},
         "classifier": {"name": "DeepBDC", "kwargs": None}},
        # batch sweep (2026-08-21): 16.2 eps/s @ 4 eps/chip, 18.2 @ 8,
        # 16.4 @ 16 — 8 is the train saturation point (eval saturates at
        # 16).  12 timed iters (~5 s) ride out the multi-second tunnel
        # stalls that made a 4-iter window report 0.8 eps/s.
        e_per_chip=8, n_iters=12,
    )

    print(
        json.dumps(
            {
                "p50_episode_latency_ms": round(p50_ms, 3),
                "mel_frames_per_sec": round(frames_per_sec, 1),
                "ragged_eval_eps_per_sec_per_chip": round(ragged_per_chip, 2),
                "ragged_bucket_occupancy": round(occupancy, 3),
                "flagship_deepbdc_eps_per_sec_per_chip": round(flag_per_chip, 2),
                "flagship_mfu_vs_v5e_bf16_peak": round(flag_mfu, 3),
                "train_proto_eps_per_sec_per_chip": round(train_proto, 2),
                "train_flagship_eps_per_sec_per_chip": round(train_flag, 2),
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
                "flagship_deepbdc_eps_per_sec_per_chip": round(flag_per_chip, 2),
                "flagship_mfu": round(flag_mfu, 3),
                "train_proto_eps_per_sec_per_chip": round(train_proto, 2),
                "train_flagship_eps_per_sec_per_chip": round(train_flag, 2),
            }
        )
    )


def _train_throughput(n_chips, mesh, model_cfg, e_per_chip, n_iters):
    """Steady-state TRAIN-step episode throughput (eps/s/chip): full
    fwd+bwd+SGD apply, salt-chained like the eval loops (VERDICT r4 #7 — a
    train-path regression was previously invisible to the driver bench)."""
    import jax
    import jax.numpy as jnp

    from audio_fewshot_tpu.episode import make_dense_episode_batch
    from audio_fewshot_tpu.models import build_method, train_setting
    from audio_fewshot_tpu.optim import build_optimizer
    from audio_fewshot_tpu.parallel import replicate, shard_batch

    config = {
        **model_cfg,
        "modality": "audio",
        "way_num": 5, "shot_num": 5, "query_num": 10,
        "augment_times": 1,
        "optimizer": {"name": "SGD", "kwargs": {"lr": 1e-3}},
    }
    method = build_method(config)
    setting = train_setting(config)
    optimizer = build_optimizer(config)

    e = e_per_chip * n_chips
    way, shot, query = 5, 5, 10
    spec = (1, 128, 157)
    rng = np.random.default_rng(3)
    sup = rng.normal(size=(e, way * shot) + spec).astype(np.float32)
    qry = rng.normal(size=(e, way * query) + spec).astype(np.float32)
    dev_batch = shard_batch(
        make_dense_episode_batch(sup, qry, way, shot, query), mesh
    )
    variables = method.init_variables(jax.random.PRNGKey(1), dev_batch, setting)
    variables = jax.device_put(variables, replicate(mesh))
    opt_state = jax.device_put(optimizer.init(variables["params"]), replicate(mesh))
    lr_groups = optimizer.lr_tree(variables["params"], 1.0)

    def train_step(variables, opt_state, batch, salt):
        batch = batch.replace(support=batch.support + salt * 1e-12)
        non_params = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(params):
            return method.loss(
                {**non_params, "params": params}, batch, setting,
                jax.random.PRNGKey(0),
            )

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        params, opt_state = optimizer.apply(
            grads, opt_state, variables["params"], lr_groups
        )
        new_vars = {**non_params, "params": params}
        if out.updates:
            new_vars = method.merge_updates(new_vars, out.updates)
        return new_vars, opt_state, loss

    step = jax.jit(train_step, donate_argnums=(0, 1))
    s = jax.device_put(np.float32(1.0), replicate(mesh))
    # 3 warm steps: through the tunnel the first few EXECUTIONS of a big
    # train executable run ~2× slow (server-side warmup; per-iter probe
    # 2026-08-21: iters 0-4 at 0.94 s, then 0.44 s steady)
    for _ in range(3):
        variables, opt_state, s = step(variables, opt_state, dev_batch, s)
    float(s)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n_iters):
        variables, opt_state, s = step(variables, opt_state, dev_batch, s)
    float(s)  # single forced sync
    dt = time.perf_counter() - t0
    return n_iters * e / dt / n_chips


def _flagship_metrics(n_chips, mesh):
    """DeepBDC/resnet12Bdc eval eps/s/chip + MFU at the measured saturation
    point (16 episodes/chip — tools/bench_flagship.py sweep).  The path is
    architecture-bound: 1.47 TFLOP/episode of stride-1 640-ch stage-4 convs
    (see BASELINE.md roofline note)."""
    import jax
    import jax.numpy as jnp

    from audio_fewshot_tpu.episode import make_dense_episode_batch
    from audio_fewshot_tpu.models import build_method, eval_setting
    from audio_fewshot_tpu.parallel import replicate, shard_batch

    config = {
        "backbone": {"name": "resnet12Bdc",
                     "kwargs": {"num_channels": 1, "reduce_dim": 64}},
        "classifier": {"name": "DeepBDC", "kwargs": None},
        "modality": "audio",
        "way_num": 5, "shot_num": 5, "query_num": 10,
        "test_way": 5, "test_shot": 5, "test_query": 10,
    }
    method = build_method(config)
    setting = eval_setting(config)

    e = 16 * n_chips
    way, shot, query = 5, 5, 10
    spec = (1, 128, 157)
    rng = np.random.default_rng(0)
    sup = rng.normal(size=(e, way * shot) + spec).astype(np.float32)
    qry = rng.normal(size=(e, way * query) + spec).astype(np.float32)
    dev_batch = shard_batch(make_dense_episode_batch(sup, qry, way, shot, query), mesh)
    variables = method.init_variables(jax.random.PRNGKey(0), dev_batch, setting)
    variables = jax.device_put(variables, replicate(mesh))

    @jax.jit
    def step(variables, batch, salt):
        batch = batch.replace(query=batch.query + salt * 1e-12)
        seg_logits = method.forward(variables, batch, setting)
        return jnp.sum(method.eval_episode_accuracy(seg_logits, batch))

    salt0 = jax.device_put(np.float32(1.0), replicate(mesh))
    compiled = step.lower(variables, dev_batch, salt0).compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0)) if cost else 0.0

    float(step(variables, dev_batch, salt0))
    n_iters = 5
    t0 = time.perf_counter()
    s = salt0
    for _ in range(n_iters):
        s = step(variables, dev_batch, s)
    float(s)
    dt = time.perf_counter() - t0
    per_chip = n_iters * e / dt / n_chips
    mfu = flops * n_iters / dt / 1e12 / n_chips / 197.0  # v5e bf16 peak
    return per_chip, mfu


if __name__ == "__main__":
    main()
