"""MeTAL — Meta-learning with Task-Adaptive Loss functions (Baik et al.,
ICCV 2021).

Reference: libfewshot_core/model/meta/metal.py — MAML head-adaptation where
the inner objective is support CE PLUS two learned losses: ``meta_loss``
(MLP over [normalized task state ‖ support preds ‖ one-hot targets],
:150-166) and ``meta_query_loss`` (MLP over [classifier-weight state ‖
query preds ‖ prediction entropy], :168-184); per-step "LossAdapter"
networks modulate the meta-loss weights (:239-391).

TPU re-design: inner loop = ``lax.scan`` of grad steps on the classifier
head; the learned losses are step-conditioned MLPs (a learned per-step
embedding replaces the reference's per-step parameter copies — same
task-adaptive capacity, one parameter set); second-order gradients flow
through the scan.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...episode import segment_targets
from ...registry import CLASSIFIERS
from ..base import LossOutput, MethodBase, ModelType, masked_cross_entropy
from ..losses import cross_entropy


class MetaLossNet(nn.Module):
    """Step-conditioned learned loss: MLP(state ‖ step-embedding) → scalar."""

    hid_dim: int = 40
    max_steps: int = 64

    @nn.compact
    def __call__(self, state, step, train: bool = False):
        emb = nn.Embed(self.max_steps, 8, name="step_emb")(step)
        x = jnp.concatenate(
            [state, jnp.broadcast_to(emb, state.shape[:-1] + (8,))], axis=-1
        )
        x = nn.relu(nn.Dense(self.hid_dim, name="fc1")(x))
        return nn.Dense(1, name="fc2")(x)


def _stacked(init, n, shape):
    """Init `n` independent draws of ``init(shape)`` stacked on axis 0."""

    def f(key, _shape, dtype=jnp.float32):
        keys = jax.random.split(key, n)
        return jnp.stack([init(k, shape, dtype) for k in keys])

    return f


class PerStepLossNet(nn.Module):
    """Faithful per-step learned loss (reference ``MetaLossNetwork``,
    metal.py:283-321): ``num_steps`` independent Linear(d,d)+ReLU+
    Linear(d,1) parameter sets.  TPU re-expression: instead of a
    ModuleDict indexed by a python int (un-traceable inside ``lax.scan``),
    the per-step parameters are STACKED on a leading step axis and
    gathered with the traced step index — one dynamic-slice, no
    branching.  ``mods`` are the per-tensor (scale, offset) pairs from
    PerStepLossAdapter (reference StepLossAdapter modulation,
    metal.py:336-353: ``(1 + m)·w + o`` per whole tensor)."""

    in_dim: int
    num_steps: int

    @nn.compact
    def __call__(self, x, step, mods=None):
        d, s = self.in_dim, self.num_steps
        xavier = nn.initializers.xavier_uniform()
        w1 = self.param("w1", _stacked(xavier, s, (d, d)), (s, d, d))
        b1 = self.param("b1", nn.initializers.zeros, (s, d))
        w2 = self.param("w2", _stacked(xavier, s, (d, 1)), (s, d, 1))
        b2 = self.param("b2", nn.initializers.zeros, (s, 1))
        t = [w1[step], b1[step], w2[step], b2[step]]
        if mods is not None:
            t = [(1.0 + m) * v + o for v, (m, o) in zip(t, mods)]
        y = nn.relu(x @ t[0] + t[1])
        return y @ t[2] + t[3]


class PerStepLossAdapter(nn.Module):
    """Reference ``LossAdapter``/``StepLossAdapter`` (metal.py:325-367):
    per-step 2-layer MLP over the task state emitting one generated
    (multiplier, offset) scalar per loss-net tensor, gated by
    zero-initialized ``multiplier_bias``/``offset_bias`` — the adapters
    are exact identities at init.  Same stacked-parameter gather as
    PerStepLossNet."""

    in_dim: int
    num_steps: int
    n_tensors: int = 4  # loss-net linear1.{w,b}, linear2.{w,b}

    @nn.compact
    def __call__(self, x, step):
        d, s, t = self.in_dim, self.num_steps, self.n_tensors
        xavier = nn.initializers.xavier_uniform()
        w1 = self.param("w1", _stacked(xavier, s, (d, d)), (s, d, d))
        b1 = self.param("b1", nn.initializers.zeros, (s, d))
        w2 = self.param("w2", _stacked(xavier, s, (d, 2 * t)), (s, d, 2 * t))
        b2 = self.param("b2", nn.initializers.zeros, (s, 2 * t))
        mb = self.param("multiplier_bias", nn.initializers.zeros, (s, t))
        ob = self.param("offset_bias", nn.initializers.zeros, (s, t))
        h = nn.relu(x @ w1[step] + b1[step])
        out = h @ w2[step] + b2[step]
        gm, go = out[:t], out[t:]
        return [(mb[step][i] * gm[i], ob[step][i] * go[i]) for i in range(t)]


def _normalize(x):
    # torch ``.std()`` is Bessel-corrected (n-1 divisor) — matching it
    # matters once the learned losses are live (the task state feeds the
    # adapters and loss nets directly)
    return (x - x.mean()) / (x.std(ddof=1) + 1e-12)


def _normalize_rows(x, row_mask):
    """``_normalize`` over the elements of VALID rows only: the reference
    operates on unpadded per-episode query stacks (repeats protocol), so
    padded bucket slots must not pollute the normalization statistics.
    Padded rows still get (garbage) normalized values — callers mask them
    out of every downstream reduction."""
    m = row_mask[:, None]
    n = jnp.sum(row_mask) * x.shape[-1]
    mean = jnp.sum(x * m) / n
    var = jnp.sum(jnp.square(x - mean) * m) / (n - 1.0)
    return (x - mean) / (jnp.sqrt(var) + 1e-12)


@CLASSIFIERS.register("MeTAL")
class MeTAL(MethodBase):
    model_type = ModelType.META

    def __init__(self, emb_func, inner_param: Optional[Dict] = None,
                 feat_dim=None, way_num: int = 5, **kwargs):
        super().__init__(emb_func, **kwargs)
        p = dict(inner_param or {})
        self.inner_lr = float(p.get("lr", 0.01))
        self.train_iter = int(p.get("train_iter", 5))
        self.test_iter = int(p.get("test_iter", 10))
        #: ``inner_param.per_step_adapters: true`` selects the reference's
        #: faithful architecture — per-step loss-net parameter copies plus
        #: per-step LossAdapters (metal.py:239-391) — instead of the
        #: default step-conditioned re-design.  Networks are sized by
        #: ``test_iter`` exactly as the reference (MetaLossNetwork
        #: num_steps = args['test_iter'], metal.py:289).
        self.per_step_adapters = bool(p.get("per_step_adapters", False))
        self.way_num = way_num
        self.modules["classifier"] = nn.Dense(way_num)
        if self.per_step_adapters:
            if self.train_iter > self.test_iter:
                raise ValueError(
                    f"per_step_adapters sizes the loss nets by test_iter "
                    f"({self.test_iter}) as the reference does — "
                    f"train_iter {self.train_iter} would index past them "
                    f"(the reference raises KeyError at runtime)"
                )
            s_dim = 3 + 2 * way_num  # loss + 2 head-param means ‖ preds ‖ y
            q_dim = 3 + way_num      # 2 means ‖ preds ‖ entropy
            self.modules["meta_loss"] = PerStepLossNet(s_dim, self.test_iter)
            self.modules["meta_query_loss"] = PerStepLossNet(
                q_dim, self.test_iter
            )
            self.modules["meta_loss_adapter"] = PerStepLossAdapter(
                3, self.test_iter
            )
            self.modules["meta_query_loss_adapter"] = PerStepLossAdapter(
                q_dim, self.test_iter
            )
        else:
            if max(self.train_iter, self.test_iter) > MetaLossNet.max_steps:
                raise ValueError(
                    f"MeTAL inner iters (train {self.train_iter} / test "
                    f"{self.test_iter}) exceed the step-embedding capacity "
                    f"({MetaLossNet.max_steps}) — XLA would silently clamp"
                )
            self.modules["meta_loss"] = MetaLossNet()
            self.modules["meta_query_loss"] = MetaLossNet()

    def _init_head(self, variables, rngs, feats, example_batch, setting):
        if feats.ndim > 2:
            feats = feats.reshape(feats.shape[0], -1)
        sub = self.modules["classifier"].init(rngs["params"], feats[:1])
        self._merge_init(variables, "classifier", sub)
        way = setting.way
        step0 = jnp.zeros((), jnp.int32)
        # support state: [1+2 (loss + head param means) ‖ preds ‖ one-hot]
        s_state = jnp.zeros((2, 3 + 2 * way), jnp.float32)
        sub = self.modules["meta_loss"].init(
            {"params": rngs["params"]}, s_state, step0
        )
        self._merge_init(variables, "meta_loss", sub)
        q_state = jnp.zeros((2, 2 + way + 1), jnp.float32)
        sub = self.modules["meta_query_loss"].init(
            {"params": rngs["params"]}, q_state, step0
        )
        self._merge_init(variables, "meta_query_loss", sub)
        if self.per_step_adapters:
            sub = self.modules["meta_loss_adapter"].init(
                {"params": rngs["params"]}, jnp.zeros((3,), jnp.float32), step0
            )
            self._merge_init(variables, "meta_loss_adapter", sub)
            sub = self.modules["meta_query_loss_adapter"].init(
                {"params": rngs["params"]},
                jnp.zeros((2 + way + 1,), jnp.float32), step0,
            )
            self._merge_init(variables, "meta_query_loss_adapter", sub)

    def _run(self, variables, batch, setting, rng, train, n_steps):
        sup_f, qry_f, updates = self.embed(variables, batch, train=train, rng=rng)
        params = variables["params"]
        way = setting.way

        def head_logits(hp, f):
            return self.modules["classifier"].apply({"params": hp}, f)

        def episode_fn(sup, sup_y, qry, qm):
            head0 = params["classifier"]
            onehot = jax.nn.one_hot(sup_y, way)
            # reference quirk (metal.py:147-153,169): the task-state
            # head-param means come from ``named_parameters()`` — the BASE
            # classifier, not the fast weights — so they are constant
            # across inner steps
            head0_means = jnp.stack(
                [jnp.mean(head0["kernel"]), jnp.mean(head0["bias"])]
            )

            def inner_obj_per_step(hp, step):
                s_preds = head_logits(hp, sup)
                q_preds = head_logits(hp, qry)
                s_loss = cross_entropy(s_preds, sup_y)
                # gradient-flow quirk of the reference's base-weight means:
                # at step 0 the fast parameters ARE the base parameters, so
                # ``autograd.grad(total, fast)`` includes the means path;
                # at steps ≥1 the means still read the base weights —
                # values identical to step 0, but no INNER-grad path (the
                # outer second-order path through the closure remains)
                hp_means = jnp.stack(
                    [jnp.mean(hp["kernel"]), jnp.mean(hp["bias"])]
                )
                step_means = jnp.where(step == 0, hp_means, head0_means)
                task_state = _normalize(
                    jnp.concatenate([s_loss[None], step_means])
                )
                mods_s = self.modules["meta_loss_adapter"].apply(
                    {"params": params["meta_loss_adapter"]}, task_state, step
                )
                s_state = jnp.concatenate(
                    [
                        jnp.broadcast_to(task_state, (sup.shape[0], 3)),
                        s_preds,
                        onehot,
                    ],
                    axis=-1,
                )
                meta_s = self.modules["meta_loss"].apply(
                    {"params": params["meta_loss"]}, _normalize(s_state),
                    step, mods_s,
                ).mean()
                logp = jax.nn.log_softmax(q_preds, axis=-1)
                entropy = jnp.sum(
                    jnp.exp(logp) * logp, axis=-1, keepdims=True
                )
                q_state = jnp.concatenate(
                    [
                        jnp.broadcast_to(step_means, (qry.shape[0], 2)),
                        q_preds,
                        entropy,
                    ],
                    axis=-1,
                )
                # padded query bucket slots must not leak into the learned
                # loss: the reference operates on unpadded repeat stacks
                n_valid = jnp.sum(qm)
                q_norm = _normalize_rows(q_state, qm)
                # adapter input is the instance-mean of the NORMALIZED
                # query state (metal.py:181)
                mods_q = self.modules["meta_query_loss_adapter"].apply(
                    {"params": params["meta_query_loss_adapter"]},
                    jnp.sum(q_norm * qm[:, None], axis=0) / n_valid, step,
                )
                meta_q_rows = self.modules["meta_query_loss"].apply(
                    {"params": params["meta_query_loss"]}, q_norm, step,
                    mods_q,
                )
                meta_q = jnp.sum(meta_q_rows[:, 0] * qm) / n_valid
                return s_loss + meta_s + meta_q

            def inner_obj(hp, step):
                s_preds = head_logits(hp, sup)
                q_preds = head_logits(hp, qry)
                s_loss = cross_entropy(s_preds, sup_y)
                w_means = jnp.stack(
                    [jnp.mean(hp["kernel"]), jnp.mean(hp["bias"])]
                )
                task_state = _normalize(jnp.concatenate([s_loss[None], w_means]))
                s_state = jnp.concatenate(
                    [
                        jnp.broadcast_to(task_state, (sup.shape[0], 3)),
                        s_preds,
                        onehot,
                    ],
                    axis=-1,
                )
                meta_s = self.modules["meta_loss"].apply(
                    {"params": params["meta_loss"]}, _normalize(s_state), step
                ).mean()
                logp = jax.nn.log_softmax(q_preds, axis=-1)
                entropy = jnp.sum(jnp.exp(logp) * logp, axis=-1, keepdims=True)
                q_state = jnp.concatenate(
                    [
                        jnp.broadcast_to(w_means, (qry.shape[0], 2)),
                        q_preds,
                        entropy,
                    ],
                    axis=-1,
                )
                # same padding hygiene as the faithful path (round-5 fix:
                # bucket slots previously polluted the stats and the mean)
                n_valid = jnp.sum(qm)
                q_norm = _normalize_rows(q_state, qm)
                meta_q_rows = self.modules["meta_query_loss"].apply(
                    {"params": params["meta_query_loss"]}, q_norm, step
                )
                meta_q = jnp.sum(meta_q_rows[:, 0] * qm) / n_valid
                return s_loss + meta_s + meta_q

            obj = inner_obj_per_step if self.per_step_adapters else inner_obj

            def step_fn(hp, step):
                grads = jax.grad(obj)(hp, step)
                return (
                    jax.tree_util.tree_map(
                        lambda w, g: w - self.inner_lr * g, hp, grads
                    ),
                    None,
                )

            adapted, _ = jax.lax.scan(
                step_fn, head0, jnp.arange(n_steps, dtype=jnp.int32)
            )
            return head_logits(adapted, qry)

        seg_logits = jax.vmap(episode_fn)(
            sup_f, batch.support_target, qry_f, batch.query_mask
        )
        return seg_logits, updates

    def loss(self, variables, batch, setting, rng):
        seg_logits, updates = self._run(
            variables, batch, setting, rng, True, self.train_iter
        )
        loss = masked_cross_entropy(seg_logits, segment_targets(batch), batch.query_mask)
        return loss, LossOutput(
            seg_logits=seg_logits,
            metrics=self.train_metrics(seg_logits, batch),
            updates=updates,
        )

    def forward(self, variables, batch, setting):
        seg_logits, _ = self._run(
            variables, batch, setting, None, False, self.test_iter
        )
        return seg_logits


# the reference's shipped metal.yaml uses the all-caps name (config/metal.yaml:59)
CLASSIFIERS.register_alias("METAL", "MeTAL")
