"""BPA — Balanced Pairwise Affinities feature transform (Shalam & Korman).

Reference: libfewshot_core/model/bpa/{balanced_pairwise_affinities,ot}.py —
self-optimal-transport over the pairwise distance matrix of a feature set
(log-space Sinkhorn, ot.py:37-74), diagonal masking, optional label
adjustment; the transformed affinity rows become the new features.  Wired
into ProtoNet/DeepBDC/Baseline behind disabled switches in the reference
(proto_net.py:142, deepbdc.py:284 — SURVEY §2.3); here it's a live
``use_bpa`` config kwarg.

TPU shape: a fixed-iteration ``lax.scan`` Sinkhorn (the reference's early
break at threshold 0.1 becomes a fixed ``num_iters`` — deterministic and
jit-stable), batched over leading axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DIAG_VAL = 1e5


def log_sinkhorn(cost: jnp.ndarray, reg: float = 0.1, num_iters: int = 10,
                 mask: jnp.ndarray = None) -> jnp.ndarray:
    """Log-space Sinkhorn over ``[..., n, n]`` costs.  Returns the log
    transport plan.  ``mask`` ([..., n], 1 = real row): padded rows get zero
    marginal mass so they carry no transport (their plan rows → −inf)."""
    n = cost.shape[-1]
    if mask is None:
        log_mu = jnp.log(jnp.full(cost.shape[:-1], 1.0 / n) + 1e-8)
    else:
        weights = mask / jnp.maximum(
            jnp.sum(mask, axis=-1, keepdims=True), 1.0
        )
        log_mu = jnp.log(weights + 1e-8)
    log_nu = log_mu

    def modified_cost(u, v):
        return (-cost + u[..., :, None] + v[..., None, :]) / reg

    def step(carry, _):
        u, v = carry
        u = reg * (log_mu - jax.nn.logsumexp(modified_cost(u, v), axis=-1)) + u
        v = reg * (
            log_nu - jax.nn.logsumexp(
                jnp.swapaxes(modified_cost(u, v), -1, -2), axis=-1
            )
        ) + v
        return (u, v), None

    u0 = jnp.zeros(cost.shape[:-1])
    (u, v), _ = jax.lax.scan(step, (u0, u0), None, length=num_iters)
    return modified_cost(u, v)


def bpa_transform(
    x: jnp.ndarray,
    labels: jnp.ndarray = None,
    n_labeled: int = 0,
    num_classes: int = 0,
    distance: str = "cosine",
    ot_reg: float = 0.1,
    sinkhorn_iterations: int = 10,
    mask_diag: bool = True,
    max_scale: bool = True,
    row_mask: jnp.ndarray = None,
) -> jnp.ndarray:
    """BPA features for ``[..., n, d]`` sets → ``[..., n, n]`` affinities.

    ``labels``/``n_labeled``: known labels of the first ``n_labeled`` rows
    (support set) clamp their pairwise affinities to exact 0/1
    (reference ``adjust_labeled``).  ``row_mask`` ([..., n], 1 = real row):
    padded rows are excluded from the transport marginals so the affinities
    of real rows are invariant to the padding/bucket size."""
    n = x.shape[-2]
    if distance == "euclidean":
        d2 = jnp.sum((x[..., :, None, :] - x[..., None, :, :]) ** 2, axis=-1)
        cost = jnp.sqrt(jnp.maximum(d2, 1e-12))
        cost = cost / jnp.max(cost, axis=(-2, -1), keepdims=True)
    else:
        xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        cost = 1.0 - jnp.einsum("...nd,...md->...nm", xn, xn)

    eye = jnp.eye(n, dtype=bool)
    if mask_diag:
        cost = jnp.where(eye, DIAG_VAL, cost)

    log_p = log_sinkhorn(cost, reg=ot_reg, num_iters=sinkhorn_iterations,
                         mask=row_mask)
    p = jnp.exp(log_p)
    if max_scale:
        p = p / jnp.max(p, axis=(-2, -1), keepdims=True)

    if labels is not None and n_labeled > 0:
        onehot = jax.nn.one_hot(labels, num_classes)
        same = jnp.einsum("...nc,...mc->...nm", onehot, onehot) > 0
        known = (
            (jnp.arange(n)[:, None] < n_labeled) & (jnp.arange(n)[None, :] < n_labeled)
        )
        p = jnp.where(known & same, 1.0, p)
        p = jnp.where(known & ~same, 0.0, p)

    if mask_diag:
        p = jnp.where(eye, 1.0, p)
    return p
