"""Shared loss functions (reference libfewshot_core/model/loss.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, targets[..., None], axis=-1))


def l2_dist_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean (over the batch) Euclidean NORM of the per-sample difference —
    ``mean(sqrt(sum_dim1 (a-b)²))``, the reference's exact form (loss.py:7-16,
    verified by tests/test_loss_parity.py); NaN-safe like the reference
    (returns 0.0 on NaN)."""
    d = pred - target
    loss = jnp.mean(jnp.sqrt(jnp.sum(d * d, axis=1)))
    return jnp.where(jnp.isnan(loss), 0.0, loss)


def label_smooth_ce(logits: jnp.ndarray, targets: jnp.ndarray,
                    smoothing: float = 0.1) -> jnp.ndarray:
    """Label-smoothed cross entropy (reference loss.py:18-31)."""
    n = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(targets, n)
    soft = onehot * (1.0 - smoothing) + smoothing / n
    return -jnp.mean(jnp.sum(soft * logp, axis=-1))


def distill_kl_loss(student_logits: jnp.ndarray, teacher_logits: jnp.ndarray,
                    temperature: float = 4.0) -> jnp.ndarray:
    """KL(teacher ∥ student) at temperature T, scaled by T² (reference
    loss.py:33-45, standard Hinton distillation)."""
    t = temperature
    p_s = jax.nn.log_softmax(student_logits / t, axis=-1)
    p_t = jax.nn.softmax(teacher_logits / t, axis=-1)
    return jnp.mean(jnp.sum(p_t * (jnp.log(jnp.maximum(p_t, 1e-12)) - p_s), axis=-1)) * (t * t)
