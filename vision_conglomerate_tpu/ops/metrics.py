"""In-jit classification metrics.

Replaces the reference's sklearn accuracy/f1/precision/recall computed on
matched targets every step (modules/detection_loss.py:198-206) — a CPU sync
inside the hot loop — with a confusion-matrix formulation that stays on
device. Macro averaging follows sklearn semantics: average over the union of
classes present in targets or predictions; per-class precision/recall with a
zero denominator contribute 0.
"""
from typing import Dict, Tuple

import jax.numpy as jnp


def macro_classification_metrics(
    pred_labels: jnp.ndarray,    # (N,) int
    target_labels: jnp.ndarray,  # (N,) int
    valid: jnp.ndarray,          # (N,) bool
    num_classes: int,
    e: float = 1e-12,
) -> Dict[str, jnp.ndarray]:
    """Returns accuracy, macro f1/precision/recall over valid entries.

    When no entry is valid, all four are NaN (the reference yields NaN there
    too, detection_loss.py:205-206; the trainer nan-averages across scales).
    """
    v = valid.astype(jnp.float32)
    n_valid = v.sum()

    # confusion matrix via one-hot outer products: (C, C) [target, pred]
    t_oh = (jnp.arange(num_classes)[None, :] == target_labels[:, None]).astype(jnp.float32) * v[:, None]
    p_oh = (jnp.arange(num_classes)[None, :] == pred_labels[:, None]).astype(jnp.float32) * v[:, None]
    conf = t_oh.T @ p_oh

    tp = jnp.diagonal(conf)
    support = conf.sum(axis=1)      # true count per class
    predicted = conf.sum(axis=0)    # predicted count per class
    present = (support > 0) | (predicted > 0)
    n_present = jnp.maximum(present.sum(), 1)

    prec_c = jnp.where(predicted > 0, tp / (predicted + e), 0.0)
    rec_c = jnp.where(support > 0, tp / (support + e), 0.0)
    f1_c = jnp.where(prec_c + rec_c > 0, 2 * prec_c * rec_c / (prec_c + rec_c + e), 0.0)

    accuracy = tp.sum() / jnp.maximum(n_valid, 1)
    precision = jnp.where(present, prec_c, 0.0).sum() / n_present
    recall = jnp.where(present, rec_c, 0.0).sum() / n_present
    f1 = jnp.where(present, f1_c, 0.0).sum() / n_present

    nan = jnp.float32(jnp.nan)
    has = n_valid > 0
    return {
        "accuracy": jnp.where(has, accuracy, nan),
        "f1": jnp.where(has, f1, nan),
        "precision": jnp.where(has, precision, nan),
        "recall": jnp.where(has, recall, nan),
    }


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray, default: float = 0.0) -> jnp.ndarray:
    """Mean of x over mask; `default` when mask is empty."""
    m = mask.astype(x.dtype)
    denom = m.sum()
    return jnp.where(denom > 0, (x * m).sum() / jnp.maximum(denom, 1), default)
