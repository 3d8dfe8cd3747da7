"""BCE / focal losses as pure functions (reference modules/detection_loss.py:12-39).

The reference focal form is `alpha * (1 - exp(-bce))**gamma * bce` computed
from the BCE value itself (not the standard p_t formulation) — reproduced
exactly.
"""
from typing import Optional

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross entropy with logits (no reduction).

    Numerically stable: max(x,0) - x*t + log(1+exp(-|x|)).
    """
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    return jnp.maximum(x, 0.0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))


def focal_loss_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 1.5,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Reference FocalLoss.forward with with_logits=True, reduction='none'."""
    bce = bce_with_logits(logits, targets)
    pt = jnp.exp(-bce)
    return (alpha * (1.0 - pt) ** gamma) * bce


def make_binary_lossfn(alpha: Optional[float], gamma: Optional[float]):
    """conf/cls loss factory: focal when alpha & gamma set, else plain BCE
    (reference detection_loss.py:74-79)."""
    if alpha and gamma:
        return lambda lg, t: focal_loss_with_logits(lg, t, gamma=gamma, alpha=alpha)
    return bce_with_logits


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element CE with integer labels (torch nn.CrossEntropyLoss, no reduction)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
