"""Box math (pure jnp, fully jittable).

Ports of reference semantics: xywh<->xyxy (utils/utils.py:215-239) and the
full CIoU (modules/detection_loss.py:229-264) including the detached
trade-off term `a` and epsilon placement.
"""
import jax
import jax.numpy as jnp

import math


def xywh2xyxy(b: jnp.ndarray) -> jnp.ndarray:
    x1y1 = b[..., :2] - b[..., 2:4] / 2
    x2y2 = x1y1 + b[..., 2:4]
    return jnp.concatenate([x1y1, x2y2], axis=-1)


def xyxy2xywh(b: jnp.ndarray) -> jnp.ndarray:
    wh = b[..., 2:4] - b[..., :2]
    xy = b[..., :2] + wh / 2
    return jnp.concatenate([xy, wh], axis=-1)


def compute_ciou(preds_xywh: jnp.ndarray, targets_xywh: jnp.ndarray, e: float = 1e-7) -> jnp.ndarray:
    """Complete IoU (reference detection_loss.py:229-264). Last dim = 4 (xywh);
    broadcasting matches the reference (targets may have one fewer dim)."""
    if targets_xywh.ndim != preds_xywh.ndim:
        targets_xywh = targets_xywh[..., None, :]

    pw = preds_xywh[..., 2:3]
    ph = preds_xywh[..., 3:4]
    px1 = preds_xywh[..., 0:1] - pw / 2
    py1 = preds_xywh[..., 1:2] - ph / 2
    px2 = px1 + pw
    py2 = py1 + ph

    tw = targets_xywh[..., 2:3]
    th = targets_xywh[..., 3:4]
    tx1 = targets_xywh[..., 0:1] - tw / 2
    ty1 = targets_xywh[..., 1:2] - th / 2
    tx2 = tx1 + tw
    ty2 = ty1 + th

    iw = jnp.clip(jnp.minimum(px2, tx2) - jnp.maximum(px1, tx1), 0, None)
    ih = jnp.clip(jnp.minimum(py2, ty2) - jnp.maximum(py1, ty1), 0, None)
    inter = iw * ih
    union = pw * ph + tw * th - inter
    iou = inter / (union + e)

    cw = jnp.maximum(px2, tx2) - jnp.minimum(px1, tx1)
    ch = jnp.maximum(py2, ty2) - jnp.minimum(py1, ty1)
    c2 = cw ** 2 + ch ** 2 + e
    # denominators clamped to a tiny eps: torch yields NaN when h underflows
    # to exactly 0 (then zeroes the *value* but not the gradient); clamping is
    # numerically invisible for real boxes and keeps gradients finite.
    v = (4.0 / math.pi ** 2) * jnp.square(
        jnp.arctan(tw / jnp.maximum(th, 1e-9)) - jnp.arctan(pw / jnp.maximum(ph, 1e-9)))
    rho2 = (
        jnp.square(preds_xywh[..., 0:1] - targets_xywh[..., 0:1])
        + jnp.square(preds_xywh[..., 1:2] - targets_xywh[..., 1:2])
    )
    a = jax.lax.stop_gradient(v / (v - iou + (1 + e)))
    ciou = iou - (rho2 / c2 + a * v)
    return jnp.squeeze(ciou, axis=-1)


def box_iou_xyxy(a: jnp.ndarray, b: jnp.ndarray, e: float = 1e-9) -> jnp.ndarray:
    """Pairwise IoU: a (..., N, 4), b (..., M, 4) -> (..., N, M)."""
    a = a[..., :, None, :]
    b = b[..., None, :, :]
    iw = jnp.clip(jnp.minimum(a[..., 2], b[..., 2]) - jnp.maximum(a[..., 0], b[..., 0]), 0, None)
    ih = jnp.clip(jnp.minimum(a[..., 3], b[..., 3]) - jnp.maximum(a[..., 1], b[..., 1]), 0, None)
    inter = iw * ih
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0, None) * jnp.clip(a[..., 3] - a[..., 1], 0, None)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0, None) * jnp.clip(b[..., 3] - b[..., 1], 0, None)
    return inter / (area_a + area_b - inter + e)
