"""Mask ops: differentiable box-crop, dice score, prototype-mask assembly.

Ports of reference crop_section / compute_dice_score
(utils/utils.py:130-172) in NHWC-friendly form, plus the YOLACT mask
assembly `sigmoid(protos @ coefs)` (inference_seg.py:123) expressed as one
MXU matmul over channels-last protos.
"""
from typing import Tuple

import jax
import jax.numpy as jnp


def crop_section(image: jnp.ndarray, bboxes_xywh: jnp.ndarray) -> jnp.ndarray:
    """Zero out pixels outside each box (reference utils/utils.py:130-149).

    image: (n, h, w); bboxes_xywh: (n, 4) in pixel units of (w, h).
    The mask is the arange-comparison formulation (already XLA-friendly in
    the reference): r in [x1, x2) and c in [y1, y2).
    """
    _, h, w = image.shape
    xy = bboxes_xywh[:, :2]
    half = bboxes_xywh[:, 2:4] / 2
    x1y1 = xy - half
    x2y2 = xy + half
    r = jnp.arange(w, dtype=image.dtype)[None, None, :]
    c = jnp.arange(h, dtype=image.dtype)[None, :, None]
    x1 = x1y1[:, 0][:, None, None]
    y1 = x1y1[:, 1][:, None, None]
    x2 = x2y2[:, 0][:, None, None]
    y2 = x2y2[:, 1][:, None, None]
    mask = (r >= x1) & (r < x2) & (c >= y1) & (c < y2)
    return image * mask.astype(image.dtype)


def compute_dice_score(
    mask1: jnp.ndarray, mask2: jnp.ndarray, round_tensor: bool = False, e: float = 1e-5
) -> jnp.ndarray:
    """Dice coefficient (reference utils/utils.py:152-172). Masks (n, h, w)
    or (n, c, h, w); returns scalar mean over (n, c)."""
    if mask1.ndim == 3:
        mask1 = mask1[:, None]
        mask2 = mask2[:, None]
    mask1 = jnp.clip(mask1, 0.0, 1.0)
    mask2 = jnp.clip(mask2, 0.0, 1.0)
    if round_tensor:
        mask1 = jnp.round(mask1)
        mask2 = jnp.round(mask2)
    inter = jnp.abs(mask1 * mask2).sum(axis=(2, 3))
    denom = mask1.sum(axis=(2, 3)) + mask2.sum(axis=(2, 3))
    return ((2 * inter + e) / (denom + e)).mean(axis=(0, 1))


def masked_dice_score(
    pred: jnp.ndarray, target: jnp.ndarray, valid: jnp.ndarray,
    round_tensor: bool = False, e: float = 1e-5,
) -> jnp.ndarray:
    """Dice over (n, h, w) masks averaged only across valid rows."""
    pred = jnp.clip(pred, 0.0, 1.0)
    target = jnp.clip(target, 0.0, 1.0)
    if round_tensor:
        pred = jnp.round(pred)
        target = jnp.round(target)
    inter = jnp.abs(pred * target).sum(axis=(1, 2))
    denom = pred.sum(axis=(1, 2)) + target.sum(axis=(1, 2))
    dice = (2 * inter + e) / (denom + e)
    v = valid.astype(dice.dtype)
    return jnp.where(v.sum() > 0, (dice * v).sum() / jnp.maximum(v.sum(), 1), 0.0)


def assemble_masks(protos_hwk: jnp.ndarray, coefs: jnp.ndarray) -> jnp.ndarray:
    """Linear-combine prototypes: protos (h, w, k) @ coefs (n, k) -> (n, h, w) logits."""
    return jnp.einsum("hwk,nk->nhw", protos_hwk, coefs)
