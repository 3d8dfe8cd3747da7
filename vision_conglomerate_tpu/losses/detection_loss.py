"""Detection loss as a pure jittable function.

Re-design of /root/reference/modules/detection_loss.py:42-264 on top of the
fixed-capacity assigner. Semantics preserved:
- matched preds gathered at (b, gj, gi, a); predicted wh multiplied by the
  matched anchor (grid units) before CIoU (…:139-145);
- conf target = detached CIoU scattered at positive cells, BCE over the full
  grid (…:179-184);
- class BCE with label smoothing cn = 0.5*ls, cp = 1-cn (…:191-195);
- optional focal form for conf/cls when alpha & gamma set (…:74-79);
- keypoint loss: visibility CE + masked (non-finite filtered) xy MSE,
  kp = (1 + kpv) * kpc (…:147-173);
- per-scale weights scale_w then box/conf/class/keypoints aggregation,
  optional batch_scale_loss (…:107-116); NaN losses -> 0 (…:209);
- metrics: mean_ciou, conf/class losses, avg pos/neg conf, macro
  accuracy/f1/precision/recall — all in-jit (the reference's sklearn call is
  a device->CPU sync in the hot loop, …:198-206), nan-averaged across scales
  as the reference's pandas mean does (…:117-121).

Note: the reference accepts `class_weights` but never uses it
(detection_loss.py:70 assigns, nothing reads) — the config field is accepted
here for API parity and likewise unused.
"""
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.boxes import compute_ciou
from ..ops.metrics import macro_classification_metrics, masked_mean
from .assigner import assign_targets_to_scale
from .focal import make_binary_lossfn, softmax_cross_entropy


@dataclass(frozen=True)
class DetectionLossConfig:
    num_classes: int = 1
    num_keypoints: int = 0
    anchor_t: float = 4.0
    edge_t: float = 0.5
    box_w: float = 1.0
    conf_w: float = 1.0
    class_w: float = 1.0
    keypoints_w: float = 1.0
    label_smoothing: float = 0.0
    batch_scale_loss: bool = False
    alpha: Optional[float] = None
    gamma: Optional[float] = None
    scale_w: Tuple[float, float, float] = (4.0, 2.0, 1.0)


def _nan_to_zero(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(jnp.isnan(x), 0.0, x)


def scale_loss(
    preds: jnp.ndarray,       # (B, ny, nx, A, D) train-decoded
    labels: jnp.ndarray,      # (B, M, 5+3Kp)
    label_mask: jnp.ndarray,  # (B, M)
    anchors: jnp.ndarray,     # (A, 2) normalized 0-1
    cfg: DetectionLossConfig,
    image_mask: Optional[jnp.ndarray] = None,  # (B,) row validity; None = all
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Single-scale loss (reference loss_fn, detection_loss.py:125-226).

    `image_mask` marks valid batch rows so wrap-padded eval tail batches
    (DataLoader pad_last="wrap", kept jit-shape-stable) score each sample
    exactly once, matching the reference's drop_last=False ragged-tail batch
    mean. Masked rows contribute no assigned candidates (their label_mask is
    zeroed) and are excluded from the full-grid conf BCE mean. None (the
    train path) keeps the exact unmasked computation.
    """
    b, ny, nx, na, _ = preds.shape
    c = cfg.num_classes
    binfn = make_binary_lossfn(cfg.alpha, cfg.gamma)
    if image_mask is not None:
        imw = image_mask.astype(jnp.float32)  # (B,)
        label_mask = label_mask * imw[:, None].astype(label_mask.dtype)

    asn = assign_targets_to_scale(
        labels, label_mask, (ny, nx), anchors,
        anchor_threshold=cfg.anchor_t, edge_threshold=cfg.edge_t,
    )
    valid = asn.valid
    vf = valid.astype(jnp.float32)
    n_valid = vf.sum()

    match = preds[asn.batch_idx, asn.grid_j, asn.grid_i, asn.anchor_idx]  # (N, D)
    match = match.astype(jnp.float32)
    p_cls = match[:, 1:1 + c]
    # sanitize invalid candidate rows BEFORE any nonlinear math: padded label
    # slots have wh == 0, which would produce NaN in CIoU (arctan(w/h)) and —
    # even though masked out of the loss value — leak NaN into gradients
    # through the masked branches (the where-NaN-grad trap).
    safe_t = jnp.where(valid[:, None], asn.t_xywh,
                       jnp.asarray([0.5, 0.5, 1.0, 1.0], jnp.float32))
    safe_anchors = jnp.where(valid[:, None], asn.anchors, 1.0)
    p_xy = match[:, 1 + c:3 + c]
    p_wh = match[:, 3 + c:5 + c] * safe_anchors
    p_xywh = jnp.concatenate([p_xy, p_wh], axis=-1)

    # ---- box loss (CIoU)
    ciou = compute_ciou(p_xywh, safe_t)
    ciou_loss = masked_mean(1.0 - ciou, valid)

    # ---- conf loss: target grid = detached ciou at positives.
    # Duplicate (b, gj, gi, a) cells follow the reference's LAST-write-wins
    # order (torch index_put): a scatter-max of the write priority picks the
    # winning candidate per cell, then only winners write their ciou — a
    # deterministic, order-exact formulation of the in-place assignment.
    ciou_d = jax.lax.stop_gradient(ciou)
    safe_b = jnp.where(valid, asn.batch_idx, b)  # invalid rows -> dropped
    idx = (safe_b, asn.grid_j, asn.grid_i, asn.anchor_idx)
    pr_grid = (
        jnp.full((b + 1, ny, nx, na), -1, jnp.int32)
        .at[idx].max(asn.priority, mode="drop")
    )
    is_winner = valid & (pr_grid[idx] == asn.priority)
    win_b = jnp.where(is_winner, asn.batch_idx, b)
    t_conf = (
        jnp.zeros((b + 1, ny, nx, na), jnp.float32)
        .at[win_b, asn.grid_j, asn.grid_i, asn.anchor_idx]
        .set(ciou_d, mode="drop")[:b]
    )
    p_conf = preds[..., 0].astype(jnp.float32)
    conf_elem = binfn(p_conf, t_conf)
    if image_mask is None:
        conf_loss = conf_elem.mean()
        neg_mask = t_conf == 0
    else:
        # full-grid BCE over valid rows only (masked rows have no positives
        # — their label_mask was zeroed above — so this is exactly the
        # reference's tail-batch mean over its real rows)
        row_w = imw[:, None, None, None]
        conf_loss = (conf_elem * row_w).sum() / jnp.maximum(
            imw.sum() * ny * nx * na, 1.0)
        neg_mask = (t_conf == 0) & (row_w > 0)
    pos_conf = jax.nn.sigmoid(match[:, 0])
    avg_pos_conf = masked_mean(pos_conf, valid, default=jnp.nan)
    avg_neg_conf = masked_mean(jax.nn.sigmoid(p_conf), neg_mask, default=jnp.nan)

    # ---- class loss with label smoothing over matched rows
    cn = 0.5 * cfg.label_smoothing
    cp = 1.0 - cn
    t_cls = jnp.full_like(p_cls, cn)
    rows = jnp.arange(t_cls.shape[0])
    t_cls = t_cls.at[rows, jnp.clip(asn.classes, 0, c - 1)].set(cp)
    cls_elem = binfn(p_cls, t_cls)
    class_loss = masked_mean(cls_elem.mean(axis=-1), valid)

    losses = {
        "box": _nan_to_zero(ciou_loss),
        "conf": conf_loss,
        "class": _nan_to_zero(class_loss),
    }

    # ---- keypoints
    kp_e = labels.shape[-1] - 5
    if cfg.num_keypoints and kp_e > 0:
        nkp = cfg.num_keypoints
        p_kp = match[:, 5 + c:].reshape(-1, nkp, 5)
        t_kp = asn.keypoints.reshape(-1, nkp, 3)
        finite = jnp.isfinite(t_kp).all(axis=-1)           # (N, nkp)
        kp_valid = finite & valid[:, None]
        # visibility CE (3 classes)
        kpv_elem = softmax_cross_entropy(
            p_kp[..., 2:], jnp.clip(t_kp[..., 2], 0, 2).astype(jnp.int32))
        kpv_loss = masked_mean(kpv_elem, kp_valid)
        # coordinate MSE, non-finite filtered (reference pads ragged
        # keypoints with +/-inf and drops nan/inf losses, …:167-172)
        mse = jnp.square(p_kp[..., :2] - jnp.where(kp_valid[..., None], t_kp[..., :2], 0.0))
        kpc_loss = masked_mean(mse.mean(axis=-1), kp_valid)
        kp_loss = (1.0 + kpv_loss) * kpc_loss
        losses["keypoints"] = _nan_to_zero(kp_loss)
        kp_metrics = {"kpv_loss": kpv_loss, "kpc_loss": kpc_loss, "kp_loss": kp_loss}
    else:
        kp_metrics = {}

    # ---- metrics
    pred_labels = jnp.argmax(jax.lax.stop_gradient(p_cls), axis=-1)
    cls_metrics = macro_classification_metrics(pred_labels, asn.classes, valid, c)
    has = n_valid > 0
    nan = jnp.float32(jnp.nan)
    metrics = {
        "mean_ciou": jnp.where(has, masked_mean(ciou_d, valid), nan),
        "conf_loss": conf_loss,
        "avg_pos_conf": avg_pos_conf,
        "avg_neg_conf": avg_neg_conf,
        "class_loss": class_loss,
        **cls_metrics,
        **kp_metrics,
    }
    return losses, metrics


def detection_loss(
    preds: Sequence[jnp.ndarray],   # (sm, md, lg) train-decoded per-scale preds
    labels: jnp.ndarray,
    label_mask: jnp.ndarray,
    anchors: Sequence[jnp.ndarray],  # (sm, md, lg) each (A, 2), 0-1
    cfg: DetectionLossConfig,
    image_mask: Optional[jnp.ndarray] = None,  # (B,) see scale_loss
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Aggregate 3-scale loss (reference forward, detection_loss.py:84-122)."""
    per_scale = [
        scale_loss(p, labels, label_mask, jax.lax.stop_gradient(a), cfg,
                   image_mask=image_mask)
        for p, a in zip(preds, anchors)
    ]
    sw = cfg.scale_w

    def agg(key):
        return sum(sw[i] * per_scale[i][0][key] for i in range(3))

    loss = cfg.box_w * agg("box") + cfg.conf_w * agg("conf") + cfg.class_w * agg("class")
    if "keypoints" in per_scale[0][0]:
        loss = loss + cfg.keypoints_w * agg("keypoints")
    if cfg.batch_scale_loss:
        loss = loss * (preds[-1].shape[0] if image_mask is None
                       else image_mask.astype(jnp.float32).sum())

    metrics: Dict[str, jnp.ndarray] = {"aggregate_loss": loss}
    keys = per_scale[0][1].keys()
    for key in keys:
        metrics[key] = jnp.nanmean(jnp.stack([m[1][key] for m in per_scale]))
    return loss, metrics
