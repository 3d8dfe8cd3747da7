"""Segmentation (YOLACT prototype) loss as a pure jittable function.

Re-design of /root/reference/modules/segmentation_loss.py:14-228. The
reference loops over `batch_idx.unique()` and materialises one
(n_matched, H, W) mask stack per image — data-dependent shapes. Here the
matched candidates are *compacted per image* into a fixed number of slots
(`seg_candidates_per_image`), and the whole mask loss is one batched einsum
`protos (B,H,W,K) x coefs (B,S,K) -> (B,S,H,W)` on the MXU plus masked
reductions. When an image has more matched candidates than the cap, WHICH
candidates keep mask supervision is set by `cap_policy` (VERDICT r2 item
#10 — the reference drops nothing, it loops dynamically,
segmentation_loss.py:161-173):
- "first":  assignment order (legacy; crowded images systematically lose
            the same late-slot instances every step);
- "area":   larger target boxes win (stable, biased toward big masks);
- "random": per-step uniform rotation (needs the trainer rng) — every
            candidate gets supervision in expectation, the closest
            approximation of the reference's drop-nothing semantics.
The cap itself is configurable and generous vs typical object counts.

Semantics preserved:
- overlap-mask mode rebuilds per-instance binary masks by id comparison
  (…:165-166); non-overlap indexes the per-slot mask stack (…:168);
- seg element loss = BCE-with-logits (or the focal form), cropped to the
  target box and normalised by box area, then combined as
  `(1 - crop_mean/area) * dice_loss` — the reference's unusual formula
  (…:209-228), kept verbatim under crop_mode="reference";
- NOTE (reference quirk, preserved under crop_mode="reference"): the crop
  boxes are the assigner's t_xywh — xy *relative to the grid cell* and wh in
  *fmap-grid units* — applied to the proto-resolution mask plane
  (segmentation_loss.py:169,226). crop_mode="corrected" instead crops with
  the true box in proto-pixel space.
- per-image results averaged over the batch size (…:172-173).
"""
from dataclasses import dataclass
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.masks import crop_section
from ..ops.metrics import masked_mean
from .assigner import assign_targets_to_scale
from .detection_loss import DetectionLossConfig, _nan_to_zero, scale_loss
from .focal import make_binary_lossfn


@dataclass(frozen=True)
class SegmentationLossConfig(DetectionLossConfig):
    seg_w: float = 1.0
    overlap_masks: bool = True
    seg_candidates_per_image: int = 32
    crop_mode: str = "reference"  # "reference" | "corrected"
    # "first" | "area" | "random" (see module doc). Default = "random": the
    # measured-best policy under cap pressure (BASELINE.md cap-policy sweep:
    # dice 0.160 vs first's 0.036 at cap 4) and what the shipped YAML sets;
    # a config omitting the key must not silently fall back to the worst one.
    cap_policy: str = "random"


def _select_top_candidates(values, valid: jnp.ndarray, priority: jnp.ndarray,
                           cap: int):
    """Select the `cap` highest-priority valid rows of (B, N, ...) tensors
    into (B, cap, ...) slots (invalid rows get -inf priority; lax.top_k
    breaks ties by lower index, so equal priorities keep assignment order).
    A cap larger than the candidate lattice keeps every row (static clamp —
    top_k rejects k > N)."""
    keyed = jnp.where(valid, priority, -jnp.inf)
    cap = min(cap, keyed.shape[-1])
    _, idx = jax.lax.top_k(keyed, cap)  # (B, cap)
    out = []
    for v in values:
        ix = idx.reshape(idx.shape + (1,) * (v.ndim - 2))
        out.append(jnp.take_along_axis(v, ix, axis=1))
    out_valid = jnp.take_along_axis(valid, idx, axis=1)
    return out, out_valid


def _candidate_priority(cfg: SegmentationLossConfig, valid: jnp.ndarray,
                        t_xywh: jnp.ndarray, rng) -> jnp.ndarray:
    if cfg.cap_policy == "first":
        n = valid.shape[1]
        return jnp.broadcast_to(-jnp.arange(n, dtype=jnp.float32)[None, :], valid.shape)
    if cfg.cap_policy == "area":
        return t_xywh[..., 2] * t_xywh[..., 3]  # fmap-grid units ∝ true area
    if cfg.cap_policy == "random":
        # Trainers pass a fresh per-step rng (stochastic candidate subsets
        # across steps — the property the cap-policy sweep measured). A
        # caller without an rng (programmatic/eval use of the now-default
        # policy) gets a fixed-key draw: still an unbiased-by-position
        # selection, just deterministic per call.
        if rng is None:
            rng = jax.random.PRNGKey(0)
        return jax.random.uniform(rng, valid.shape)
    raise ValueError(f"Unknown cap_policy {cfg.cap_policy!r}; "
                     f"supported: first, area, random")


def seg_scale_loss(
    preds: jnp.ndarray,         # (B, ny, nx, A, D) train-decoded (incl. tanh coefs)
    labels: jnp.ndarray,
    label_mask: jnp.ndarray,
    protos: jnp.ndarray,        # (B, Hp, Wp, K) NHWC
    target_masks: jnp.ndarray,  # overlap: (B, Hm, Wm); else (B, M, Hm, Wm)
    anchors: jnp.ndarray,
    cfg: SegmentationLossConfig,
    rng=None,
    image_mask=None,  # (B,) row validity for wrap-padded eval tails; None = all
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    b, ny, nx, na, _ = preds.shape
    c = cfg.num_classes
    k = protos.shape[-1]
    cap = cfg.seg_candidates_per_image
    hp, wp = protos.shape[1], protos.shape[2]
    if image_mask is not None:
        # masked rows get no assigned candidates (per-image seg terms then
        # zero out via has_img) and drop out of the /batch-size denominators
        label_mask = label_mask * image_mask[:, None].astype(label_mask.dtype)

    # resize target masks (nearest) to proto res if needed (reference …:157-158)
    if cfg.overlap_masks:
        if target_masks.shape[1:] != (hp, wp):
            target_masks = jax.image.resize(
                target_masks.astype(jnp.float32), (b, hp, wp), method="nearest")
    else:
        if target_masks.shape[2:] != (hp, wp):
            target_masks = jax.image.resize(
                target_masks.astype(jnp.float32),
                (target_masks.shape[0], target_masks.shape[1], hp, wp), method="nearest")
    target_masks = target_masks.astype(jnp.float32)

    asn = assign_targets_to_scale(
        labels, label_mask, (ny, nx), anchors,
        anchor_threshold=cfg.anchor_t, edge_threshold=cfg.edge_t,
        overlap_masks=cfg.overlap_masks,
    )
    match = preds[asn.batch_idx, asn.grid_j, asn.grid_i, asn.anchor_idx].astype(jnp.float32)
    k_i = 5 + c
    coefs = match[:, k_i:k_i + k]

    n_per_img = asn.valid.shape[0] // b
    # a cap above the lattice size keeps every candidate (static clamp: the
    # selected-slot count S = cap flows into reshapes below)
    cap = min(cap, n_per_img)
    reshape_img = lambda t: t.reshape((b, n_per_img) + t.shape[1:])  # noqa: E731
    valid_img = reshape_img(asn.valid)
    txywh_img = reshape_img(asn.t_xywh)
    priority = _candidate_priority(cfg, valid_img, txywh_img, rng)
    (c_coefs, c_tmask_idx, c_txywh, c_slot), c_valid = _select_top_candidates(
        [reshape_img(coefs), reshape_img(asn.tmask_idx),
         txywh_img, reshape_img(asn.label_slot)],
        valid_img, priority, cap,
    )
    # sanitize invalid selected slots BEFORE any nonlinear math: when an image
    # has fewer matched candidates than the cap, top_k gathers +inf-padded
    # label rows (data/detection.py pads with np.inf) whose t_xywh would feed
    # inf - inf = NaN into crop_section — the masked-NaN-gradient trap
    # (CLAUDE.md invariant; same guard as scale_loss's safe_t)
    c_txywh = jnp.where(c_valid[..., None], c_txywh,
                        jnp.asarray([0.5, 0.5, 1.0, 1.0], jnp.float32))
    # candidates silently lost to the fixed cap (crowded images): surfaced as
    # a metric so cap pressure is visible instead of silent (VERDICT r1 #6)
    dropped = jnp.maximum(
        valid_img.sum(axis=1).astype(jnp.float32) - cap, 0.0).sum()

    # (B, S, Hp, Wp) mask logits: one MXU einsum
    pred_mask = jnp.einsum("bhwk,bsk->bshw", protos.astype(jnp.float32), c_coefs)
    sig_pred = jax.nn.sigmoid(pred_mask)

    if cfg.overlap_masks:
        tmask = (target_masks[:, None] == c_tmask_idx[:, :, None, None].astype(jnp.float32))
        tmask = tmask.astype(jnp.float32)
    else:
        tmask = jnp.take_along_axis(
            target_masks, c_tmask_idx[:, :, None, None], axis=1)

    segfn = make_binary_lossfn(cfg.alpha, cfg.gamma)
    elem = segfn(pred_mask, tmask)

    if cfg.crop_mode == "reference":
        crop_boxes = c_txywh
    else:
        # true box in proto-pixel space from the source label slot; invalid
        # slots gather inf-padded label rows — sanitize before the crop math
        lab = jnp.take_along_axis(labels, c_slot[:, :, None], axis=1)  # (B,S,5+)
        crop_boxes = jnp.where(
            c_valid[..., None],
            lab[..., 1:5] * jnp.asarray([wp, hp, wp, hp], jnp.float32),
            jnp.asarray([0.5, 0.5, 1.0, 1.0], jnp.float32))

    flat = lambda t: t.reshape((b * cap,) + t.shape[2:])  # noqa: E731
    cropped = crop_section(flat(elem), flat(crop_boxes)).reshape(elem.shape)
    mask_area = jnp.maximum(crop_boxes[..., 2] * crop_boxes[..., 3], 1e-9)
    crop_mean = cropped.mean(axis=(2, 3)) / mask_area  # (B, S)

    e = 1e-5
    inter = (sig_pred * tmask).sum(axis=(2, 3))
    denom = sig_pred.sum(axis=(2, 3)) + tmask.sum(axis=(2, 3))
    dice_n = (2 * inter + e) / (denom + e)               # (B, S) soft dice
    rnd_inter = (jnp.round(sig_pred) * jnp.round(tmask)).sum(axis=(2, 3))
    rnd_denom = jnp.round(sig_pred).sum(axis=(2, 3)) + jnp.round(tmask).sum(axis=(2, 3))
    dice_rnd_n = (2 * rnd_inter + e) / (rnd_denom + e)

    vimg = c_valid.astype(jnp.float32)
    n_img = vimg.sum(axis=1)
    has_img = n_img > 0
    mean_img = lambda t: jnp.where(  # noqa: E731
        has_img, (t * vimg).sum(axis=1) / jnp.maximum(n_img, 1), 0.0)

    dice_loss_img = jnp.where(has_img, 1.0 - mean_img(dice_n), 0.0)
    sl_img = mean_img((1.0 - crop_mean) * dice_loss_img[:, None])
    ds_img = jax.lax.stop_gradient(mean_img(dice_rnd_n))

    # per-image results averaged over the (valid) batch size (reference
    # …:172-173; masked wrap-padded rows leave the denominator too)
    denom = (jnp.float32(b) if image_mask is None
             else jnp.maximum(image_mask.astype(jnp.float32).sum(), 1.0))
    seg = sl_img.sum() / denom
    dice_score = ds_img.sum() / denom

    # detection components (box/conf/cls/kp + metrics) on the same preds
    # (label_mask already row-masked above; image_mask also gates the
    # full-grid conf mean inside scale_loss)
    det_losses, det_metrics = scale_loss(preds, labels, label_mask, anchors, cfg,
                                         image_mask=image_mask)
    det_losses = dict(det_losses)
    det_losses["seg"] = _nan_to_zero(seg)
    det_metrics = dict(det_metrics)
    det_metrics["seg_loss"] = seg
    det_metrics["dice_score"] = dice_score
    det_metrics["seg_dropped_candidates"] = dropped
    return det_losses, det_metrics


def segmentation_loss(
    preds: Sequence[jnp.ndarray],
    labels: jnp.ndarray,
    label_mask: jnp.ndarray,
    protos: jnp.ndarray,
    target_masks: jnp.ndarray,
    anchors: Sequence[jnp.ndarray],
    cfg: SegmentationLossConfig,
    rng=None,
    image_mask=None,  # (B,) see seg_scale_loss
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Aggregate 3-scale segmentation loss (reference forward,
    segmentation_loss.py:26-73)."""
    per_scale = [
        seg_scale_loss(p, labels, label_mask, protos, target_masks,
                       jax.lax.stop_gradient(a), cfg,
                       rng=None if rng is None else jax.random.fold_in(rng, i),
                       image_mask=image_mask)
        for i, (p, a) in enumerate(zip(preds, anchors))
    ]
    sw = cfg.scale_w

    def agg(key):
        return sum(sw[i] * per_scale[i][0][key] for i in range(3))

    loss = (
        cfg.box_w * agg("box") + cfg.conf_w * agg("conf")
        + cfg.class_w * agg("class") + cfg.seg_w * agg("seg")
    )
    if "keypoints" in per_scale[0][0]:
        loss = loss + cfg.keypoints_w * agg("keypoints")
    if cfg.batch_scale_loss:
        loss = loss * (preds[-1].shape[0] if image_mask is None
                       else image_mask.astype(jnp.float32).sum())

    metrics: Dict[str, jnp.ndarray] = {"aggregate_loss": loss}
    for key in per_scale[0][1].keys():
        metrics[key] = jnp.nanmean(jnp.stack([m[1][key] for m in per_scale]))
    return loss, metrics
