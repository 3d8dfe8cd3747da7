"""Serve-fast decode + postprocess in a lanes-major layout.

The reference-parity decode (models/detection.py::decode_scale, mirroring
/root/reference/detection.py:98-173) operates on (B, ny, nx, A, D) tensors
whose minor dims (A=3, D=7) pad the TPU's (8, 128) vector tiles to ~2%
utilization — measured at ~10 ms of the 50 ms batch-128 serve step. This
module computes the SAME math with the big axis (HW, then M = sum A*HW)
kept minor-most:

- head fields stay channels-last (B, ny, nx, K) out of their 1x1 convs
  (EffiDecHead raw_fields mode), one transpose puts them in (B, A, D, HW)
  where HW fills the 128 lanes and D sits in sublanes;
- decode arithmetic (sigmoid/scale/grid) runs at full lane utilization;
- candidates flatten to (B, 4, M)/(B, M) field tensors, top-k + greedy-NMS
  + fixed-slot compaction reuse the exact ops/nms.py semantics.

Numerically identical to decode_scale + postprocess_detections (all f32,
same op order per element); candidate ordering differs ((a, hw) vs
(hw, a)), which only permutes tie-breaks between identical scores.
Preserved reference quirks: stride = [H/ny, W/nx] multiplying (x, y)
elementwise in that order (reference detection.py:148-154); box_allowance
added to wh before xyxy (inference_det.py:74); class-agnostic NMS
(inference_det.py:77-82).
"""
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .nms import _compact, _greedy_keep
from .boxes import box_iou_xyxy
from .postprocess import PostProcessResult


def _fields_to_adhw(fields: Dict[str, jnp.ndarray], num_anchors: int,
                    num_classes: int, num_masks: int):
    """Per-scale head fields -> (conf (B,A,HW), cls (B,A,C,HW),
    bbox (B,A,4,HW), masks (B,A,Km,HW)|None), all f32."""
    a = num_anchors

    def to_k_hw(t):  # (B, ny, nx, K) -> (B, K, HW)
        b, ny, nx, k = t.shape
        return jnp.transpose(t.reshape(b, ny * nx, k), (0, 2, 1)).astype(jnp.float32)

    if "packed" in fields:  # BasicHead: anchor-major [conf|cls|bbox|masks|kp]
        p = to_k_hw(fields["packed"])
        b, k, hw = p.shape
        if k != a * (5 + num_classes + num_masks):
            raise NotImplementedError(
                f"packed head width {k} != A*(5+C+Km)={a * (5 + num_classes + num_masks)}"
                " — keypoint heads are not supported on the serve-fast path")
        p = p.reshape(b, a, k // a, hw)
        conf = p[:, :, 0, :]
        cls = p[:, :, 1:1 + num_classes, :]
        bbox = p[:, :, 1 + num_classes:5 + num_classes, :]
        masks = (p[:, :, 5 + num_classes:5 + num_classes + num_masks, :]
                 if num_masks else None)
        return conf, cls, bbox, masks

    b, ny, nx, _ = fields["conf"].shape
    hw = ny * nx
    conf = to_k_hw(fields["conf"]).reshape(b, a, hw)
    cls = to_k_hw(fields["cls"]).reshape(b, a, num_classes, hw)
    bbox = to_k_hw(fields["bbox"]).reshape(b, a, 4, hw)
    masks = (to_k_hw(fields["masks"]).reshape(b, a, num_masks, hw)
             if num_masks and "masks" in fields else None)
    return conf, cls, bbox, masks


def _decode_scale_fast(
    fields: Dict[str, jnp.ndarray],
    anchors: jnp.ndarray,          # (A, 2) normalized
    grid_hw: Tuple[int, int],      # (ny, nx)
    input_shape: Tuple[int, int],  # (H, W)
    num_classes: int,
    num_masks: int,
    box_allowance: float,
    scale_to: Optional[Tuple[float, float]],  # (sx, sy) og rescale or None
):
    ny, nx = grid_hw
    h, w = input_shape
    a = anchors.shape[0]
    conf, cls, bbox, masks = _fields_to_adhw(fields, a, num_classes, num_masks)
    b = conf.shape[0]
    hw = ny * nx

    # scores / classes (sublane reduce over C)
    conf_sig = jax.nn.sigmoid(conf)                      # (B, A, HW)
    cls_sig = jax.nn.sigmoid(cls)                        # (B, A, C, HW)
    scores = cls_sig.max(axis=2) * conf_sig              # (B, A, HW)
    classes = cls_sig.argmax(axis=2).astype(jnp.int32)   # (B, A, HW)

    # box decode (reference quirk: stride = [H/ny, W/nx] multiplies (x, y))
    xg = jnp.tile(jnp.arange(nx, dtype=jnp.float32), ny)            # (HW,)
    yg = jnp.repeat(jnp.arange(ny, dtype=jnp.float32), nx)          # (HW,)
    grid = jnp.stack([xg, yg], axis=0)[None, None]                  # (1,1,2,HW)
    stride = jnp.asarray([h / ny, w / nx], jnp.float32).reshape(1, 1, 2, 1)
    nxy = jnp.asarray([nx, ny], jnp.float32).reshape(1, 1, 2, 1)
    anc = anchors.astype(jnp.float32).reshape(1, a, 2, 1)

    xy = (jax.nn.sigmoid(bbox[:, :, 0:2, :]) * 2.0 - 0.5 + grid) * stride
    wh = jnp.square(jax.nn.sigmoid(bbox[:, :, 2:4, :]) * 2.0) * anc * nxy * stride
    if scale_to is not None:
        sc = jnp.asarray(scale_to, jnp.float32).reshape(1, 1, 2, 1)
        xy = xy * sc
        wh = wh * sc
    if box_allowance:
        wh = wh + box_allowance
    half = wh * 0.5
    boxes = jnp.concatenate([xy - half, xy + half], axis=2)   # (B,A,4,HW) xyxy

    flat = lambda t: t.reshape(b, a * hw)  # noqa: E731
    boxes_m = jnp.transpose(boxes, (0, 2, 1, 3)).reshape(b, 4, a * hw)
    out = [flat(scores), flat(classes), boxes_m]
    if masks is not None:
        coefs = jnp.tanh(masks)                               # (B,A,Km,HW)
        out.append(jnp.transpose(coefs, (0, 2, 1, 3)).reshape(b, num_masks, a * hw))
    else:
        out.append(None)
    return out


@partial(jax.jit, static_argnames=(
    "num_classes", "num_masks", "input_shape", "og_size", "iou_threshold",
    "score_threshold", "box_allowance", "max_detections", "pre_nms_topk",
    "topk_method"))
def decode_and_postprocess(
    raw: Any,                      # DetectionNet(..., raw_fields=True) output
    input_shape: Tuple[int, int],  # (H, W) network input
    num_classes: int,
    num_masks: int = 0,
    og_size: Optional[Tuple[int, int]] = None,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.1,
    box_allowance: float = 0.0,
    max_detections: int = 300,
    pre_nms_topk: int = 2048,
    topk_method: str = "exact",  # "exact" | "approx" (approx_max_k; serve)
) -> PostProcessResult:
    anchors_dict, per_scale_fields = raw
    for fields in per_scale_fields:
        if "keypoints" in fields:
            raise NotImplementedError(
                "serve-fast decode does not carry keypoint fields; serve "
                "keypoint models via models.detection decode_scale + "
                "ops.postprocess.postprocess_detections")
    h, w = input_shape
    scale_to = None
    # reference quirk: rescale only when BOTH og dims differ (detection.py:76)
    if og_size is not None and (og_size[0] != h and og_size[1] != w):
        scale_to = (og_size[1] / w, og_size[0] / h)  # (sx, sy)

    scores_l, classes_l, boxes_l, coefs_l = [], [], [], []
    for key, fields in zip(("sm", "md", "lg"), per_scale_fields):
        ref = fields.get("conf", fields.get("packed"))
        ny, nx = ref.shape[1], ref.shape[2]
        s, c, bx, cf = _decode_scale_fast(
            fields, anchors_dict[key], (ny, nx), input_shape,
            num_classes, num_masks, box_allowance, scale_to)
        scores_l.append(s)
        classes_l.append(c)
        boxes_l.append(bx)
        if cf is not None:
            coefs_l.append(cf)

    scores = jnp.concatenate(scores_l, axis=-1)     # (B, M)
    classes = jnp.concatenate(classes_l, axis=-1)   # (B, M)
    boxes = jnp.concatenate(boxes_l, axis=-1)       # (B, 4, M)
    coefs = jnp.concatenate(coefs_l, axis=-1) if coefs_l else None  # (B,Km,M)

    p = min(pre_nms_topk, scores.shape[-1])
    if topk_method == "approx":
        # same rationale as ops/nms.py: exact top_k lowers to a full (B, M)
        # sort inside big serve programs (~2.3 ms/step at B=128, xprof)
        top_scores, top_idx = jax.lax.approx_max_k(
            scores, p, recall_target=0.95, aggregate_to_topk=True)  # (B, P)
    else:
        top_scores, top_idx = jax.lax.top_k(scores, p)              # (B, P)
    valid = top_scores > score_threshold
    take_rows = lambda t: jnp.take_along_axis(  # noqa: E731
        t, top_idx[:, None, :], axis=2)
    top_boxes = jnp.transpose(take_rows(boxes), (0, 2, 1))        # (B, P, 4)
    top_classes = jnp.take_along_axis(classes, top_idx, axis=1)

    # class-agnostic greedy NMS (exact fixed point) + fixed-slot compaction
    iou = jax.vmap(lambda bb: box_iou_xyxy(bb, bb))(top_boxes)
    keep = jax.vmap(partial(_greedy_keep, iou_threshold=iou_threshold))(iou, valid)
    out_boxes, out_scores, out_classes, out_valid, out_slot = jax.vmap(
        partial(_compact, max_detections=max_detections))(
        top_boxes, top_scores, top_classes, top_idx, keep)

    if coefs is not None:
        kept_coefs = jnp.take_along_axis(
            coefs, out_slot[:, None, :].astype(jnp.int32), axis=2)
        kept_coefs = jnp.transpose(kept_coefs, (0, 2, 1))          # (B, K, Km)
        kept_coefs = jnp.where(out_valid[..., None], kept_coefs, 0.0)
    else:
        kept_coefs = jnp.zeros(out_scores.shape + (0,), jnp.float32)

    return PostProcessResult(
        boxes_xyxy=out_boxes,
        scores=out_scores,
        classes=out_classes,
        valid=out_valid,
        keypoints=jnp.zeros(out_scores.shape + (0, 3), jnp.float32),
        mask_coefs=kept_coefs,
    )
