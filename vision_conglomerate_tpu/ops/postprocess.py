"""Device-side detection/segmentation postprocessing.

TPU-native re-design of the reference's `post_process_preds`
(/root/reference/inference_det.py:37-165, inference_seg.py): score
computation, box padding, xywh->xyxy, NMS, keypoint decode and mask assembly
all run under jit with fixed shapes; only final (<=K, ...) results cross to
host for drawing/tracking/CSV.

Parity notes:
- scores = sigmoid(conf) * max(sigmoid(cls)) (inference_det.py:57-59);
- box_allowance adds to wh BEFORE the xyxy conversion (inference_det.py:74);
- the reference's torchvision batched_nms uses the *sample index* as the
  class id (inference_det.py:77-82) => per-image, class-AGNOSTIC suppression;
  reproduced here by vmapping class-agnostic NMS over the batch;
- keypoints: (x, y, argmax(visibility logits)) per kept box
  (inference_det.py:93-95);
- masks: sigmoid(coefs @ protos), bilinear-resized to og size, > 0.5
  (inference_seg.py:123-126).
"""
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .boxes import xywh2xyxy
from .nms import NMSResult, batched_nms


class PostProcessResult(NamedTuple):
    boxes_xyxy: jnp.ndarray   # (B, K, 4)
    scores: jnp.ndarray       # (B, K)
    classes: jnp.ndarray      # (B, K) int32 argmax class
    valid: jnp.ndarray        # (B, K) bool
    keypoints: jnp.ndarray    # (B, K, Kp, 3) [x, y, vis] or (B, K, 0, 3)
    mask_coefs: jnp.ndarray   # (B, K, Km) or (B, K, 0)


@partial(jax.jit, static_argnames=(
    "num_classes", "num_masks", "num_keypoints", "iou_threshold",
    "score_threshold", "box_allowance", "max_detections", "pre_nms_topk",
    "topk_method"))
def postprocess_detections(
    preds: jnp.ndarray,  # (B, M, 5+C+Km+5*Kp) flattened inference-decoded preds
    num_classes: int,
    num_masks: int = 0,
    num_keypoints: int = 0,
    iou_threshold: float = 0.5,
    score_threshold: float = 0.1,
    box_allowance: float = 0.0,
    max_detections: int = 300,
    pre_nms_topk: int = 2048,
    topk_method: str = "exact",  # "approx" for serving (see ops/nms.py)
) -> PostProcessResult:
    preds = preds.astype(jnp.float32)
    c = num_classes
    conf = jax.nn.sigmoid(preds[..., 0])
    cls_probs = jax.nn.sigmoid(preds[..., 1:1 + c])
    scores = cls_probs.max(axis=-1) * conf
    classes = cls_probs.argmax(axis=-1).astype(jnp.int32)
    xywh = preds[..., 1 + c:5 + c]
    if box_allowance:
        xywh = jnp.concatenate(
            [xywh[..., :2], xywh[..., 2:4] + box_allowance], axis=-1)
    xyxy = xywh2xyxy(xywh)

    nms: NMSResult = batched_nms(
        xyxy, scores, classes,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
        max_detections=max_detections,
        pre_nms_topk=pre_nms_topk,
        class_agnostic=True,  # parity with the reference's per-image NMS
        topk_method=topk_method,
    )

    take = lambda t: jnp.take_along_axis(  # noqa: E731
        t, nms.indices[..., None], axis=1)

    kept_classes = jnp.take_along_axis(classes, nms.indices, axis=1)

    if num_keypoints:
        kp = preds[..., 5 + c + num_masks:]
        kp = jnp.take_along_axis(kp, nms.indices[..., None], axis=1)
        kp = kp.reshape(*kp.shape[:-1], num_keypoints, 5)
        kp = jnp.concatenate(
            [kp[..., :2], kp[..., 2:].argmax(-1, keepdims=True).astype(kp.dtype)],
            axis=-1)
    else:
        kp = jnp.zeros(nms.scores.shape + (0, 3), jnp.float32)

    if num_masks:
        coefs = preds[..., 5 + c:5 + c + num_masks]
        coefs = jnp.take_along_axis(coefs, nms.indices[..., None], axis=1)
    else:
        coefs = jnp.zeros(nms.scores.shape + (0,), jnp.float32)

    return PostProcessResult(
        boxes_xyxy=nms.boxes,
        scores=nms.scores,
        classes=kept_classes,
        valid=nms.valid,
        keypoints=kp,
        mask_coefs=coefs,
    )


@partial(jax.jit, static_argnames=("og_size", "threshold"))
def assemble_instance_masks(
    protos: jnp.ndarray,      # (B, Hp, Wp, Km) NHWC
    mask_coefs: jnp.ndarray,  # (B, K, Km)
    og_size: Optional[Tuple[int, int]] = None,
    threshold: float = 0.5,
    boxes_xyxy: Optional[jnp.ndarray] = None,  # (B, K, 4), same coords as output
) -> jnp.ndarray:
    """(B, K, H, W) binary instance masks (reference inference_seg.py:123-126).

    `boxes_xyxy` (opt-in, beyond-reference) zeroes each mask outside its
    predicted box (YOLACT-style serve crop). The reference assembles
    UNcropped masks at inference even though training supervises crops
    (modules/segmentation_loss.py:161-173), so coefficients are
    unconstrained outside the crop and masks can bleed; pass the decoded
    boxes (in the same coordinate system as the assembled masks — og_size
    coords when og_size is given) to suppress that bleed.
    """
    logits = jnp.einsum("bhwk,bnk->bnhw", protos.astype(jnp.float32), mask_coefs)
    masks = jax.nn.sigmoid(logits)
    if og_size is not None and tuple(og_size) != masks.shape[2:]:
        masks = jax.image.resize(
            masks, masks.shape[:2] + (int(og_size[0]), int(og_size[1])), method="linear")
    out = masks > threshold
    if boxes_xyxy is not None:
        out = out & in_box_grid(out.shape[2:], boxes_xyxy)
    return out


def in_box_grid(shape_hw, boxes_xyxy: jnp.ndarray) -> jnp.ndarray:
    """(B, N, H, W) bool grid, True inside each box (inclusive edges) — the
    single definition of the YOLACT-style crop footprint shared by serve
    mask assembly and the seg eval harness."""
    h, w = int(shape_hw[0]), int(shape_hw[1])
    bx = boxes_xyxy.astype(jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    return ((xs >= bx[..., 0, None, None]) & (xs <= bx[..., 2, None, None])
            & (ys >= bx[..., 1, None, None]) & (ys <= bx[..., 3, None, None]))
