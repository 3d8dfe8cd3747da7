"""On-device batched NMS (TPU-native replacement for torchvision.ops.batched_nms,
used by the reference at inference_det.py:77-82).

Design (all static shapes, fully jittable, vmapped over the batch):
1. top-P pre-filter by score (P = pre_nms_topk);
2. class-aware via the coordinate-offset trick (boxes shifted by
   class_id * offset, identical keep-set to per-class NMS);
3. exact greedy NMS computed as a *parallel fixed-point iteration*: with
   candidates sorted by score, keep[i] = not exists j<i kept with
   iou(i,j) > t. Jacobi-iterating this recurrence converges to the exact
   greedy solution in at most longest-suppression-chain steps (each
   iteration is one (P,P)@(P,) matvec on the MXU), so the sequential CPU
   loop becomes a handful of matmuls;
4. fixed-capacity compaction of the kept set to max_detections slots.

The only approximation vs torchvision is the top-P prefilter; with P >=
number of candidate boxes the result is exact.
"""
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import box_iou_xyxy

NEG_INF = -1e30


class NMSResult(NamedTuple):
    boxes: jnp.ndarray    # (B, K, 4) xyxy
    scores: jnp.ndarray   # (B, K)
    classes: jnp.ndarray  # (B, K) int32
    valid: jnp.ndarray    # (B, K) bool
    indices: jnp.ndarray  # (B, K) int32 — index into the input N axis


def _greedy_keep(iou: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float) -> jnp.ndarray:
    """Exact greedy keep mask for score-desc-sorted candidates via fixed point."""
    p = iou.shape[0]
    higher = jnp.tril(jnp.ones((p, p), dtype=bool), k=-1).T  # [i, j] True iff j < i
    # suppress matrix: j can suppress i
    sup = (iou > iou_threshold) & higher.T & valid[None, :] & valid[:, None]
    sup_f = sup.astype(jnp.float32)

    def cond(state):
        keep, prev, it = state
        return jnp.logical_and(it < p, jnp.any(keep != prev))

    def body(state):
        keep, _, it = state
        suppressed = (sup_f @ keep.astype(jnp.float32)) > 0
        new_keep = valid & ~suppressed
        return new_keep, keep, it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(cond, body, (keep0, jnp.zeros_like(keep0), 0))
    return keep


def _nms_prefilter(boxes, scores, classes, score_threshold, pre_nms_topk,
                   class_agnostic, class_offset, topk_method="exact"):
    n = boxes.shape[0]
    p = min(pre_nms_topk, n)
    if topk_method == "approx":
        # TPU PartialReduce custom call — at batch 128 the exact top_k
        # lowers to a full (B, N) sort costing ~2.3 ms/step plus several ms
        # of slice machinery (xprof, docs/PERF.md r2 findings); approx_max_k
        # is a single-pass bin reduce. recall_target applies to candidates
        # near the P-th score — at serve thresholds those are discarded
        # anyway; accuracy-critical paths (mAP eval) keep "exact".
        top_scores, top_idx = jax.lax.approx_max_k(
            scores, p, recall_target=0.95, aggregate_to_topk=True)
    else:
        top_scores, top_idx = jax.lax.top_k(scores, p)
    top_boxes = boxes[top_idx]
    top_classes = classes[top_idx]
    valid = top_scores > score_threshold
    nms_boxes = top_boxes
    if not class_agnostic:
        nms_boxes = top_boxes + (top_classes.astype(top_boxes.dtype) * class_offset)[:, None]
    return top_boxes, nms_boxes, top_scores, top_classes, top_idx, valid


def _nms_single(
    boxes: jnp.ndarray,      # (N, 4) xyxy
    scores: jnp.ndarray,     # (N,)
    classes: jnp.ndarray,    # (N,) int
    iou_threshold: float,
    score_threshold: float,
    max_detections: int,
    pre_nms_topk: int,
    class_agnostic: bool,
    class_offset: float,
    topk_method: str = "exact",
):
    top_boxes, nms_boxes, top_scores, top_classes, top_idx, valid = _nms_prefilter(
        boxes, scores, classes, score_threshold, pre_nms_topk,
        class_agnostic, class_offset, topk_method)
    iou = box_iou_xyxy(nms_boxes.astype(jnp.float32), nms_boxes.astype(jnp.float32))
    keep = _greedy_keep(iou, valid, iou_threshold)
    return _compact(top_boxes, top_scores, top_classes, top_idx, keep, max_detections)


def _compact(top_boxes, top_scores, top_classes, top_idx, keep, max_detections):
    # compact kept entries (already score-sorted) into K fixed slots
    k = max_detections
    rank = jnp.cumsum(keep) - 1
    dest = jnp.where(keep, rank, k)  # overflow / dropped -> slot k (clipped away)
    out_boxes = jnp.zeros((k + 1, 4), top_boxes.dtype).at[dest].set(top_boxes, mode="drop")[:k]
    out_scores = jnp.full((k + 1,), 0.0, top_scores.dtype).at[dest].set(top_scores, mode="drop")[:k]
    out_classes = jnp.zeros((k + 1,), jnp.int32).at[dest].set(top_classes.astype(jnp.int32), mode="drop")[:k]
    out_indices = jnp.zeros((k + 1,), jnp.int32).at[dest].set(top_idx.astype(jnp.int32), mode="drop")[:k]
    out_valid = jnp.arange(k) < jnp.minimum(jnp.sum(keep), k)
    return out_boxes, out_scores, out_classes, out_valid, out_indices


@partial(
    jax.jit,
    static_argnames=(
        "iou_threshold", "score_threshold", "max_detections",
        "pre_nms_topk", "class_agnostic", "class_offset", "topk_method",
    ),
)
def batched_nms(
    boxes: jnp.ndarray,    # (B, N, 4) xyxy
    scores: jnp.ndarray,   # (B, N)
    classes: jnp.ndarray,  # (B, N)
    iou_threshold: float = 0.5,
    score_threshold: float = 0.0,
    max_detections: int = 300,
    pre_nms_topk: int = 2048,
    class_agnostic: bool = False,
    class_offset: float = 8192.0,
    topk_method: str = "exact",  # "exact" | "approx" (approx_max_k; serve)
) -> NMSResult:
    # Single backend by measurement (VERDICT r2 item #10): the XLA fixed
    # point costs 0.030 ms/batch at B=128/P=2048 — XLA fuses the IoU
    # producer into the suppression matvec so the (P,P) matrix never hits
    # HBM. The former Pallas VMEM kernel (ops/nms_pallas.py, deleted) was
    # 8x slower at realistic sizes, capped at 16 fixed-point iterations and
    # P<=1024; no kernel can beat an op that is already ~free.
    fn = partial(
        _nms_single,
        iou_threshold=iou_threshold,
        score_threshold=score_threshold,
        max_detections=max_detections,
        pre_nms_topk=pre_nms_topk,
        class_agnostic=class_agnostic,
        class_offset=class_offset,
        topk_method=topk_method,
    )
    out = jax.vmap(fn)(boxes, scores, classes)
    return NMSResult(*out)
