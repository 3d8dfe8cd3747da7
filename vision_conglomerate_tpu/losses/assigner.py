"""YOLOv5-style target assignment as a fixed-capacity masked computation.

Re-derivation of the reference's `DetectionDataset.build_target_by_scale`
(/root/reference/dataset/detection_dataset.py:90-246) without data-dependent
shapes: instead of boolean-indexing a ragged candidate list, every
(image, label-slot, anchor, 5-offset) combination is a *candidate row* with a
boolean validity. All downstream consumers (losses) gather/scatter with these
row indices and mask by validity — the canonical XLA pattern for dynamic
work under jit.

Semantics preserved from the reference:
- anchor ratio filter max(r, 1/r).max < anchor_threshold (…:186-191);
- 5-way edge expansion with offsets [[0,0],[1,0],[0,1],[-1,0],[0,-1]] *
  edge_threshold, gated by (coord % 1 < t) & (coord > 1) and the mirrored
  condition on gain - coord (…:193-221);
- grid cell = int(xy - offset), clamped to the map; the stored target xy is
  relative to the *clamped* cell (…:231-237, the reference's in-place clamp
  aliases into grid_ij);
- overlap-mask index = per-image slot index + 1; non-overlap = slot index
  (the reference's global concat index maps to (batch, slot) in the padded
  layout) (…:150-172).

Inputs use the padded batch layout produced by the data pipeline:
labels (B, M, 5+E) = [cls, x, y, w, h, extras(=3*Kp keypoints)] normalized
0-1, label_mask (B, M) validity.
"""
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

OFFSETS = jnp.asarray(
    [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]], dtype=jnp.float32
)
NUM_OFFSETS = 5


class AssignResult(NamedTuple):
    batch_idx: jnp.ndarray   # (N,) int32
    grid_j: jnp.ndarray      # (N,) int32 (y cell)
    grid_i: jnp.ndarray      # (N,) int32 (x cell)
    anchor_idx: jnp.ndarray  # (N,) int32
    classes: jnp.ndarray     # (N,) int32
    anchors: jnp.ndarray     # (N, 2) matched anchor wh in fmap-grid units
    t_xywh: jnp.ndarray      # (N, 4) xy rel. to cell, wh in grid units
    tmask_idx: jnp.ndarray   # (N,) int32 (see overlap semantics above)
    keypoints: jnp.ndarray   # (N, E) pass-through extras (grid-scaled xy)
    valid: jnp.ndarray       # (N,) bool
    label_slot: jnp.ndarray  # (N,) int32 — source row m in the padded labels
    priority: jnp.ndarray    # (N,) int32 — reference write order (see below)


def assign_targets_to_scale(
    labels: jnp.ndarray,
    label_mask: jnp.ndarray,
    fmap_hw: Tuple[int, int],
    anchors: jnp.ndarray,
    anchor_threshold: float = 4.0,
    edge_threshold: float = 0.5,
    overlap_masks: Optional[bool] = None,
) -> AssignResult:
    b, m, cols = labels.shape
    e = cols - 5
    ny, nx = int(fmap_hw[0]), int(fmap_hw[1])
    a = anchors.shape[0]
    gain_wh = jnp.asarray([nx, ny], dtype=jnp.float32)

    cls = labels[..., 0].astype(jnp.int32)                   # (B, M)
    xy_g = labels[..., 1:3].astype(jnp.float32) * gain_wh    # (B, M, 2) grid units
    wh_g = labels[..., 3:5].astype(jnp.float32) * gain_wh    # (B, M, 2)
    extras = labels[..., 5:].astype(jnp.float32)             # (B, M, E)
    if e > 0:
        # keypoint extras are (x, y, v) triplets; the reference's gain
        # multiplies the whole row by ones (…:174-177), so keypoints pass
        # through unscaled (they are bbox-relative, not image-relative).
        pass

    anchors_g = anchors.astype(jnp.float32) * gain_wh        # (A, 2)

    # anchor ratio filter -> (B, M, A)
    r = wh_g[:, :, None, :] / jnp.maximum(anchors_g[None, None, :, :], 1e-9)
    ratio_ok = jnp.maximum(r, 1.0 / jnp.maximum(r, 1e-9)).max(axis=-1) < anchor_threshold

    # edge-expansion offset validity -> (B, M, 5)
    gx, gy = xy_g[..., 0], xy_g[..., 1]
    gxi, gyi = gain_wh[0] - gx, gain_wh[1] - gy
    j_m = (gx % 1.0 < edge_threshold) & (gx > 1.0)
    k_m = (gy % 1.0 < edge_threshold) & (gy > 1.0)
    l_m = (gxi % 1.0 < edge_threshold) & (gxi > 1.0)
    m_m = (gyi % 1.0 < edge_threshold) & (gyi > 1.0)
    offset_ok = jnp.stack([jnp.ones_like(j_m), j_m, k_m, l_m, m_m], axis=-1)

    valid = (
        label_mask[:, :, None, None]
        & ratio_ok[:, :, :, None]
        & offset_ok[:, :, None, :]
    )  # (B, M, A, 5)

    offs = OFFSETS * edge_threshold                           # (5, 2)
    shifted = xy_g[:, :, None, None, :] - offs[None, None, None, :, :]  # (B,M,1,5,2)
    shifted = jnp.broadcast_to(shifted, (b, m, a, NUM_OFFSETS, 2))
    grid_ij = shifted.astype(jnp.int32)
    gi = jnp.clip(grid_ij[..., 0], 0, nx - 1)
    gj = jnp.clip(grid_ij[..., 1], 0, ny - 1)
    grid_ij_clamped = jnp.stack([gi, gj], axis=-1)

    t_xy = xy_g[:, :, None, None, :] - grid_ij_clamped.astype(jnp.float32)
    t_wh = jnp.broadcast_to(wh_g[:, :, None, None, :], (b, m, a, NUM_OFFSETS, 2))
    t_xywh = jnp.concatenate([t_xy, t_wh], axis=-1)

    batch_idx = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None, None, None], (b, m, a, NUM_OFFSETS))
    anchor_idx = jnp.broadcast_to(
        jnp.arange(a, dtype=jnp.int32)[None, None, :, None], (b, m, a, NUM_OFFSETS))
    label_slot = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[None, :, None, None], (b, m, a, NUM_OFFSETS))
    cls_b = jnp.broadcast_to(cls[:, :, None, None], (b, m, a, NUM_OFFSETS))
    anchors_b = jnp.broadcast_to(
        anchors_g[None, None, :, None, :], (b, m, a, NUM_OFFSETS, 2))
    extras_b = jnp.broadcast_to(
        extras[:, :, None, None, :], (b, m, a, NUM_OFFSETS, e))

    if overlap_masks:
        tmask = label_slot + 1
    else:
        tmask = label_slot

    # Reference candidate enumeration order (for last-write-wins scatter
    # parity): build_target_by_scale flattens (offset-major, then
    # anchor-major, then concat-target order) — targets.repeat(5,1,1)[mask]
    # over an (anchors, targets) layout (detection_dataset.py:127,191,207).
    offset_idx = jnp.broadcast_to(
        jnp.arange(NUM_OFFSETS, dtype=jnp.int32)[None, None, None, :],
        (b, m, a, NUM_OFFSETS))
    priority = (
        offset_idx * (a * b * m)
        + anchor_idx * (b * m)
        + batch_idx * m
        + label_slot
    )

    n = b * m * a * NUM_OFFSETS
    flat = lambda t, tail=(): t.reshape((n,) + tail)  # noqa: E731
    return AssignResult(
        batch_idx=flat(batch_idx),
        grid_j=flat(gj),
        grid_i=flat(gi),
        anchor_idx=flat(anchor_idx),
        classes=flat(cls_b),
        anchors=flat(anchors_b, (2,)),
        t_xywh=flat(t_xywh, (4,)),
        tmask_idx=flat(tmask),
        keypoints=flat(extras_b, (e,)),
        valid=flat(valid),
        label_slot=flat(label_slot),
        priority=flat(priority),
    )
