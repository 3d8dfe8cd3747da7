"""Pallas TPU kernel for the NMS greedy-keep fixed point.

The XLA formulation (ops/nms.py::_greedy_keep) materialises the (P, P)
suppression matrix in HBM and re-reads it on every while_loop iteration
(iters x P^2 x 4B per image). This kernel computes the IoU matrix ONCE into
VMEM and runs the whole fixed-point iteration on-chip: per grid step
(= one image), boxes/scores stay in VMEM, each iteration is a (P, P) @ (P, 1)
matvec on the MXU, and only the final keep mask (P,) leaves the core.

Semantics identical to the sequential greedy NMS (same fixed point; see
docs/ARCHITECTURE.md §4); validated against the XLA path and the numpy
sequential reference in tests.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _greedy_keep_kernel(boxes_ref, valid_ref, thresh_ref, keep_ref, iou_scratch):
    p = boxes_ref.shape[1]
    boxes = boxes_ref[0]                       # (P, 4) f32, score-desc sorted
    valid = valid_ref[0]                       # (P, 1) f32 (1.0 valid)
    thresh = thresh_ref[0]

    x1 = boxes[:, 0:1]
    y1 = boxes[:, 1:2]
    x2 = boxes[:, 2:3]
    y2 = boxes[:, 3:4]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)  # (P, 1)

    iw = jnp.maximum(
        jnp.minimum(x2, x2.T) - jnp.maximum(x1, x1.T), 0.0)       # (P, P)
    ih = jnp.maximum(
        jnp.minimum(y2, y2.T) - jnp.maximum(y1, y1.T), 0.0)
    inter = iw * ih
    iou = inter / (area + area.T - inter + 1e-9)

    # suppression matrix: sup[i, j] = 1 iff j (higher-scored, j < i) can
    # suppress i; both endpoints must be valid.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (p, p), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (p, p), 1)
    higher = (col_ids < row_ids).astype(jnp.float32)
    sup = (iou > thresh).astype(jnp.float32) * higher * valid * valid.T
    iou_scratch[:] = sup

    def body(_, keep):
        suppressed = jnp.dot(iou_scratch[:], keep,
                             preferred_element_type=jnp.float32)
        return valid * (suppressed <= 0.0).astype(jnp.float32)

    # the fixed point converges in <= longest-chain iterations; 16 covers
    # any realistic suppression chain (and is cheap: 16 VMEM matvecs)
    keep = jax.lax.fori_loop(0, 16, body, valid)
    keep_ref[0] = keep


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def greedy_keep_pallas(
    boxes: jnp.ndarray,   # (B, P, 4) f32, per-image score-desc sorted
    valid: jnp.ndarray,   # (B, P) bool
    iou_threshold: float = 0.5,
    interpret: bool = None,
) -> jnp.ndarray:
    """Per-image greedy NMS keep masks via the VMEM fixed-point kernel."""
    if interpret is None:  # interpret on CPU (tests), compile on TPU
        interpret = jax.default_backend() == "cpu"
    b, p, _ = boxes.shape
    thresh = jnp.full((1,), iou_threshold, jnp.float32)

    out = pl.pallas_call(
        _greedy_keep_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, p, 4), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, p, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, p, 1), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, p, 1), jnp.float32),
        scratch_shapes=[pltpu.VMEM((p, p), jnp.float32)],
        interpret=interpret,
    )(
        boxes.astype(jnp.float32),
        valid.astype(jnp.float32)[..., None],
        thresh,
    )
    return out[..., 0] > 0.5
