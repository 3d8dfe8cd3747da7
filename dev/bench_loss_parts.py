"""Attribute the detection-loss cost (the +5.8 ms/step at b8 found by
dev/bench_train_stages.py) to its pieces, each as a standalone jit on the
chip with device-resident inputs:

  assign      the 3-scale fixed-capacity assigner alone
  loss        full detection_loss (preds are inputs, no model)
  noscatter   detection_loss with the conf-target scatters stubbed to zeros
  nometrics   detection_loss without macro_classification_metrics
  grad        d(loss)/d(preds) of the full loss

TPU scatters with non-unique indices lower to serialized loops — the
hypothesis is the two scatters per scale (priority max + conf set) dominate.

Usage: python dev/bench_loss_parts.py [batch] [iters]
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

if os.environ.get("VCT_CPU"):
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")
from vision_conglomerate_tpu.losses import (  # noqa: E402
    DetectionLossConfig, detection_loss)
from vision_conglomerate_tpu.losses.assigner import (  # noqa: E402
    assign_targets_to_scale)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 50
SIZE = int(os.environ.get("VCT_SIZE", "640"))

CFG = DetectionLossConfig(num_classes=2)
ANCHORS = (
    jnp.asarray([[0.034, 0.118], [0.049, 0.098], [0.055, 0.1]], jnp.float32),
    jnp.asarray([[0.059, 0.2], [0.066, 0.338], [0.083, 0.347]], jnp.float32),
    jnp.asarray([[0.094, 0.347], [0.107, 0.336], [0.117, 0.295]], jnp.float32),
)


def make_inputs(rng):
    d = 5 + CFG.num_classes
    scales = [SIZE // 8, SIZE // 16, SIZE // 32]
    preds = tuple(
        jnp.asarray(rng.normal(size=(BATCH, s, s, 3, d)).astype(np.float32))
        for s in scales)
    labels = np.zeros((BATCH, 16, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.3, 0.3]
    labels[:, 1] = [0, 0.25, 0.3, 0.04, 0.04]
    mask = np.zeros((BATCH, 16), bool)
    mask[:, :2] = True
    return preds, jnp.asarray(labels), jnp.asarray(mask)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS * 1000.0
    print(f"{name:12s} {dt:8.3f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    preds, labels, mask = make_inputs(rng)

    @jax.jit
    def assign_fn(labels, mask):
        outs = []
        for p, a in zip(preds, ANCHORS):
            outs.append(assign_targets_to_scale(
                labels, mask, p.shape[1:3], a,
                anchor_threshold=CFG.anchor_t, edge_threshold=CFG.edge_t))
        return outs

    @jax.jit
    def loss_fn(preds, labels, mask):
        return detection_loss(preds, labels, mask, ANCHORS, CFG)

    @jax.jit
    def grad_fn(preds, labels, mask):
        return jax.grad(
            lambda p: detection_loss(p, labels, mask, ANCHORS, CFG)[0])(preds)

    timeit("assign", assign_fn, labels, mask)
    timeit("loss", loss_fn, preds, labels, mask)
    timeit("grad", grad_fn, preds, labels, mask)

    # ---- ablations by monkeypatching scale_loss internals is invasive;
    # instead re-implement the two ablations inline against the same pieces.
    from vision_conglomerate_tpu.losses.detection_loss import _nan_to_zero
    from vision_conglomerate_tpu.losses.focal import make_binary_lossfn
    from vision_conglomerate_tpu.ops.boxes import compute_ciou
    from vision_conglomerate_tpu.ops.metrics import masked_mean

    def scale_loss_ablate(p, labels, mask, anchors, *, scatter=True,
                          metrics_on=True):
        b, ny, nx, na, _ = p.shape
        c = CFG.num_classes
        binfn = make_binary_lossfn(CFG.alpha, CFG.gamma)
        asn = assign_targets_to_scale(
            labels, mask, (ny, nx), anchors,
            anchor_threshold=CFG.anchor_t, edge_threshold=CFG.edge_t)
        valid = asn.valid
        match = p[asn.batch_idx, asn.grid_j, asn.grid_i, asn.anchor_idx]
        match = match.astype(jnp.float32)
        p_cls = match[:, 1:1 + c]
        safe_t = jnp.where(valid[:, None], asn.t_xywh,
                           jnp.asarray([0.5, 0.5, 1.0, 1.0], jnp.float32))
        safe_anchors = jnp.where(valid[:, None], asn.anchors, 1.0)
        p_xy = match[:, 1 + c:3 + c]
        p_wh = match[:, 3 + c:5 + c] * safe_anchors
        p_xywh = jnp.concatenate([p_xy, p_wh], axis=-1)
        ciou = compute_ciou(p_xywh, safe_t)
        ciou_loss = masked_mean(1.0 - ciou, valid)
        ciou_d = jax.lax.stop_gradient(ciou)
        if scatter:
            safe_b = jnp.where(valid, asn.batch_idx, b)
            idx = (safe_b, asn.grid_j, asn.grid_i, asn.anchor_idx)
            pr_grid = (jnp.full((b + 1, ny, nx, na), -1, jnp.int32)
                       .at[idx].max(asn.priority, mode="drop"))
            is_winner = valid & (pr_grid[idx] == asn.priority)
            win_b = jnp.where(is_winner, asn.batch_idx, b)
            t_conf = (jnp.zeros((b + 1, ny, nx, na), jnp.float32)
                      .at[win_b, asn.grid_j, asn.grid_i, asn.anchor_idx]
                      .set(ciou_d, mode="drop")[:b])
        else:
            t_conf = jnp.zeros((b, ny, nx, na), jnp.float32)
        p_conf = p[..., 0].astype(jnp.float32)
        conf_loss = binfn(p_conf, t_conf).mean()
        cn = 0.5 * CFG.label_smoothing
        cp = 1.0 - cn
        t_cls = jnp.full_like(p_cls, cn)
        rows = jnp.arange(t_cls.shape[0])
        t_cls = t_cls.at[rows, jnp.clip(asn.classes, 0, c - 1)].set(cp)
        class_loss = masked_mean(binfn(p_cls, t_cls).mean(axis=-1), valid)
        loss = _nan_to_zero(ciou_loss) + conf_loss + _nan_to_zero(class_loss)
        if metrics_on:
            from vision_conglomerate_tpu.ops.metrics import (
                macro_classification_metrics)
            pred_labels = jnp.argmax(jax.lax.stop_gradient(p_cls), axis=-1)
            m = macro_classification_metrics(pred_labels, asn.classes, valid, c)
            loss = loss + 0.0 * m["f1"]
        return loss

    def agg(pp, labels, mask, **kw):
        return sum(
            CFG.scale_w[i] * scale_loss_ablate(pp[i], labels, mask, ANCHORS[i], **kw)
            for i in range(3))

    noscatter = jax.jit(lambda pp, l, m: agg(pp, l, m, scatter=False))
    nometrics = jax.jit(lambda pp, l, m: agg(pp, l, m, metrics_on=False))
    full_inline = jax.jit(lambda pp, l, m: agg(pp, l, m))
    timeit("full_inline", full_inline, preds, labels, mask)
    timeit("noscatter", noscatter, preds, labels, mask)
    timeit("nometrics", nometrics, preds, labels, mask)

    grad_noscat = jax.jit(jax.grad(
        lambda pp, l, m: agg(pp, l, m, scatter=False)))
    timeit("grad_noscat", grad_noscat, preds, labels, mask)


if __name__ == "__main__":
    main()
