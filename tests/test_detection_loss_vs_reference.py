"""Numerical parity: full detection loss vs the reference torch implementation
on identical preds/targets (the strongest semantics check short of training).

The reference DetectionLoss needs a `model` only for num_classes /
num_keypoints / anchors (detection_loss.py:91-93,141-143) — faked with a
namespace. Metrics that are sklearn-based are compared too.
"""
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_loss_parity import ref_modules  # noqa: F401  (fixture reuse)

ANCHORS = {
    "sm": np.asarray([[0.05, 0.06], [0.1, 0.1], [0.15, 0.12]], np.float32),
    "md": np.asarray([[0.2, 0.2], [0.3, 0.25], [0.25, 0.35]], np.float32),
    "lg": np.asarray([[0.4, 0.5], [0.6, 0.5], [0.7, 0.8]], np.float32),
}


def _make_inputs(seed, b=3, m=5, c=3):
    rng = np.random.default_rng(seed)
    d = 1 + c + 4
    raw = {g: rng.normal(size=(b, g, g, 3, d)).astype(np.float32) for g in (8, 4, 2)}
    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    rows = []
    for i in range(b):
        n = rng.integers(1, m + 1)
        for j in range(n):
            cls = rng.integers(0, c)
            xy = rng.uniform(0.1, 0.9, 2)
            wh = rng.uniform(0.05, 0.5, 2)
            labels[i, j] = [cls, *xy, *wh]
            mask[i, j] = True
            rows.append([i, cls, *xy, *wh])
    return raw, labels, mask, np.asarray(rows, np.float32)


def _train_decode_np(raw, c):
    import torch
    x = torch.from_numpy(raw)
    xy = torch.sigmoid(x[..., 1 + c:3 + c]) * 2 - 0.5
    wh = (torch.sigmoid(x[..., 3 + c:5 + c]) * 2) ** 2
    return torch.cat([x[..., :1 + c], xy, wh], dim=-1)


@pytest.mark.parametrize("seed", [0, 1])
def test_detection_loss_value_parity(ref_modules, seed):  # noqa: F811
    import torch
    _, RefDetectionLoss = ref_modules
    c = 3
    raw, labels, mask, concat = _make_inputs(seed, c=c)

    fake_model = types.SimpleNamespace(
        num_classes=c,
        num_keypoints=None,
        sm_anchors=torch.nn.Parameter(torch.from_numpy(ANCHORS["sm"])),
        md_anchors=torch.nn.Parameter(torch.from_numpy(ANCHORS["md"])),
        lg_anchors=torch.nn.Parameter(torch.from_numpy(ANCHORS["lg"])),
    )
    ref_loss_fn = RefDetectionLoss(
        fake_model, box_w=0.1, conf_w=1.0, class_w=0.3, label_smoothing=0.001,
        scale_w=[4.0, 2.0, 1.0])
    preds_t = tuple(_train_decode_np(raw[g], c) for g in (8, 4, 2))
    ref_total, ref_metrics = ref_loss_fn(preds_t, torch.from_numpy(concat))

    from vision_conglomerate_tpu.losses import DetectionLossConfig, detection_loss
    import jax
    preds_j = []
    for g in (8, 4, 2):
        x = jnp.asarray(raw[g])
        xy = jax.nn.sigmoid(x[..., 1 + c:3 + c]) * 2 - 0.5
        wh = jnp.square(jax.nn.sigmoid(x[..., 3 + c:5 + c]) * 2)
        preds_j.append(jnp.concatenate([x[..., :1 + c], xy, wh], axis=-1))
    cfg = DetectionLossConfig(
        num_classes=c, box_w=0.1, conf_w=1.0, class_w=0.3, label_smoothing=0.001,
        scale_w=(4.0, 2.0, 1.0))
    anchors = [jnp.asarray(ANCHORS[k]) for k in ("sm", "md", "lg")]
    our_total, our_metrics = detection_loss(
        preds_j, jnp.asarray(labels), jnp.asarray(mask), anchors, cfg)

    assert float(our_total) == pytest.approx(float(ref_total), rel=2e-4, abs=1e-5)
    for key in ("mean_ciou", "conf_loss", "class_loss", "avg_pos_conf",
                "avg_neg_conf", "accuracy", "f1", "precision", "recall"):
        assert float(our_metrics[key]) == pytest.approx(
            float(ref_metrics[key]), rel=2e-3, abs=2e-4), key
