"""Gradient + segmentation-loss parity vs the torch reference (CPU).

Round-2 closed loss *value* parity (tests/test_detection_loss_vs_reference.py)
but value parity does not imply gradient parity: a stop_gradient in the wrong
place (e.g. the detached-CIoU conf target, detection_loss.py:180 in the
reference) changes training while leaving every loss value identical. These
tests differentiate both implementations w.r.t. the raw head outputs (and the
protos, for segmentation) on identical inputs and compare the gradients.

Also the first *numeric* parity test for the segmentation loss
(/root/reference/modules/segmentation_loss.py:26-228): previously it was only
finite/e2e-tested.
"""
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_loss_parity import ref_modules  # noqa: F401  (fixture reuse)
from tests.test_detection_loss_vs_reference import ANCHORS, _make_inputs

GRIDS = (8, 4, 2)


def _torch_train_decode(x, c):
    """Reference train-mode head decode kept differentiable
    (modules/detection.py:117-126)."""
    import torch
    xy = torch.sigmoid(x[..., 1 + c:3 + c]) * 2 - 0.5
    wh = (torch.sigmoid(x[..., 3 + c:5 + c]) * 2) ** 2
    return torch.cat([x[..., :1 + c], xy, wh, x[..., 5 + c:].tanh()], dim=-1) \
        if x.shape[-1] > 5 + c else torch.cat([x[..., :1 + c], xy, wh], dim=-1)


def _jax_train_decode(x, c):
    xy = jax.nn.sigmoid(x[..., 1 + c:3 + c]) * 2 - 0.5
    wh = jnp.square(jax.nn.sigmoid(x[..., 3 + c:5 + c]) * 2)
    parts = [x[..., :1 + c], xy, wh]
    if x.shape[-1] > 5 + c:
        parts.append(jnp.tanh(x[..., 5 + c:]))
    return jnp.concatenate(parts, axis=-1)


@pytest.mark.parametrize("seed", [0, 1])
def test_detection_loss_grad_parity(ref_modules, seed):  # noqa: F811
    """d(total_loss)/d(raw head output) must match the reference exactly
    (box + conf + class paths, incl. the detached-CIoU conf target and the
    last-write-wins scatter ordering)."""
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
    raw_t = {g: torch.tensor(raw[g], requires_grad=True) for g in GRIDS}
    preds_t = tuple(_torch_train_decode(raw_t[g], c) for g in GRIDS)
    ref_total, _ = ref_loss_fn(preds_t, torch.from_numpy(concat))
    ref_total.backward()
    ref_grads = {g: raw_t[g].grad.numpy() for g in GRIDS}

    from vision_conglomerate_tpu.losses import DetectionLossConfig, detection_loss
    cfg = DetectionLossConfig(
        num_classes=c, box_w=0.1, conf_w=1.0, class_w=0.3, label_smoothing=0.001,
        scale_w=(4.0, 2.0, 1.0))
    anchors = [jnp.asarray(ANCHORS[k]) for k in ("sm", "md", "lg")]

    def total_loss(raw_tree):
        preds = [_jax_train_decode(raw_tree[g], c) for g in GRIDS]
        loss, _ = detection_loss(
            preds, jnp.asarray(labels), jnp.asarray(mask), anchors, cfg)
        return loss

    our_grads = jax.grad(total_loss)({g: jnp.asarray(raw[g]) for g in GRIDS})
    for g in GRIDS:
        np.testing.assert_allclose(
            np.asarray(our_grads[g]), ref_grads[g], rtol=2e-3, atol=2e-6,
            err_msg=f"grid {g}")


def test_tracknet_ce_value_and_grad_parity():
    """TrackNet's loss is nn.CrossEntropyLoss over the 256 intensity bins
    (reference train_tracknet.py:97, pipeline/tracknet_trainer.py:220-222);
    ours is losses.focal.softmax_cross_entropy mean'd over pixels. Value and
    gradient must agree."""
    import torch
    from vision_conglomerate_tpu.losses.focal import softmax_cross_entropy

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 8, 16, 256)).astype(np.float32)
    gt = rng.integers(0, 256, size=(2, 8, 16))

    lt = torch.tensor(logits, requires_grad=True)
    ref = torch.nn.CrossEntropyLoss()(lt.flatten(0, -2), torch.from_numpy(gt).flatten())
    ref.backward()

    def loss(lj):
        return softmax_cross_entropy(lj, jnp.asarray(gt, jnp.int32)).mean()

    ours, grad = jax.value_and_grad(loss)(jnp.asarray(logits))
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)
    np.testing.assert_allclose(np.asarray(grad), lt.grad.numpy(), rtol=1e-4, atol=1e-7)


# ---------------------------------------------------------------------------
# Keypoint path: gradient parity
# ---------------------------------------------------------------------------

NKP = 2


def _torch_kp_decode(x, c, nkp):
    import torch
    xy = torch.sigmoid(x[..., 1 + c:3 + c]) * 2 - 0.5
    wh = (torch.sigmoid(x[..., 3 + c:5 + c]) * 2) ** 2
    kp = x[..., 5 + c:].reshape(*x.shape[:-1], nkp, 5)
    kp = torch.cat([kp[..., :2].sigmoid(), kp[..., 2:]], dim=-1)
    return torch.cat(
        [x[..., :1 + c], xy, wh, kp.reshape(*x.shape[:-1], nkp * 5)], dim=-1)


def _jax_kp_decode(x, c, nkp):
    xy = jax.nn.sigmoid(x[..., 1 + c:3 + c]) * 2 - 0.5
    wh = jnp.square(jax.nn.sigmoid(x[..., 3 + c:5 + c]) * 2)
    kp = x[..., 5 + c:].reshape(x.shape[:-1] + (nkp, 5))
    kp = jnp.concatenate([jax.nn.sigmoid(kp[..., :2]), kp[..., 2:]], axis=-1)
    return jnp.concatenate(
        [x[..., :1 + c], xy, wh, kp.reshape(x.shape[:-1] + (nkp * 5,))], axis=-1)


def _make_kp_inputs(seed, b=3, m=4, c=2):
    """Labels with nkp finite keypoints per box (the only protocol the
    reference's visibility CE accepts: its inf-padding is comment-only,
    detection_loss.py:167-171 — an inf target would crash the int64 cast)."""
    rng = np.random.default_rng(seed)
    d = 1 + c + 4 + 5 * NKP
    raw = {g: rng.normal(size=(b, g, g, 3, d)).astype(np.float32) for g in GRIDS}
    labels = np.zeros((b, m, 5 + 3 * NKP), np.float32)
    mask = np.zeros((b, m), bool)
    rows = []
    for i in range(b):
        n = int(rng.integers(1, m + 1))
        for j in range(n):
            cls = rng.integers(0, c)
            xy = rng.uniform(0.1, 0.9, 2)
            wh = rng.uniform(0.05, 0.5, 2)
            kps = []
            for _ in range(NKP):
                kps += [*rng.uniform(0.0, 1.0, 2), float(rng.integers(0, 3))]
            labels[i, j] = [cls, *xy, *wh, *kps]
            mask[i, j] = True
            rows.append([i, cls, *xy, *wh, *kps])
    return raw, labels, mask, np.asarray(rows, np.float32)


def test_detection_loss_kp_grad_parity(ref_modules):  # noqa: F811
    """Keypoint visibility-CE + coordinate-MSE gradients must match the
    reference (…:147-173) — the kp coupling (1+kpv)*kpc makes kpv gradients
    scale with kpc and vice versa, so a divergence in either shows up."""
    import torch
    _, RefDetectionLoss = ref_modules
    c = 2
    raw, labels, mask, concat = _make_kp_inputs(0, c=c)

    fake_model = types.SimpleNamespace(
        num_classes=c,
        num_keypoints=NKP,
        sm_anchors=torch.nn.Parameter(torch.from_numpy(ANCHORS["sm"])),
        md_anchors=torch.nn.Parameter(torch.from_numpy(ANCHORS["md"])),
        lg_anchors=torch.nn.Parameter(torch.from_numpy(ANCHORS["lg"])),
    )
    ref_loss_fn = RefDetectionLoss(
        fake_model, box_w=0.1, conf_w=1.0, class_w=0.3, keypoints_w=0.8,
        label_smoothing=0.001, scale_w=[4.0, 2.0, 1.0])
    raw_t = {g: torch.tensor(raw[g], requires_grad=True) for g in GRIDS}
    preds_t = tuple(_torch_kp_decode(raw_t[g], c, NKP) for g in GRIDS)
    ref_total, ref_metrics = ref_loss_fn(preds_t, torch.from_numpy(concat))
    ref_total.backward()
    ref_grads = {g: raw_t[g].grad.numpy() for g in GRIDS}

    from vision_conglomerate_tpu.losses import DetectionLossConfig, detection_loss
    cfg = DetectionLossConfig(
        num_classes=c, num_keypoints=NKP, box_w=0.1, conf_w=1.0, class_w=0.3,
        keypoints_w=0.8, label_smoothing=0.001, scale_w=(4.0, 2.0, 1.0))
    anchors = [jnp.asarray(ANCHORS[k]) for k in ("sm", "md", "lg")]

    def total_loss(raw_tree):
        preds = [_jax_kp_decode(raw_tree[g], c, NKP) for g in GRIDS]
        loss, _ = detection_loss(
            preds, jnp.asarray(labels), jnp.asarray(mask), anchors, cfg)
        return loss

    our_total, our_metrics = detection_loss(
        [_jax_kp_decode(jnp.asarray(raw[g]), c, NKP) for g in GRIDS],
        jnp.asarray(labels), jnp.asarray(mask), anchors, cfg)
    assert float(our_total) == pytest.approx(float(ref_total), rel=2e-4, abs=1e-5)
    for key in ("kpv_loss", "kpc_loss", "kp_loss"):
        assert float(our_metrics[key]) == pytest.approx(
            float(ref_metrics[key]), rel=2e-3, abs=2e-4), key

    our_grads = jax.grad(total_loss)({g: jnp.asarray(raw[g]) for g in GRIDS})
    for g in GRIDS:
        np.testing.assert_allclose(
            np.asarray(our_grads[g]), ref_grads[g], rtol=2e-3, atol=2e-6,
            err_msg=f"grid {g}")


# ---------------------------------------------------------------------------
# Segmentation loss: value + gradient parity
# ---------------------------------------------------------------------------

K = 4           # proto channels
PROTO_HW = 16   # proto (and target-mask) resolution


def _make_seg_inputs(seed, b=3, m=4, c=2):
    """Raw per-scale head outputs + labels + overlap target masks + protos.

    The overlap mask stores the 1-based per-image instance index
    (reference build_target_by_scale, detection_dataset.py:150-156); disjoint
    horizontal bands keep the ids unambiguous.
    """
    rng = np.random.default_rng(seed)
    d = 1 + c + 4 + K
    raw = {g: rng.normal(size=(b, g, g, 3, d)).astype(np.float32) for g in GRIDS}
    protos = rng.normal(size=(b, K, PROTO_HW, PROTO_HW)).astype(np.float32)

    labels = np.zeros((b, m, 5), np.float32)
    mask = np.zeros((b, m), bool)
    tmasks = np.zeros((b, PROTO_HW, PROTO_HW), np.float32)
    rows = []
    for i in range(b):
        n = int(rng.integers(1, m + 1))
        for j in range(n):
            cls = rng.integers(0, c)
            xy = rng.uniform(0.15, 0.85, 2)
            wh = rng.uniform(0.1, 0.5, 2)
            labels[i, j] = [cls, *xy, *wh]
            mask[i, j] = True
            rows.append([i, cls, *xy, *wh])
            r0 = (j * PROTO_HW) // m
            r1 = ((j + 1) * PROTO_HW) // m
            tmasks[i, r0:r1, : int(PROTO_HW * wh[0])] = j + 1  # 1-based id
    return raw, labels, mask, np.asarray(rows, np.float32), protos, tmasks


def _ref_seg_loss(ref_modules, raw_t, concat, protos_t, tmasks_t, c):  # noqa: F811
    import sys
    import torch
    sys.path.insert(0, "/root/reference") if "/root/reference" not in sys.path else None
    from modules.segmentation_loss import SegmentationLoss as RefSegmentationLoss

    fake_model = types.SimpleNamespace(
        num_classes=c,
        num_keypoints=None,
        proto_seg_module=types.SimpleNamespace(out_channels=K),
        sm_anchors=torch.nn.Parameter(torch.from_numpy(ANCHORS["sm"])),
        md_anchors=torch.nn.Parameter(torch.from_numpy(ANCHORS["md"])),
        lg_anchors=torch.nn.Parameter(torch.from_numpy(ANCHORS["lg"])),
    )
    ref_loss_fn = RefSegmentationLoss(
        fake_model, box_w=0.1, conf_w=1.0, class_w=0.3, seg_w=0.7,
        label_smoothing=0.001, scale_w=[4.0, 2.0, 1.0], overlap_masks=True)
    preds_t = tuple(_torch_train_decode(raw_t[g], c) for g in GRIDS)
    return ref_loss_fn(preds_t, torch.from_numpy(concat), protos_t, tmasks_t)


def _our_seg_cfg(c):
    from vision_conglomerate_tpu.losses import SegmentationLossConfig
    return SegmentationLossConfig(
        num_classes=c, box_w=0.1, conf_w=1.0, class_w=0.3, seg_w=0.7,
        label_smoothing=0.001, scale_w=(4.0, 2.0, 1.0), overlap_masks=True,
        seg_candidates_per_image=512,  # >= lattice size: nothing truncated
        cap_policy="first")


@pytest.mark.parametrize("seed", [0, 1])
def test_segmentation_loss_value_parity(ref_modules, seed):  # noqa: F811
    import torch
    c = 2
    raw, labels, mask, concat, protos, tmasks = _make_seg_inputs(seed, c=c)
    raw_t = {g: torch.from_numpy(raw[g]) for g in GRIDS}
    ref_total, ref_metrics = _ref_seg_loss(
        ref_modules, raw_t, concat, torch.from_numpy(protos),
        torch.from_numpy(tmasks), c)

    from vision_conglomerate_tpu.losses import segmentation_loss
    cfg = _our_seg_cfg(c)
    preds_j = [_jax_train_decode(jnp.asarray(raw[g]), c) for g in GRIDS]
    anchors = [jnp.asarray(ANCHORS[k]) for k in ("sm", "md", "lg")]
    our_total, our_metrics = segmentation_loss(
        preds_j, jnp.asarray(labels), jnp.asarray(mask),
        jnp.asarray(protos).transpose(0, 2, 3, 1),  # NCHW -> NHWC
        jnp.asarray(tmasks), anchors, cfg)

    assert float(our_total) == pytest.approx(float(ref_total), rel=2e-4, abs=1e-5)
    for key in ("seg_loss", "dice_score", "mean_ciou", "conf_loss",
                "class_loss", "avg_pos_conf", "avg_neg_conf"):
        assert float(our_metrics[key]) == pytest.approx(
            float(ref_metrics[key]), rel=2e-3, abs=2e-4), key


def test_segmentation_loss_grad_parity(ref_modules):  # noqa: F811
    """d(total)/d(raw preds) and d(total)/d(protos): covers the proto einsum,
    the crop/area normalisation, the (1-bce)*dice coupling and the rounded
    dice's zero subgradient."""
    import torch
    c = 2
    raw, labels, mask, concat, protos, tmasks = _make_seg_inputs(0, c=c)
    raw_t = {g: torch.tensor(raw[g], requires_grad=True) for g in GRIDS}
    protos_t = torch.tensor(protos, requires_grad=True)
    ref_total, _ = _ref_seg_loss(
        ref_modules, raw_t, concat, protos_t, torch.from_numpy(tmasks), c)
    ref_total.backward()
    ref_grads = {g: raw_t[g].grad.numpy() for g in GRIDS}
    ref_pgrad = protos_t.grad.numpy()

    from vision_conglomerate_tpu.losses import segmentation_loss
    cfg = _our_seg_cfg(c)
    anchors = [jnp.asarray(ANCHORS[k]) for k in ("sm", "md", "lg")]

    def total_loss(raw_tree, protos_nhwc):
        preds = [_jax_train_decode(raw_tree[g], c) for g in GRIDS]
        loss, _ = segmentation_loss(
            preds, jnp.asarray(labels), jnp.asarray(mask), protos_nhwc,
            jnp.asarray(tmasks), anchors, cfg)
        return loss

    our_grads, our_pgrad = jax.grad(total_loss, argnums=(0, 1))(
        {g: jnp.asarray(raw[g]) for g in GRIDS},
        jnp.asarray(protos).transpose(0, 2, 3, 1))
    for g in GRIDS:
        np.testing.assert_allclose(
            np.asarray(our_grads[g]), ref_grads[g], rtol=2e-3, atol=2e-6,
            err_msg=f"grid {g}")
    np.testing.assert_allclose(
        np.asarray(our_pgrad).transpose(0, 3, 1, 2), ref_pgrad,
        rtol=2e-3, atol=2e-6)
