"""Parity tests: our fixed-capacity assigner / CIoU / losses vs the reference
torch implementation executed on CPU (SURVEY.md §4d).

The reference package is imported from /root/reference with a stub for its
`supervision` dependency (not installed here). We compare *semantics*:
the multiset of matched (b, gj, gi, a, cls, txywh) rows must be identical.
"""
import sys
import types

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref_modules():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if "supervision" not in sys.modules:
        sys.modules["supervision"] = types.SimpleNamespace(Detections=object)
    if "torchvision" not in sys.modules:
        # minimal stubs: the reference imports torchvision at module scope but
        # the pieces under test (assigner / CIoU) never touch it.
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_resnet = types.ModuleType("torchvision.models.resnet")

        class _Stub:  # placeholder classes, never instantiated in these tests
            pass

        tv_resnet.ResNet = _Stub
        tv_resnet.BasicBlock = _Stub
        tv_resnet.Bottleneck = _Stub
        tv_models.resnet = tv_resnet
        tv_tf = types.ModuleType("torchvision.transforms")
        tv_tf_f = types.ModuleType("torchvision.transforms.functional")
        tv_ops = types.ModuleType("torchvision.ops")
        tv.models = tv_models
        tv.transforms = tv_tf
        tv.ops = tv_ops
        tv_tf.functional = tv_tf_f
        for name, mod in [
            ("torchvision", tv), ("torchvision.models", tv_models),
            ("torchvision.models.resnet", tv_resnet),
            ("torchvision.transforms", tv_tf),
            ("torchvision.transforms.functional", tv_tf_f),
            ("torchvision.ops", tv_ops),
        ]:
            sys.modules[name] = mod
    from dataset.detection_dataset import DetectionDataset  # noqa: E402
    from modules.detection_loss import DetectionLoss  # noqa: E402
    return DetectionDataset, DetectionLoss


def _random_targets(rng, batch_size, max_boxes, num_classes=3):
    """Generate a batch of normalized boxes in both layouts."""
    counts = rng.integers(0, max_boxes + 1, size=batch_size)
    rows = []
    labels = np.zeros((batch_size, max_boxes, 5), np.float32)
    mask = np.zeros((batch_size, max_boxes), bool)
    for b, n in enumerate(counts):
        for m in range(n):
            cls = rng.integers(0, num_classes)
            xy = rng.uniform(0.05, 0.95, 2)
            wh = rng.uniform(0.02, 0.4, 2)
            rows.append([b, cls, *xy, *wh])
            labels[b, m] = [cls, *xy, *wh]
            mask[b, m] = True
    concat = np.asarray(rows, np.float32) if rows else np.zeros((0, 6), np.float32)
    return concat, labels, mask


ANCHORS = np.asarray(
    [[0.05, 0.06], [0.12, 0.2], [0.3, 0.25]], dtype=np.float32)


@pytest.mark.parametrize("seed,fmap", [(0, (8, 8)), (1, (16, 12)), (2, (4, 4))])
def test_assigner_matches_reference(ref_modules, seed, fmap):
    import torch
    DetectionDataset, _ = ref_modules
    rng = np.random.default_rng(seed)
    concat, labels, mask = _random_targets(rng, batch_size=3, max_boxes=6)

    indices, classes, r_anchors, boxes, _, _ = DetectionDataset.build_target_by_scale(
        torch.from_numpy(concat), list(fmap), torch.from_numpy(ANCHORS),
        anchor_threshold=4.0, edge_threshold=0.5,
    )
    ref_rows = set()
    for i in range(classes.shape[0]):
        b, gj, gi, a = [int(x[i]) for x in indices]
        row = (b, gj, gi, a, int(classes[i]),
               tuple(np.round(boxes[i].numpy(), 4)),
               tuple(np.round(r_anchors[i].numpy(), 4)))
        ref_rows.add(row)

    from vision_conglomerate_tpu.losses import assign_targets_to_scale
    asn = assign_targets_to_scale(
        jnp.asarray(labels), jnp.asarray(mask), fmap, jnp.asarray(ANCHORS),
        anchor_threshold=4.0, edge_threshold=0.5,
    )
    ours = set()
    valid = np.asarray(asn.valid)
    for i in np.where(valid)[0]:
        row = (int(asn.batch_idx[i]), int(asn.grid_j[i]), int(asn.grid_i[i]),
               int(asn.anchor_idx[i]), int(asn.classes[i]),
               tuple(np.round(np.asarray(asn.t_xywh[i]), 4)),
               tuple(np.round(np.asarray(asn.anchors[i]), 4)))
        ours.add(row)

    assert ours == ref_rows


def test_ciou_matches_reference(ref_modules):
    import torch
    _, DetectionLoss = ref_modules
    rng = np.random.default_rng(7)
    p = rng.uniform(0.1, 5.0, size=(32, 4)).astype(np.float32)
    t = rng.uniform(0.1, 5.0, size=(32, 4)).astype(np.float32)
    ref = DetectionLoss.compute_ciou(torch.from_numpy(p), torch.from_numpy(t)).numpy()
    from vision_conglomerate_tpu.ops.boxes import compute_ciou
    ours = np.asarray(compute_ciou(jnp.asarray(p), jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_detection_loss_runs_and_is_finite():
    from vision_conglomerate_tpu.losses import DetectionLossConfig, detection_loss
    rng = np.random.default_rng(3)
    num_classes = 3
    d = 1 + num_classes + 4
    preds = []
    for g in (8, 4, 2):
        raw = rng.normal(size=(2, g, g, 3, d)).astype(np.float32)
        # emulate train-form decode on xy/wh channels
        import jax
        x = jnp.asarray(raw)
        xy = jax.nn.sigmoid(x[..., 4:6]) * 2 - 0.5
        wh = jnp.square(jax.nn.sigmoid(x[..., 6:8]) * 2)
        preds.append(jnp.concatenate([x[..., :4], xy, wh], axis=-1))
    _, labels, mask = _random_targets(rng, 2, 4)
    anchors = [jnp.asarray(ANCHORS)] * 3
    cfg = DetectionLossConfig(num_classes=num_classes)
    loss, metrics = detection_loss(preds, jnp.asarray(labels), jnp.asarray(mask), anchors, cfg)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(metrics["conf_loss"]))
    assert float(metrics["aggregate_loss"]) == pytest.approx(float(loss))


def test_detection_loss_empty_targets():
    """No targets: box/class losses 0, conf loss finite (reference NaN->0 path)."""
    from vision_conglomerate_tpu.losses import DetectionLossConfig, detection_loss
    num_classes = 2
    d = 1 + num_classes + 4
    preds = [jnp.zeros((2, g, g, 3, d)) for g in (8, 4, 2)]
    labels = jnp.zeros((2, 4, 5))
    mask = jnp.zeros((2, 4), bool)
    anchors = [jnp.asarray(ANCHORS)] * 3
    loss, metrics = detection_loss(preds, labels, mask, anchors,
                                   DetectionLossConfig(num_classes=num_classes))
    assert np.isfinite(float(loss))
    assert np.isnan(float(metrics["accuracy"]))  # reference yields NaN metrics here
