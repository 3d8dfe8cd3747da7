"""Segmentation accuracy harness (VERDICT r2 item #1): checkpoint ->
mask mAP@50 + dataset dice. Oracle tests for the matching protocol plus an
end-to-end CLI run from a briefly-trained tiny checkpoint."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_e2e import ANCHORS, TINY_MODEL_CONFIG, _write_seg_dataset  # noqa: E402


# ------------------------------------------------------------- oracles

def test_greedy_dice_perfect_match():
    from vision_conglomerate_tpu.tools.map_eval import greedy_dice

    # 2 preds exactly covering 2 GT instances (iou = dice = 1)
    iou = np.eye(2, dtype=np.float32)
    dice = np.eye(2, dtype=np.float32)
    scores = np.asarray([0.9, 0.8], np.float32)
    pc = np.asarray([0, 1])
    gc = np.asarray([0, 1])
    res = greedy_dice([(iou, dice, scores, pc, gc)])
    assert res["dice"] == pytest.approx(1.0)
    assert res["dice_matched"] == pytest.approx(1.0)
    assert res["recall"] == pytest.approx(1.0)


def test_greedy_dice_unmatched_gt_counts_zero():
    from vision_conglomerate_tpu.tools.map_eval import greedy_dice

    # 1 pred matches 1 of 2 GTs with dice 0.8; second GT unmatched
    iou = np.asarray([[0.7, 0.0]], np.float32)
    dice = np.asarray([[0.8, 0.0]], np.float32)
    res = greedy_dice([(iou, dice, np.asarray([0.9], np.float32),
                        np.asarray([0]), np.asarray([0, 0]))])
    assert res["dice"] == pytest.approx(0.4)          # (0.8 + 0) / 2
    assert res["dice_matched"] == pytest.approx(0.8)  # matched pair only
    assert res["recall"] == pytest.approx(0.5)


def test_greedy_dice_class_mismatch_not_matched():
    from vision_conglomerate_tpu.tools.map_eval import greedy_dice

    iou = np.asarray([[1.0]], np.float32)
    dice = np.asarray([[1.0]], np.float32)
    res = greedy_dice([(iou, dice, np.asarray([0.9], np.float32),
                        np.asarray([1]), np.asarray([0]))])
    assert res["dice"] == 0.0 and res["num_matched"] == 0


def test_mask_map_from_iou_oracle():
    from vision_conglomerate_tpu.tools.map_eval import compute_map_from_iou

    # perfect: every pred matches its GT at IoU 1
    per_image = []
    for _ in range(3):
        per_image.append((np.eye(2, dtype=np.float32),
                          np.asarray([0.9, 0.8], np.float32),
                          np.asarray([0, 1]), np.asarray([0, 1])))
    res = compute_map_from_iou(per_image, num_classes=2, iou_threshold=0.5)
    assert res["map"] == pytest.approx(1.0)

    # a duplicate detection on the same GT is a false positive after the
    # first match -> AP drops below 1 for that class
    per_image = [(np.asarray([[1.0], [0.95]], np.float32),
                  np.asarray([0.9, 0.8], np.float32),
                  np.asarray([0, 0]), np.asarray([0]))]
    res = compute_map_from_iou(per_image, num_classes=1, iou_threshold=0.5)
    assert res["map"] == pytest.approx(1.0)  # recall 1 reached at rank 1


def test_box_map_consistency_with_compute_map():
    """compute_map (boxes) must equal compute_map_from_iou fed the same
    box-IoU matrices — the refactor is behavior-preserving."""
    from vision_conglomerate_tpu.tools.map_eval import (
        _iou_matrix, compute_map, compute_map_from_iou)

    rng = np.random.default_rng(0)
    preds, gts, per_image = [], [], []
    for _ in range(5):
        pb = rng.uniform(0, 32, size=(4, 2))
        pb = np.concatenate([pb, pb + rng.uniform(4, 16, (4, 2))], axis=1).astype(np.float32)
        gb = rng.uniform(0, 32, size=(3, 2))
        gb = np.concatenate([gb, gb + rng.uniform(4, 16, (3, 2))], axis=1).astype(np.float32)
        ps = rng.uniform(0.1, 1.0, 4).astype(np.float32)
        pc = rng.integers(0, 2, 4)
        gc = rng.integers(0, 2, 3)
        preds.append((pb, ps, pc))
        gts.append((gb, gc))
        per_image.append((_iou_matrix(pb, gb), ps, pc, gc))
    a = compute_map(preds, gts, 2)
    b = compute_map_from_iou(per_image, 2)
    assert a["map"] == pytest.approx(b["map"])
    np.testing.assert_allclose(a["ap_per_class"], b["ap_per_class"])


# --------------------------------------------------------------- e2e CLI

def test_eval_seg_cli_from_checkpoint(tmp_path, monkeypatch):
    """Train a tiny seg net briefly, save best model, run eval_seg.run ->
    finite mask metrics in [0, 1], JSON-serializable."""
    monkeypatch.chdir(tmp_path)
    import yaml

    from vision_conglomerate_tpu.data import DataLoader, SegmentationDataset
    from vision_conglomerate_tpu.losses import SegmentationLossConfig
    from vision_conglomerate_tpu.models import SegmentationNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainSegmentationPipeline, make_optimizer

    root = str(tmp_path / "seg")
    _write_seg_dataset(root, n=3)
    cfg = dict(TINY_MODEL_CONFIG)
    cfg["num_masks"] = 8
    cfg["protos_config"] = {"c_h": 32}
    ds = SegmentationDataset(root, img_ext="png", img_wh=(64, 64), max_labels=8,
                             overlap_masks=True, mask_store_wh=(16, 16))
    dl = DataLoader(ds, batch_size=3, shuffle=False, num_workers=2)
    model = SegmentationNet(num_classes=2, config=cfg, anchors=ANCHORS)
    tx, _ = make_optimizer({"name": "Adam", "lr": 1e-3})
    pipe = TrainSegmentationPipeline(
        model, SegmentationLossConfig(num_classes=2, seg_candidates_per_image=8),
        tx, mesh=make_mesh(1), sample_input_shape=(64, 64, 3))
    pipe.train(dl)
    pipe.save_best_model()
    weights = "saved_model/segmentation/best_model/SegmentationNet.ckpt.tar"
    assert os.path.exists(weights)

    config = {
        "model_config": cfg,
        "train_config": {"img_config": {"img_wh": [64, 64], "img_ext": "png"}},
    }
    config_path = str(tmp_path / "config.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    import eval_seg

    args = eval_seg.build_parser().parse_args([
        "--weights_path", weights,
        "--data_dir", root,
        "--config_path", config_path,
        "--batch_size", "2",
        "--max_labels", "8",
        "--max_detections", "8",
    ])
    out = eval_seg.run(args)
    for k in ("mask_map50", "dice", "dice_matched", "mask_recall50", "box_map50"):
        assert 0.0 <= out[k] <= 1.0, (k, out[k])
    assert out["num_images"] == 3
    assert sum(out["num_gt_per_class"]) == 6  # 2 instances x 3 images
    json.dumps(out)  # serializable

    # beyond-reference serve crop: masks zeroed outside their predicted box
    # before scoring. box_map must be identical (crop touches masks only).
    args_crop = eval_seg.build_parser().parse_args([
        "--weights_path", weights,
        "--data_dir", root,
        "--config_path", config_path,
        "--batch_size", "2",
        "--max_labels", "8",
        "--max_detections", "8",
        "--crop_masks",
    ])
    out_crop = eval_seg.run(args_crop)
    assert out_crop["crop_masks"] is True
    assert out_crop["box_map50"] == pytest.approx(out["box_map50"])
    for k in ("mask_map50", "dice", "dice_matched", "mask_recall50"):
        assert 0.0 <= out_crop[k] <= 1.0, (k, out_crop[k])


def test_train_seg_reference_config_key_locations(tmp_path):
    """Reference-format configs put overlap_masks at train_config level and
    mask_scale_factor in img_config (/root/reference/train_seg.py:75,
    dataset/segmentation_dataset.py:20); both must reach the dataset, with
    train_config.overlap_masks overriding loss_config."""
    import sys, os as _os
    sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    from tests.test_e2e import _write_seg_dataset
    import train_seg

    _write_seg_dataset(str(tmp_path / "data/segmentation/train"), n=2, size=64)
    config = {"train_config": {
        "data_path": str(tmp_path / "data/segmentation"),
        "overlap_masks": False,
        "img_config": {"img_ext": "png", "img_wh": [64, 64],
                       "mask_scale_factor": 0.5},
        "dataloader_config": {"max_labels": 8},
        "loss_config": {"overlap_masks": True},  # must lose to train_config
    }}
    ds = train_seg.make_dataset(config, "train")
    assert ds.overlap_masks is False
    assert ds.mask_scale_factor == 0.5
    assert ds.mask_store_wh is None  # explicit scale disables the /4 store
    img, labels, masks = ds[0]
    assert masks.shape == (2, 32, 32)  # per-instance binary at half res

    # without the reference keys: overlap from loss_config, /4 proto-res store
    config2 = {"train_config": {
        "data_path": str(tmp_path / "data/segmentation"),
        "img_config": {"img_ext": "png", "img_wh": [64, 64]},
        "dataloader_config": {"max_labels": 8},
        "loss_config": {"overlap_masks": True},
    }}
    ds2 = train_seg.make_dataset(config2, "train")
    assert ds2.overlap_masks is True
    assert ds2.mask_store_wh == (16, 16)

    # dataloader_config.decode_backend reaches the dataset (round 3: the
    # inherited kwarg was silently ignored by the seg __getitem__ before)
    config2["train_config"]["dataloader_config"]["decode_backend"] = "native"
    ds3 = train_seg.make_dataset(config2, "train")
    assert ds3._native is not None
