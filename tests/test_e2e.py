"""End-to-end tests with synthetic on-disk datasets: dataset -> trainer ->
checkpoint -> inference driver -> rendered outputs (SURVEY.md §4b)."""
import glob
import os

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

TINY_MODEL_CONFIG = {
    "train_anchors": True,
    "backbone": "CSPBackBone",
    "neck": "RepBiPAN",
    "head": "EffiDecHead",
    "cspbackbone_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
    "repbipan_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
    "effidechead_config": {"width_multiple": 0.5},
}

ANCHORS = {
    "sm": [[0.1, 0.1], [0.15, 0.15], [0.2, 0.2]],
    "md": [[0.25, 0.25], [0.3, 0.3], [0.35, 0.35]],
    "lg": [[0.4, 0.4], [0.5, 0.5], [0.6, 0.6]],
}


def _write_detection_dataset(root, n=4, size=64, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        img = (rng.uniform(size=(size, size, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, f"img_{i}.png"))
        with open(os.path.join(root, f"img_{i}.txt"), "w") as f:
            f.write("0 0.5 0.5 0.3 0.3\n1 0.25 0.25 0.15 0.2\n")


def _write_seg_dataset(root, n=3, size=64, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        img = (rng.uniform(size=(size, size, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, f"img_{i}.png"))
        # two square polygons (cls x1 y1 x2 y2 ...)
        with open(os.path.join(root, f"img_{i}.txt"), "w") as f:
            f.write("0 0.3 0.3 0.7 0.3 0.7 0.7 0.3 0.7\n")
            f.write("1 0.1 0.1 0.3 0.1 0.3 0.3 0.1 0.3\n")


def test_detection_dataset_and_loader(tmp_path):
    from vision_conglomerate_tpu.data import DataLoader, DetectionDataset

    root = str(tmp_path / "det")
    _write_detection_dataset(root)
    ds = DetectionDataset(root, img_ext="png", img_wh=(64, 64), max_labels=8)
    assert len(ds) == 4
    img, labels = ds[0]
    assert img.shape == (64, 64, 3) and labels.shape == (2, 5)
    dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 2
    imgs, lab, mask = batches[0]
    assert imgs.shape == (2, 64, 64, 3)
    assert lab.shape == (2, 8, 5)
    assert mask.sum() == 4


def test_segmentation_dataset(tmp_path):
    from vision_conglomerate_tpu.data import SegmentationDataset

    root = str(tmp_path / "seg")
    _write_seg_dataset(root)
    ds = SegmentationDataset(root, img_ext="png", img_wh=(64, 64), max_labels=8,
                             overlap_masks=True)
    img, labels, masks = ds[0]
    assert labels.shape[0] == 2
    assert masks.shape == (1, 64, 64)
    assert masks.max() == 2  # two overlap ids
    imgs, lab, valid, tgt = ds.collate_fn([ds[0], ds[1]])
    assert tgt.shape == (2, 64, 64)


def test_detection_train_checkpoint_infer_roundtrip(tmp_path, monkeypatch):
    """Train 2 epochs on synthetic data, save best model, run the inference
    driver on the same images; assert rendered outputs + summary exist."""
    from vision_conglomerate_tpu.data import DataLoader, DetectionDataset
    from vision_conglomerate_tpu.infer.runner import run_detection_inference
    from vision_conglomerate_tpu.losses import DetectionLossConfig
    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainDetectionPipeline, make_optimizer

    monkeypatch.chdir(tmp_path)
    root = str(tmp_path / "det")
    _write_detection_dataset(root)
    ds = DetectionDataset(root, img_ext="png", img_wh=(64, 64), max_labels=8)
    dl = DataLoader(ds, batch_size=4, shuffle=False, num_workers=2)

    model = DetectionNet(num_classes=2, config=TINY_MODEL_CONFIG, anchors=ANCHORS)
    tx, _ = make_optimizer({"name": "Adam", "lr": 1e-3})
    pipe = TrainDetectionPipeline(
        model, DetectionLossConfig(num_classes=2), tx,
        mesh=make_mesh(1), sample_input_shape=(64, 64, 3))
    pipe.train(dl)
    pipe.evaluate(dl)
    pipe.best_model_dir = str(tmp_path / "best")
    pipe.save_best_model()
    weights = str(tmp_path / "best" / "DetectionNet.ckpt.tar")
    assert os.path.exists(weights)
    pipe.metrics_to_csv()
    assert os.path.exists(os.path.join("metrics/detection", "train_metrics.csv"))

    config = {
        "model_config": TINY_MODEL_CONFIG,
        "train_config": {"img_config": {"img_wh": [64, 64], "img_ext": "png"}},
    }
    storage = run_detection_inference(
        path=root, weights_path=weights, config=config, task="detection",
        batch_size=2, iou_threshold=0.5, score_threshold=0.0,
        with_summary=True, box_allowance=0, max_detections=16,
        storage_path=str(tmp_path / "out"),
    )
    pngs = glob.glob(os.path.join(storage, "img_*.png"))
    assert len(pngs) == 4  # score_threshold=0 -> every image has boxes
    assert os.path.exists(os.path.join(storage, "output.csv"))

    # out_ext=jpg: the measured host-encode lever (docs/PERF.md end-to-end
    # serving); same images, jpg outputs instead of the reference's png
    storage2 = run_detection_inference(
        path=root, weights_path=weights, config=config, task="detection",
        batch_size=2, iou_threshold=0.5, score_threshold=0.0,
        with_summary=False, box_allowance=0, max_detections=16,
        storage_path=str(tmp_path / "out_jpg"), out_ext="jpg",
    )
    assert len(glob.glob(os.path.join(storage2, "img_*.jpg"))) == 4
    import pytest as _pytest
    with _pytest.raises(ValueError, match="out_ext"):
        run_detection_inference(
            path=root, weights_path=weights, config=config, task="detection",
            batch_size=2, storage_path=str(tmp_path / "out_bad"),
            out_ext="bmp",
        )


def test_segmentation_train_step(tmp_path):
    from vision_conglomerate_tpu.data import DataLoader, SegmentationDataset
    from vision_conglomerate_tpu.losses import SegmentationLossConfig
    from vision_conglomerate_tpu.models import SegmentationNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainSegmentationPipeline, make_optimizer

    root = str(tmp_path / "seg")
    _write_seg_dataset(root)
    cfg = dict(TINY_MODEL_CONFIG)
    cfg["num_masks"] = 8
    cfg["protos_config"] = {"c_h": 32}
    ds = SegmentationDataset(root, img_ext="png", img_wh=(64, 64), max_labels=8,
                             overlap_masks=True, mask_store_wh=(16, 16))
    dl = DataLoader(ds, batch_size=3, shuffle=False, num_workers=2)

    model = SegmentationNet(num_classes=2, config=cfg, anchors=ANCHORS)
    tx, _ = make_optimizer({"name": "Adam", "lr": 1e-3})
    pipe = TrainSegmentationPipeline(
        model,
        SegmentationLossConfig(num_classes=2, seg_candidates_per_image=8),
        tx, mesh=make_mesh(1), sample_input_shape=(64, 64, 3))
    m1 = pipe.train(dl)
    assert np.isfinite(m1["aggregate_loss"])
    assert np.isfinite(m1["seg_loss"])
    assert "dice_score" in m1
    m2 = pipe.evaluate(dl)
    assert np.isfinite(m2["aggregate_loss"])


def test_dp8_segmentation_step():
    """Segmentation DP step over 8 virtual devices compiles and runs."""
    from vision_conglomerate_tpu.losses import SegmentationLossConfig
    from vision_conglomerate_tpu.models import SegmentationNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainSegmentationPipeline, make_optimizer

    cfg = dict(TINY_MODEL_CONFIG)
    cfg["num_masks"] = 8
    cfg["protos_config"] = {"c_h": 32}
    model = SegmentationNet(num_classes=2, config=cfg, anchors=ANCHORS)
    tx, _ = make_optimizer({"name": "Adam", "lr": 1e-3})
    pipe = TrainSegmentationPipeline(
        model, SegmentationLossConfig(num_classes=2, seg_candidates_per_image=4),
        tx, mesh=make_mesh(8), sample_input_shape=(32, 32, 3))
    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(8, 32, 32, 3)).astype(np.float32)
    labels = np.zeros((8, 4, 5), np.float32)
    labels[:, 0] = [0, 0.5, 0.5, 0.4, 0.4]
    mask = np.zeros((8, 4), bool)
    mask[:, 0] = True
    masks = np.zeros((8, 8, 8), np.uint8)
    masks[:, 2:6, 2:6] = 1

    class L:
        def __len__(self):
            return 1

        def __iter__(self):
            yield imgs, labels, mask, masks

    metrics = pipe.train(L())
    assert np.isfinite(metrics["aggregate_loss"])
