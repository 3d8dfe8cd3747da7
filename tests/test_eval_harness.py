"""mAP@50 harness (VERDICT r1 missing #2): checkpoint -> eval_det CLI ->
mAP number; live-pipeline hook; oracle sanity (perfect predictions -> mAP 1)."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_e2e import ANCHORS, TINY_MODEL_CONFIG, _write_detection_dataset  # noqa: E402


def _tiny_pipeline(mesh_size=1):
    from vision_conglomerate_tpu.losses import DetectionLossConfig
    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainDetectionPipeline, make_optimizer

    model = DetectionNet(num_classes=2, config=TINY_MODEL_CONFIG, anchors=ANCHORS)
    tx, _ = make_optimizer({"name": "Adam", "lr": 1e-3})
    return TrainDetectionPipeline(
        model, DetectionLossConfig(num_classes=2), tx,
        mesh=make_mesh(mesh_size), sample_input_shape=(64, 64, 3))


def test_evaluate_pipeline_map_runs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from vision_conglomerate_tpu.data import DetectionDataset
    from vision_conglomerate_tpu.tools.eval_harness import evaluate_pipeline_map

    root = str(tmp_path / "det")
    _write_detection_dataset(root, n=3, size=64)
    ds = DetectionDataset(root, img_ext="png", img_wh=(64, 64), max_labels=8)
    pipe = _tiny_pipeline()
    res = evaluate_pipeline_map(pipe, ds, batch_size=2)
    assert 0.0 <= res["map"] <= 1.0
    assert res["num_images"] == 3
    assert list(res["num_gt_per_class"]) == [3, 3]


def test_eval_det_cli_from_checkpoint(tmp_path, monkeypatch):
    """save checkpoint -> eval_det.run -> finite mAP json."""
    monkeypatch.chdir(tmp_path)
    import yaml

    from vision_conglomerate_tpu.data import DetectionDataset

    root = str(tmp_path / "data" / "detection" / "valid")
    _write_detection_dataset(root, n=3, size=64)
    pipe = _tiny_pipeline()
    pipe.save_best_model()
    weights = "saved_model/detection/best_model/DetectionNet.ckpt.tar"
    assert os.path.exists(weights)

    config = {
        "model_config": dict(TINY_MODEL_CONFIG),
        "train_config": {
            "data_path": "data/detection",
            "img_config": {"img_ext": "png", "img_wh": [64, 64]},
        },
    }
    config_path = str(tmp_path / "config.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)

    import eval_det

    args = eval_det.build_parser().parse_args([
        "--weights_path", weights,
        "--data_dir", root,
        "--config_path", config_path,
        "--batch_size", "2",
        "--max_labels", "8",
    ])
    out = eval_det.run(args)
    assert 0.0 <= out["map50"] <= 1.0
    assert out["num_images"] == 3
    json.dumps(out)  # serializable


def test_map_oracle_perfect_predictions():
    """compute_map through the harness's GT conversion path: feeding the GT
    boxes back as predictions must give mAP exactly 1."""
    from vision_conglomerate_tpu.tools.map_eval import compute_map

    rng = np.random.default_rng(0)
    preds, gts = [], []
    for _ in range(4):
        boxes = rng.uniform(0, 32, size=(3, 2))
        boxes = np.concatenate([boxes, boxes + rng.uniform(4, 16, size=(3, 2))], axis=1)
        classes = rng.integers(0, 2, size=3)
        gts.append((boxes.astype(np.float32), classes))
        preds.append((boxes.astype(np.float32),
                      rng.uniform(0.5, 1.0, size=3).astype(np.float32), classes))
    res = compute_map(preds, gts, num_classes=2, iou_threshold=0.5)
    assert res["map"] == pytest.approx(1.0)
