"""CLI glue smoke test: train_det.run end-to-end on a synthetic dataset —
auto-anchors, class weights, model build from YAML config, epoch loop,
best-model/checkpoint saves, metrics CSV."""
import argparse
import os
import sys

import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.test_e2e import _write_detection_dataset  # noqa: E402


def test_train_det_run(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _write_detection_dataset(str(tmp_path / "data/detection/train"), n=4, size=64)
    _write_detection_dataset(str(tmp_path / "data/detection/valid"), n=2, size=64)

    config = {
        "model_config": {
            "train_anchors": True,
            "backbone": "CSPBackBone",
            "neck": "RepBiPAN",
            "head": "EffiDecHead",
            "cspbackbone_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
            "repbipan_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
            "effidechead_config": {"width_multiple": 0.5},
        },
        "auto_anchors_config": {
            "threshold": 4.0, "score_tol": 0.8, "bpr_tol": 1.0,
            "num_generations": 3, "kmeans_iter": 5,
            "mut_proba": 0.9, "sigma": 0.1, "update_anchors_cfg": True,
        },
        "train_config": {
            "data_path": "data/detection",
            "dataloader_config": {"shuffle": True, "num_workers": 2, "max_labels": 8},
            "img_config": {"img_ext": "png", "img_wh": [64, 64]},
            "loss_config": {"box_w": 0.1, "class_w": 0.3, "conf_w": 1.0,
                            "label_smoothing": 0.001},
            "optimizer_config": {"name": "Adam", "lr": 1e-3},
            "lr_scheduler_config": {"name": "CosineAnnealingWarmRestarts",
                                    "T_0": 10, "T_mult": 1, "eta_min": 1e-6},
        },
    }
    anchors = {"anchors": {
        "sm": [[0.08, 0.1], [0.1, 0.1], [0.12, 0.12]],
        "md": [[0.15, 0.18], [0.2, 0.2], [0.22, 0.25]],
        "lg": [[0.3, 0.3], [0.35, 0.3], [0.4, 0.4]],
    }}
    config_path = str(tmp_path / "config.yaml")
    anchors_path = str(tmp_path / "anchors.yaml")
    with open(config_path, "w") as f:
        yaml.safe_dump(config, f)
    with open(anchors_path, "w") as f:
        yaml.safe_dump(anchors, f)

    import train_det

    args = argparse.Namespace(
        batch_size=4, epochs=1, checkpoint_interval=1, eval_interval=1,
        no_verbose=True, lr_schedule=True, lr_schedule_interval=1,
        use_ddp=False, checkpoint_path="", profile_dir="")
    train_det.run(args, config, config_path, anchors_path)

    assert os.path.exists("metrics/detection/train_metrics.csv")
    assert os.path.exists("metrics/detection/eval_metrics.csv")
    best = "saved_model/detection/best_model/DetectionNet.ckpt.tar"
    assert os.path.exists(best)
    # config copy with num_keypoints injected saved beside the best model
    cfg_copy = "saved_model/detection/best_model/config/config.yaml"
    assert os.path.exists(cfg_copy)
    with open(cfg_copy) as f:
        saved_cfg = yaml.safe_load(f)
    assert "num_keypoints" in saved_cfg["model_config"]
    import glob
    assert glob.glob("saved_model/detection/checkpoints/*/*.ckpt.tar")
