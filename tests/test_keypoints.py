"""Keypoint pathway tests: dataset renormalization, head/loss shapes, loss
finiteness with ragged (inf-padded) keypoints, postprocess decode."""
import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from tests.test_e2e import ANCHORS, TINY_MODEL_CONFIG


def _write_kp_dataset(root, n=2, size=64, n_kp=2):
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = (rng.uniform(size=(size, size, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(root, f"img_{i}.png"))
        # cls x y w h + n_kp * (x y v) in image-normalized coords
        with open(os.path.join(root, f"img_{i}.txt"), "w") as f:
            f.write("0 0.5 0.5 0.4 0.4 0.45 0.45 0 0.55 0.55 1\n")


def test_dataset_keypoint_bbox_renormalization(tmp_path):
    from vision_conglomerate_tpu.data import DetectionDataset

    root = str(tmp_path / "kp")
    _write_kp_dataset(root)
    ds = DetectionDataset(root, img_ext="png", img_wh=(64, 64), max_labels=4)
    assert ds.num_keypoints == 2
    _, labels = ds[0]
    # box 0.3..0.7 in both dims; kp (0.45, 0.45) -> (0.375, 0.375) bbox-relative
    kp = labels[0, 5:].reshape(-1, 3)
    np.testing.assert_allclose(kp[0, :2], [0.375, 0.375], atol=1e-5)
    np.testing.assert_allclose(kp[1, :2], [0.625, 0.625], atol=1e-5)
    assert kp[0, 2] == 0 and kp[1, 2] == 1


def test_detection_net_with_keypoints_and_loss(tmp_path):
    from vision_conglomerate_tpu.data import DataLoader, DetectionDataset
    from vision_conglomerate_tpu.losses import DetectionLossConfig
    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainDetectionPipeline, make_optimizer

    root = str(tmp_path / "kp")
    _write_kp_dataset(root)
    ds = DetectionDataset(root, img_ext="png", img_wh=(64, 64), max_labels=4)
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)

    model = DetectionNet(num_classes=1, config=TINY_MODEL_CONFIG,
                         anchors=ANCHORS, num_keypoints=2)
    tx, _ = make_optimizer({"name": "Adam", "lr": 1e-3})
    pipe = TrainDetectionPipeline(
        model, DetectionLossConfig(num_classes=1, num_keypoints=2), tx,
        mesh=make_mesh(1), sample_input_shape=(64, 64, 3))
    metrics = pipe.train(dl)
    assert np.isfinite(metrics["aggregate_loss"])
    assert np.isfinite(metrics["kp_loss"])
    assert np.isfinite(metrics["kpv_loss"]) and np.isfinite(metrics["kpc_loss"])


def test_keypoint_inference_e2e(tmp_path, monkeypatch):
    """Full inference driver with a keypoint model: kp decode + drawing."""
    import glob

    from vision_conglomerate_tpu.data import DataLoader, DetectionDataset
    from vision_conglomerate_tpu.infer.runner import run_detection_inference
    from vision_conglomerate_tpu.losses import DetectionLossConfig
    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainDetectionPipeline, make_optimizer

    monkeypatch.chdir(tmp_path)
    root = str(tmp_path / "kp")
    _write_kp_dataset(root)
    ds = DetectionDataset(root, img_ext="png", img_wh=(64, 64), max_labels=4)
    dl = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1)
    model = DetectionNet(num_classes=1, config=TINY_MODEL_CONFIG,
                         anchors=ANCHORS, num_keypoints=2)
    tx, _ = make_optimizer({"name": "Adam", "lr": 1e-3})
    pipe = TrainDetectionPipeline(
        model, DetectionLossConfig(num_classes=1, num_keypoints=2), tx,
        mesh=make_mesh(1), sample_input_shape=(64, 64, 3))
    pipe.train(dl)
    pipe.best_model_dir = str(tmp_path / "best")
    pipe.save_best_model()

    cfg = dict(TINY_MODEL_CONFIG)
    cfg["num_keypoints"] = 2  # the saved config copy carries this key
    config = {
        "model_config": cfg,
        "train_config": {"img_config": {"img_wh": [64, 64], "img_ext": "png"}},
    }
    storage = run_detection_inference(
        path=root, weights_path=str(tmp_path / "best" / "DetectionNet.ckpt.tar"),
        config=config, task="detection", batch_size=2,
        score_threshold=0.0, box_allowance=0, max_detections=8,
        storage_path=str(tmp_path / "out"))
    assert len(glob.glob(storage + "/img_*.png")) == 2


def test_compute_pck_oracle():
    """Perfect keypoints -> PCK 1; off-by-a-lot -> 0; unmatched GT counts
    its visible keypoints in the strict denominator (VERDICT r2 item #4)."""
    from vision_conglomerate_tpu.tools.map_eval import compute_pck

    # image: 1 pred matches 1 of 2 GTs; GT0 has 2 visible kps (both hit),
    # GT1 (unmatched) has 1 visible kp
    iou = np.asarray([[0.9, 0.0]], np.float32)
    scores = np.asarray([0.8], np.float32)
    pc = np.asarray([0]); gc = np.asarray([0, 0])
    gkp = np.asarray([[[10.0, 10.0, 2], [20.0, 20.0, 2]],
                      [[50.0, 50.0, 2], [0.0, 0.0, 0]]], np.float32)
    pkp = np.asarray([[[10.5, 10.0, 2], [20.0, 19.5, 2]]], np.float32)
    gwh = np.asarray([[30.0, 30.0], [10.0, 10.0]], np.float32)
    res = compute_pck([(iou, scores, pc, gc, pkp, gkp, gwh)], r=0.1)
    assert res["pck"] == pytest.approx(2 / 3)         # 2 correct / 3 visible
    assert res["pck_matched"] == pytest.approx(1.0)   # both matched kps hit
    # same setup but predictions far off -> 0
    pkp_bad = pkp + 25.0
    res = compute_pck([(iou, scores, pc, gc, pkp_bad, gkp, gwh)], r=0.1)
    assert res["pck"] == 0.0


def test_eval_harness_reports_pck(tmp_path):
    """evaluate_pipeline_map on a keypoint model emits pck fields."""
    from vision_conglomerate_tpu.data import DetectionDataset
    from vision_conglomerate_tpu.losses import DetectionLossConfig
    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.tools.eval_harness import evaluate_pipeline_map
    from vision_conglomerate_tpu.train import TrainDetectionPipeline, make_optimizer

    root = str(tmp_path / "kp")
    _write_kp_dataset(root, n=3)
    ds = DetectionDataset(root, img_ext="png", img_wh=(64, 64), max_labels=4)
    model = DetectionNet(num_classes=1, config=TINY_MODEL_CONFIG,
                         anchors=ANCHORS, num_keypoints=2)
    tx, _ = make_optimizer({"name": "Adam", "lr": 1e-3})
    pipe = TrainDetectionPipeline(
        model, DetectionLossConfig(num_classes=1, num_keypoints=2), tx,
        mesh=make_mesh(1), sample_input_shape=(64, 64, 3))
    res = evaluate_pipeline_map(pipe, ds, batch_size=3)
    assert "pck" in res and 0.0 <= res["pck"] <= 1.0
    assert res["num_visible_keypoints"] == 3  # 1 visible kp (v=1) per image
    assert res["pck_radius"] == 0.1


def test_keypoint_inference_decode():
    """Inference decode maps bbox-relative keypoints to pixels; postprocess
    emits (x, y, argmax-vis)."""
    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.ops.postprocess import postprocess_detections

    model = DetectionNet(num_classes=1, config=TINY_MODEL_CONFIG,
                         anchors=ANCHORS, num_keypoints=2)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    preds = model.apply(variables, x, train=False, inference=True)
    d = 1 + 1 + 4 + 2 * 5
    assert preds.shape[-1] == d
    post = postprocess_detections(
        preds, num_classes=1, num_keypoints=2,
        score_threshold=-1.0, max_detections=5, pre_nms_topk=64)
    assert post.keypoints.shape == (1, 5, 2, 3)
    vis = np.asarray(post.keypoints[..., 2])
    assert ((vis >= 0) & (vis <= 2)).all()
