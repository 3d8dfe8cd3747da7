"""Segmentation inference E2E: train briefly, save, run the driver with mask
assembly + overlay; assert outputs."""
import glob
import os

import numpy as np

from tests.test_e2e import ANCHORS, TINY_MODEL_CONFIG, _write_seg_dataset


def test_assemble_instance_masks_box_crop():
    """boxes_xyxy zeroes mask pixels outside each instance's box and leaves
    pixels inside untouched (beyond-reference serve crop)."""
    import jax.numpy as jnp

    from vision_conglomerate_tpu.ops.postprocess import assemble_instance_masks

    # one proto channel that is ON everywhere -> every mask fires everywhere
    protos = jnp.ones((1, 8, 8, 2), jnp.float32) * 10.0
    coefs = jnp.asarray([[[1.0, 0.0], [1.0, 0.0]]], jnp.float32)  # (1, 2, 2)
    full = assemble_instance_masks(protos, coefs)
    assert bool(full.all())

    boxes = jnp.asarray([[[2.0, 3.0, 5.0, 6.0],      # instance 0: interior box
                          [0.0, 0.0, 7.0, 7.0]]])     # instance 1: full frame
    cropped = np.asarray(assemble_instance_masks(protos, coefs, boxes_xyxy=boxes))
    # instance 1 untouched
    assert cropped[0, 1].all()
    # instance 0: exactly the inclusive box region survives
    expect = np.zeros((8, 8), bool)
    expect[3:7, 2:6] = True
    np.testing.assert_array_equal(cropped[0, 0], expect)
    # resize path composes with the crop (boxes in og coords)
    og = np.asarray(assemble_instance_masks(
        protos, coefs, og_size=(16, 16),
        boxes_xyxy=jnp.asarray([[[4.0, 6.0, 10.0, 12.0], [0.0, 0.0, 15.0, 15.0]]])))
    assert og[0, 1].all() and not og[0, 0, 0, 0] and og[0, 0, 8, 8]


def test_segmentation_inference_roundtrip(tmp_path, monkeypatch):
    from vision_conglomerate_tpu.data import DataLoader, SegmentationDataset
    from vision_conglomerate_tpu.infer.runner import run_detection_inference
    from vision_conglomerate_tpu.losses import SegmentationLossConfig
    from vision_conglomerate_tpu.models import SegmentationNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainSegmentationPipeline, make_optimizer

    monkeypatch.chdir(tmp_path)
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
    pipe.best_model_dir = str(tmp_path / "best")
    pipe.save_best_model()
    weights = str(tmp_path / "best" / "SegmentationNet.ckpt.tar")

    config = {
        "model_config": cfg,
        "train_config": {"img_config": {"img_wh": [64, 64], "img_ext": "png"}},
    }
    storage = run_detection_inference(
        path=root, weights_path=weights, config=config, task="segmentation",
        batch_size=2, iou_threshold=0.5, score_threshold=0.0,
        with_summary=True, box_allowance=0, max_detections=8,
        storage_path=str(tmp_path / "out"),
    )
    assert len(glob.glob(os.path.join(storage, "img_*.png"))) == 3
    assert os.path.exists(os.path.join(storage, "output.csv"))
