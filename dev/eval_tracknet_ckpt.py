"""Evaluate a TrackNet checkpoint under the reference eval protocol.

Usage: python dev/eval_tracknet_ckpt.py <ckpt> <config.yaml> [centroid|hough]

Runs the trainer's eval pass (tp/fp/tn/fn per visibility class, 4px
tolerance) with either the on-device centroid decoder or the reference's
cv2.HoughCircles path (/root/reference/pipeline/tracknet_trainer.py:88-124)
on the 30% eval split.
"""
import sys

sys.path.insert(0, ".")

import yaml


def main():
    ckpt, cfg_path = sys.argv[1], sys.argv[2]
    decode = sys.argv[3] if len(sys.argv) > 3 else "hough"
    with open(cfg_path) as f:
        cfg = yaml.safe_load(f)

    from vision_conglomerate_tpu.data import DataLoader, TrackNetDataset
    from vision_conglomerate_tpu.models import TrackNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainTrackNetPipeline, make_optimizer

    tc = cfg["train_config"]
    img_cfg = tc["img_config"]
    train_ds = TrackNetDataset(
        data_path=tc["data_path"], num_stacks=int(img_cfg.get("num_stacks", 3)),
        img_wh=tuple(img_cfg["img_wh"]),
        avg_diameter=int(img_cfg.get("avg_diameter", 5)),
        split_percentage=0.7, seed=42, transfer_dtype="uint8")
    eval_ds = TrackNetDataset(
        labels_df=train_ds.unused_labels_df,
        num_stacks=int(img_cfg.get("num_stacks", 3)),
        img_wh=tuple(img_cfg["img_wh"]),
        avg_diameter=int(img_cfg.get("avg_diameter", 5)),
        transfer_dtype="uint8")
    # wrap-padded tail = one compiled shape; evaluate() masks the padded rows
    eval_dl = DataLoader(eval_ds, 8, shuffle=False, num_workers=2,
                         pad_last="wrap")

    import jax.numpy as jnp

    model = TrackNet(config=cfg["model_config"], dtype=jnp.bfloat16)
    tx, _ = make_optimizer(dict(tc["optimizer_config"]))
    pipe = TrainTrackNetPipeline(
        model, tx, mesh=make_mesh(1), checkpoint_path=ckpt,
        sample_input_shape=(img_cfg["img_wh"][1], img_cfg["img_wh"][0],
                            3 * img_cfg.get("num_stacks", 3)),
        tp_dist_tol=float(tc.get("tp_dist_tol", 4.0)),
        heatmap_threshold=int(tc.get("heatmap_threshold", 128)),
        decode=decode, hough_grad_config=tc.get("hough_grad_config"))
    metrics = pipe.evaluate(eval_dl, verbose=True)
    print({k: round(float(v), 4) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
