"""Segmentation training CLI (same flag surface as the reference's
train_seg.py; reference train_seg.py mirrors train_det.py with polygon
labels, overlap masks and the SegmentationLoss)."""
import argparse
import logging
import os

import numpy as np

LOG_FORMAT = "%(asctime)s %(levelname)s %(filename)s: %(message)s"
LOG_DATE_FORMAT = "%Y-%m-%d %H:%M:%S"
logger = logging.getLogger(__name__)


def make_dataset(config, subdir: str):
    from vision_conglomerate_tpu.data import SegmentationDataset

    tc = config["train_config"]
    img_wh = tuple(tc["img_config"]["img_wh"])
    # reference-format configs put overlap_masks at train_config level
    # (/root/reference/train_seg.py:75, config/segmentation/config.yaml:62);
    # ours ships it in loss_config. train_config wins when both are present.
    overlap = bool(tc.get(
        "overlap_masks",
        (tc.get("loss_config", {}) or {}).get("overlap_masks", True)))
    # reference img_config.mask_scale_factor picks the mask raster resolution
    # (dataset/segmentation_dataset.py:20-47). When unset, store at proto
    # resolution (input/4) to bound H2D traffic — the loss nearest-resizes to
    # proto resolution anyway, so supervision is unchanged.
    msf = (tc.get("img_config", {}) or {}).get("mask_scale_factor")
    mask_kwargs = ({"mask_scale_factor": float(msf)} if msf is not None
                   else {"mask_store_wh": (img_wh[0] // 4, img_wh[1] // 4)})
    dl_cfg = tc.get("dataloader_config", {}) or {}
    return SegmentationDataset(
        os.path.join(tc["data_path"], subdir),
        img_ext=tc["img_config"]["img_ext"],
        img_wh=img_wh,
        max_labels=int(dl_cfg.get("max_labels", 64) or 64),
        overlap_masks=overlap,
        decode_backend=dl_cfg.get("decode_backend", "pil"),
        **mask_kwargs,
    )


def run(args, config, config_path, anchors_path):
    import jax.numpy as jnp

    from vision_conglomerate_tpu.losses import SegmentationLossConfig
    from vision_conglomerate_tpu.models import SegmentationNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.tools import generate_anchors_and_class_weights
    from vision_conglomerate_tpu.train import (
        TrainSegmentationPipeline, make_lr_scheduler, make_optimizer)
    from vision_conglomerate_tpu.utils import load_yaml
    from train_det import make_dataloader

    tc = config["train_config"]
    train_ds = make_dataset(config, "train")
    eval_ds = make_dataset(config, "valid")
    train_dl = make_dataloader(train_ds, args.batch_size, config)
    eval_dl = make_dataloader(eval_ds, args.batch_size, config, shuffle=False)

    predefined = load_yaml(anchors_path)["anchors"]
    anchors_arr, class_weights = generate_anchors_and_class_weights(
        os.path.join(tc["data_path"], "train"),
        predefined,
        anchors_path=anchors_path,
        verbose=not args.no_verbose,
        from_polygons=True,
        **{k: v for k, v in config.get("auto_anchors_config", {}).items()},
    )
    anchors = {
        "sm": anchors_arr[0].tolist(),
        "md": anchors_arr[1].tolist(),
        "lg": anchors_arr[2].tolist(),
    }
    num_classes = int(class_weights.shape[0])

    mesh = make_mesh() if args.use_ddp else make_mesh(1)
    n_devices = mesh.devices.size

    from vision_conglomerate_tpu.train import resolve_remat_default
    resolve_remat_default(config["model_config"], args.batch_size)
    dtype = jnp.bfloat16 if config["model_config"].get("dtype") == "bfloat16" else jnp.float32
    model = SegmentationNet(
        num_classes=num_classes,
        config=config["model_config"],
        anchors=anchors,
        dtype=dtype,
    )

    loss_cfg_kwargs = dict(tc.get("loss_config", {}) or {})
    loss_cfg_kwargs.pop("class_weights", None)
    if "overlap_masks" in tc:  # reference key location overrides loss_config
        loss_cfg_kwargs["overlap_masks"] = bool(tc["overlap_masks"])
    if loss_cfg_kwargs.get("scale_w") is not None:
        loss_cfg_kwargs["scale_w"] = tuple(loss_cfg_kwargs["scale_w"])
    loss_cfg = SegmentationLossConfig(num_classes=num_classes, **loss_cfg_kwargs)

    opt_cfg = dict(tc["optimizer_config"])
    if getattr(args, "lr", None):  # --lr override (see train_det.py)
        opt_cfg["lr"] = float(args.lr)
    opt_cfg["lr"] = float(opt_cfg.get("lr", 1e-3)) * n_devices
    # train_anchors=False freezes anchors exactly like the reference's
    # requires_grad gate (/root/reference/modules/detection.py:36-38)
    tx, base_lr = make_optimizer(
        opt_cfg, train_anchors=bool(config["model_config"].get("train_anchors", True)))
    scheduler = (make_lr_scheduler(tc.get("lr_scheduler_config"), base_lr)
                 if args.lr_schedule else None)

    img_wh = tuple(tc["img_config"]["img_wh"])
    pipeline = TrainSegmentationPipeline(
        model, loss_cfg, tx,
        lr_scheduler=scheduler,
        lr_schedule_interval=args.lr_schedule_interval,
        checkpoint_path=args.checkpoint_path or None,
        mesh=mesh,
        config_path=config_path,
        sample_input_shape=(img_wh[1], img_wh[0], 3),
    )

    best_loss = pipeline.best_eval_loss()  # resume-safe (base.py)
    verbose = not args.no_verbose
    for epoch in range(pipeline.last_epoch, args.epochs):
        logger.info(f"epoch {epoch + 1}/{args.epochs}")
        pipeline.train(train_dl, verbose=verbose)
        if ((epoch + 1) % args.eval_interval == 0) or (epoch + 1 == args.epochs):
            metrics = pipeline.evaluate(eval_dl, verbose=verbose)
            if metrics["aggregate_loss"] < best_loss:
                best_loss = metrics["aggregate_loss"]
                pipeline.save_best_model()
            # persist metric CSVs every eval epoch so a killed run keeps its history
            pipeline.metrics_to_csv()
        if ((epoch + 1) % args.checkpoint_interval == 0) or (epoch + 1 == args.epochs):
            pipeline.save_checkpoint()
    pipeline.metrics_to_csv()
    pipeline.save_metrics_plots()


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, format=LOG_FORMAT, datefmt=LOG_DATE_FORMAT)
    parser = argparse.ArgumentParser(description="Segmentation Training")
    parser.add_argument("--batch_size", type=int, default=16, metavar="", help="Training batch size")
    parser.add_argument("--epochs", type=int, default=100, metavar="", help="Number of training epochs")
    parser.add_argument("--checkpoint_interval", type=int, default=10, metavar="", help="Number of epochs before persisting checkpoint to disk")
    parser.add_argument("--eval_interval", type=int, default=1, metavar="", help="Number of epochs before each evaluation")
    parser.add_argument("--no_verbose", action="store_true", help="Reduce training output verbosity")
    parser.add_argument("--lr_schedule", action="store_true", help="Use learning rate scheduler")
    parser.add_argument("--lr_schedule_interval", type=int, default=1, metavar="", help="Number of epochs before lr scheduling")
    parser.add_argument("--use_ddp", action="store_true", help="Shard training over all visible devices (data parallel)")
    parser.add_argument("--checkpoint_path", type=str, default="", metavar="", help="Resume from this checkpoint")
    parser.add_argument("--config_path", type=str, default="configs/segmentation/config.yaml", metavar="", help="Config YAML path")
    parser.add_argument("--anchors_path", type=str, default="configs/segmentation/anchors.yaml", metavar="", help="Anchors YAML path")
    parser.add_argument("--lr", type=float, default=0.0, metavar="", help="Override optimizer_config.lr (still scaled by device count); 0 = use config")
    args = parser.parse_args()

    np.random.seed(42)

    from vision_conglomerate_tpu.utils import load_yaml

    config = load_yaml(args.config_path)
    run(args, config, args.config_path, args.anchors_path)
