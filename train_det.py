"""Detection training CLI.

Drop-in equivalent of the reference's train_det.py (same flags:
--batch_size --epochs --checkpoint_interval --eval_interval --no_verbose
--lr_schedule --lr_schedule_interval --use_ddp; reference train_det.py:178-209)
re-designed for TPU: instead of torchrun process-per-GPU, the script runs one
process per host and data-parallelism is a jax.sharding Mesh over the local
(or slice) devices; `--use_ddp` maps to "shard over all visible devices"
(the mesh is built either way — with one device it is a 1-mesh). Anchors and
class weights are computed once on host process 0 and enter the program as
replicated constants (the shard_map equivalent of NCCL broadcast,
reference train_det.py:109-134).
"""
import argparse
import logging
import os

import numpy as np

LOG_FORMAT = "%(asctime)s %(levelname)s %(filename)s: %(message)s"
LOG_DATE_FORMAT = "%Y-%m-%d %H:%M:%S"
logger = logging.getLogger(__name__)


def make_dataset(config, subdir: str):
    from vision_conglomerate_tpu.data import DetectionDataset

    tc = config["train_config"]
    dl_cfg = tc.get("dataloader_config", {}) or {}
    return DetectionDataset(
        os.path.join(tc["data_path"], subdir),
        img_ext=tc["img_config"]["img_ext"],
        img_wh=tuple(tc["img_config"]["img_wh"]),
        max_labels=int(dl_cfg.get("max_labels", 64) or 64),
        decode_backend=dl_cfg.get("decode_backend", "pil"),
    )


def make_dataloader(dataset, batch_size, config, shuffle=None, seed=42):
    from vision_conglomerate_tpu.data import DataLoader

    dl_cfg = dict(config["train_config"].get("dataloader_config", {}) or {})
    if shuffle is None:
        shuffle = bool(dl_cfg.get("shuffle", True))
    return DataLoader(
        dataset, batch_size=batch_size, shuffle=shuffle,
        num_workers=int(dl_cfg.get("num_workers", 8) or 8),
        pad_last="wrap", seed=seed,
    )


def run(args, config, config_path, anchors_path):
    import jax
    import jax.numpy as jnp

    from vision_conglomerate_tpu.losses import DetectionLossConfig
    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.parallel import (
        make_mesh, maybe_initialize_distributed, process_is_primary)

    maybe_initialize_distributed()
    from vision_conglomerate_tpu.tools import generate_anchors_and_class_weights
    from vision_conglomerate_tpu.train import (
        TrainDetectionPipeline, make_lr_scheduler, make_optimizer)
    from vision_conglomerate_tpu.utils import load_yaml

    tc = config["train_config"]
    train_ds = make_dataset(config, "train")
    eval_ds = make_dataset(config, "valid")
    train_dl = make_dataloader(train_ds, args.batch_size, config)
    eval_dl = make_dataloader(eval_ds, args.batch_size, config, shuffle=False)

    # anchors + class weights: computed once on host (process 0 semantics);
    # they become replicated constants for every shard.
    predefined = load_yaml(anchors_path)["anchors"]
    anchors_arr, class_weights = generate_anchors_and_class_weights(
        os.path.join(tc["data_path"], "train"),
        predefined,
        anchors_path=anchors_path,
        verbose=not args.no_verbose,
        **{k: v for k, v in config.get("auto_anchors_config", {}).items()
           if k not in ("update_anchors_cfg",)},
        update_anchors_cfg=config.get("auto_anchors_config", {}).get("update_anchors_cfg", True),
    )
    anchors = {
        "sm": anchors_arr[0].tolist(),
        "md": anchors_arr[1].tolist(),
        "lg": anchors_arr[2].tolist(),
    }
    num_classes = int(class_weights.shape[0])
    num_keypoints = train_ds.num_keypoints or None

    mesh = make_mesh() if args.use_ddp else make_mesh(1)
    n_devices = mesh.devices.size

    from vision_conglomerate_tpu.train import resolve_remat_default
    resolve_remat_default(config["model_config"], args.batch_size)
    dtype = jnp.bfloat16 if config["model_config"].get("dtype") == "bfloat16" else jnp.float32
    model = DetectionNet(
        num_classes=num_classes,
        config=config["model_config"],
        anchors=anchors,
        num_keypoints=num_keypoints,
        dtype=dtype,
    )

    loss_cfg_kwargs = dict(tc.get("loss_config", {}) or {})
    loss_cfg_kwargs.pop("class_weights", None)
    if "scale_w" in loss_cfg_kwargs and loss_cfg_kwargs["scale_w"] is not None:
        loss_cfg_kwargs["scale_w"] = tuple(loss_cfg_kwargs["scale_w"])
    loss_cfg = DetectionLossConfig(
        num_classes=num_classes, num_keypoints=num_keypoints or 0, **loss_cfg_kwargs)

    opt_cfg = dict(tc["optimizer_config"])
    # --lr overrides the config base lr (beyond-reference flag: the
    # reference only scales lr by device count, never by batch size —
    # /root/reference/train_det.py:52 — so large-batch runs need a manual
    # override; see docs/PERF.md large-batch guidance)
    if getattr(args, "lr", None):
        opt_cfg["lr"] = float(args.lr)
    # reference scales lr by device count (train_det.py:52)
    opt_cfg["lr"] = float(opt_cfg.get("lr", 1e-3)) * n_devices
    # train_anchors=False freezes anchors exactly like the reference's
    # requires_grad gate (/root/reference/modules/detection.py:36-38)
    tx, base_lr = make_optimizer(
        opt_cfg, train_anchors=bool(config["model_config"].get("train_anchors", True)))
    scheduler = (make_lr_scheduler(tc.get("lr_scheduler_config"), base_lr)
                 if args.lr_schedule else None)

    img_wh = tuple(tc["img_config"]["img_wh"])
    aug_cfg = tc.get("augment_config", {}) or {}
    pipeline = TrainDetectionPipeline(
        model, loss_cfg, tx,
        lr_scheduler=scheduler,
        lr_schedule_interval=args.lr_schedule_interval,
        checkpoint_path=args.checkpoint_path or None,
        mesh=mesh,
        config_path=config_path,
        sample_input_shape=(img_wh[1], img_wh[0], 3),
        hflip_prob=float(aug_cfg.get("hflip_prob", 0.0) or 0.0),
    )

    from vision_conglomerate_tpu.utils.profiling import trace

    # seeded from restored history so --checkpoint_path resumes keep the
    # best-model-so-far semantics (base.py best_eval_loss)
    best_loss = pipeline.best_eval_loss()
    verbose = not args.no_verbose
    for epoch in range(pipeline.last_epoch, args.epochs):
        logger.info(f"epoch {epoch + 1}/{args.epochs}")
        # profile only the first trained epoch (trace files are large)
        with trace(args.profile_dir if epoch == pipeline.last_epoch else None):
            pipeline.train(train_dl, verbose=verbose)
        if ((epoch + 1) % args.eval_interval == 0) or (epoch + 1 == args.epochs):
            metrics = pipeline.evaluate(eval_dl, verbose=verbose)
            if getattr(args, "map_eval", False):
                from vision_conglomerate_tpu.tools.eval_harness import (
                    evaluate_pipeline_map)
                map_res = evaluate_pipeline_map(
                    pipeline, eval_ds, batch_size=args.batch_size)
                extra = {"map50": float(map_res["map"])}
                if "pck" in map_res:  # keypoint models: PCK@r per eval epoch
                    extra["pck"] = float(map_res["pck"])
                pipeline.annotate_last("eval", extra)
                if verbose:
                    logger.info(f"mAP@50: {map_res['map']:.4f}"
                                + (f"  PCK@0.1: {map_res['pck']:.4f}"
                                   if "pck" in map_res else ""))
            if metrics["aggregate_loss"] < best_loss:
                best_loss = metrics["aggregate_loss"]
                pipeline.save_best_model()
            # persist metric CSVs every eval epoch so a killed run keeps its
            # history (plots stay end-of-run; CSV writes are tiny)
            pipeline.metrics_to_csv()
        if ((epoch + 1) % args.checkpoint_interval == 0) or (epoch + 1 == args.epochs):
            pipeline.save_checkpoint()
    pipeline.metrics_to_csv()
    pipeline.save_metrics_plots()


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, format=LOG_FORMAT, datefmt=LOG_DATE_FORMAT)
    parser = argparse.ArgumentParser(description="Detection Training")
    parser.add_argument("--batch_size", type=int, default=16, metavar="", help="Training batch size")
    parser.add_argument("--epochs", type=int, default=100, metavar="", help="Number of training epochs")
    parser.add_argument("--checkpoint_interval", type=int, default=10, metavar="", help="Number of epochs before persisting checkpoint to disk")
    parser.add_argument("--eval_interval", type=int, default=1, metavar="", help="Number of epochs before each evaluation")
    parser.add_argument("--no_verbose", action="store_true", help="Reduce training output verbosity")
    parser.add_argument("--lr_schedule", action="store_true", help="Use learning rate scheduler")
    parser.add_argument("--lr_schedule_interval", type=int, default=1, metavar="", help="Number of epochs before lr scheduling")
    parser.add_argument("--use_ddp", action="store_true", help="Shard training over all visible devices (data parallel)")
    parser.add_argument("--checkpoint_path", type=str, default="", metavar="", help="Resume from this checkpoint")
    parser.add_argument("--config_path", type=str, default="configs/detection/config.yaml", metavar="", help="Config YAML path")
    parser.add_argument("--anchors_path", type=str, default="configs/detection/anchors.yaml", metavar="", help="Anchors YAML path")
    parser.add_argument("--profile_dir", type=str, default="", metavar="", help="Write a jax.profiler trace of the first epoch here")
    parser.add_argument("--map_eval", action="store_true", help="Compute mAP@50 on the val set at each eval interval (recorded in eval metrics)")
    parser.add_argument("--lr", type=float, default=0.0, metavar="", help="Override optimizer_config.lr (still scaled by device count); 0 = use config")
    args = parser.parse_args()

    np.random.seed(42)

    from vision_conglomerate_tpu.utils import load_yaml

    config = load_yaml(args.config_path)
    run(args, config, args.config_path, args.anchors_path)
