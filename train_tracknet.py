"""TrackNet training CLI (reference train_tracknet.py flag surface:
train_det.py flags + --steps_per_epoch). The 70/30 split handoff uses the
dataset's unused_labels_df exactly as the reference does
(train_tracknet.py:20-23)."""
import argparse
import logging

import numpy as np

LOG_FORMAT = "%(asctime)s %(levelname)s %(filename)s: %(message)s"
LOG_DATE_FORMAT = "%Y-%m-%d %H:%M:%S"
logger = logging.getLogger(__name__)


def run(args, config, config_path):
    import jax.numpy as jnp

    from vision_conglomerate_tpu.data import DataLoader, TrackNetDataset
    from vision_conglomerate_tpu.models import TrackNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import (
        TrainTrackNetPipeline, make_lr_scheduler, make_optimizer)

    tc = config["train_config"]
    img_cfg = tc["img_config"]
    train_ds = TrackNetDataset(
        data_path=tc["data_path"],
        num_stacks=int(img_cfg.get("num_stacks", 3)),
        img_wh=tuple(img_cfg["img_wh"]),
        avg_diameter=int(img_cfg.get("avg_diameter", 5)),
        split_percentage=0.7,
        seed=42,
        cache=args.cache_data,
        transfer_dtype="uint8",  # /255 happens in-jit (4x less H2D)
    )
    eval_ds = TrackNetDataset(
        labels_df=train_ds.unused_labels_df,
        num_stacks=int(img_cfg.get("num_stacks", 3)),
        img_wh=tuple(img_cfg["img_wh"]),
        avg_diameter=int(img_cfg.get("avg_diameter", 5)),
        cache=args.cache_data,
        transfer_dtype="uint8",
    )
    dl_cfg = dict(tc.get("dataloader_config", {}) or {})
    train_dl = DataLoader(train_ds, args.batch_size, shuffle=bool(dl_cfg.get("shuffle", True)),
                          num_workers=int(dl_cfg.get("num_workers", 8) or 8), drop_last=True)
    # eval must score every window exactly once (reference torch DataLoader
    # drop_last=False); pad_last="wrap" keeps a SINGLE compiled eval shape
    # (one 2-10 min tunnel compile instead of two) and evaluate() masks the
    # wrapped tail rows so each window still scores exactly once
    eval_dl = DataLoader(eval_ds, args.batch_size, shuffle=False, pad_last="wrap",
                         num_workers=int(dl_cfg.get("num_workers", 8) or 8))

    mesh = make_mesh() if args.use_ddp else make_mesh(1)
    n_devices = mesh.devices.size

    from vision_conglomerate_tpu.train import resolve_remat_default
    resolve_remat_default(config["model_config"], args.batch_size)
    dtype = jnp.bfloat16 if config["model_config"].get("dtype") == "bfloat16" else jnp.float32
    num_stacks = int(img_cfg.get("num_stacks", 3))
    model = TrackNet(config=config["model_config"], dtype=dtype)

    opt_cfg = dict(tc["optimizer_config"])
    if getattr(args, "lr", None):  # --lr override (see train_det.py)
        opt_cfg["lr"] = float(args.lr)
    opt_cfg["lr"] = float(opt_cfg.get("lr", 1.0)) * n_devices
    tx, base_lr = make_optimizer(opt_cfg)
    scheduler = (make_lr_scheduler(tc.get("lr_scheduler_config"), base_lr)
                 if args.lr_schedule else None)

    img_wh = tuple(img_cfg["img_wh"])
    pipeline = TrainTrackNetPipeline(
        model, tx,
        lr_scheduler=scheduler,
        lr_schedule_interval=args.lr_schedule_interval,
        checkpoint_path=args.checkpoint_path or None,
        mesh=mesh,
        config_path=config_path,
        sample_input_shape=(img_wh[1], img_wh[0], 3 * num_stacks),
        tp_dist_tol=float(tc.get("tp_dist_tol", 4.0)),
        heatmap_threshold=int(tc.get("heatmap_threshold", 128)),
        decode=tc.get("heatmap_decode", "centroid"),
        hough_grad_config=tc.get("hough_grad_config", {}),
    )

    best_loss = pipeline.best_eval_loss("loss")  # resume-safe (base.py)
    verbose = not args.no_verbose
    for epoch in range(pipeline.last_epoch, args.epochs):
        logger.info(f"epoch {epoch + 1}/{args.epochs}")
        pipeline.train(train_dl, verbose=verbose, steps_per_epoch=args.steps_per_epoch)
        if ((epoch + 1) % args.eval_interval == 0) or (epoch + 1 == args.epochs):
            metrics = pipeline.evaluate(eval_dl, verbose=verbose)
            if metrics["loss"] < best_loss:
                best_loss = metrics["loss"]
                pipeline.save_best_model()
            # persist metric CSVs every eval epoch so a killed run keeps its history
            pipeline.metrics_to_csv()
        if ((epoch + 1) % args.checkpoint_interval == 0) or (epoch + 1 == args.epochs):
            pipeline.save_checkpoint()
    pipeline.metrics_to_csv()
    pipeline.save_metrics_plots()


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, format=LOG_FORMAT, datefmt=LOG_DATE_FORMAT)
    parser = argparse.ArgumentParser(description="TrackNet Training")
    parser.add_argument("--batch_size", type=int, default=16, metavar="", help="Training batch size")
    parser.add_argument("--epochs", type=int, default=100, metavar="", help="Number of training epochs")
    parser.add_argument("--steps_per_epoch", type=int, default=None, metavar="", help="Max steps per epoch")
    parser.add_argument("--checkpoint_interval", type=int, default=10, metavar="", help="Number of epochs before persisting checkpoint to disk")
    parser.add_argument("--eval_interval", type=int, default=1, metavar="", help="Number of epochs before each evaluation")
    parser.add_argument("--no_verbose", action="store_true", help="Reduce training output verbosity")
    parser.add_argument("--lr_schedule", action="store_true", help="Use learning rate scheduler")
    parser.add_argument("--lr_schedule_interval", type=int, default=1, metavar="", help="Number of epochs before lr scheduling")
    parser.add_argument("--use_ddp", action="store_true", help="Shard training over all visible devices (data parallel)")
    parser.add_argument("--checkpoint_path", type=str, default="", metavar="", help="Resume from this checkpoint")
    parser.add_argument("--config_path", type=str, default="configs/tracknet/config.yaml", metavar="", help="Config YAML path")
    parser.add_argument("--lr", type=float, default=0.0, metavar="", help="Override optimizer_config.lr (still scaled by device count); 0 = use config")
    parser.add_argument("--cache_data", action="store_true",
                        help="Cache decoded frame windows in host RAM after the first epoch "
                             "(samples are deterministic; removes repeated decode cost on small clip datasets)")
    args = parser.parse_args()

    np.random.seed(42)

    from vision_conglomerate_tpu.utils import load_yaml

    config = load_yaml(args.config_path)
    run(args, config, args.config_path)
