"""TrackNet accuracy evaluation CLI: checkpoint -> official-protocol f1.

One JSON line, the same one-command accuracy surface as eval_det.py /
eval_seg.py (all three workload families share it). Scores the reference
eval protocol (/root/reference/pipeline/tracknet_trainer.py:82-170):
heatmap -> single-circle decode, tp/fp/tn/fn per visibility class at a px
tolerance (default 4), precision/recall/f1, over the 30% eval split of the
clips under train_config.data_path (the trainer's own 70/30 seed-42
handoff, so the numbers match the per-epoch eval CSV).

Forms:
- default: train-form forward (params + running BN stats) — the exact
  protocol behind the BASELINE.md TrackNet numbers (historically
  dev/eval_tracknet_ckpt.py);
- --deploy: serve form (conv-BN folded; RepVGG fused where the advanced
  arch is canonical) — what inference_tracknet.py actually runs;
- --quantize int8: PTQ calibrated on the first eval batch (implies
  --deploy), same protocol as inference_tracknet.py --quantize int8.

Decode backends: --decode centroid (on-device, default) | hough
(cv2.HoughCircles parity path, reference tracknet_trainer.py:88-124).

Usage:
    python eval_tracknet.py --weights_path saved_model/tracknet/best_model/TrackNet.ckpt.tar \
        [--config_path .../config.yaml] [--decode centroid|hough] [--quantize int8]
"""
import argparse
import json
import logging
import os
from pathlib import Path

LOG_FORMAT = "%(asctime)s %(levelname)s %(filename)s: %(message)s"
LOG_DATE_FORMAT = "%Y-%m-%d %H:%M:%S"
logger = logging.getLogger(__name__)


def _deploy_eval_forward(weights_path, model_config, heatmap_threshold,
                         quantize, calib_frames):
    """Serve-form (state-independent) eval forward with the trainer's
    (state, frames, heatmaps) -> (loss, pred_hm, cx, cy, found) contract."""
    import jax
    import jax.numpy as jnp

    from vision_conglomerate_tpu.infer.runner import quantize_model_int8
    from vision_conglomerate_tpu.infer.tracknet_runner import load_tracknet_model
    from vision_conglomerate_tpu.losses.focal import softmax_cross_entropy
    from vision_conglomerate_tpu.nn.blocks import bn_folding
    from vision_conglomerate_tpu.nn.quantize import int8_serving
    from vision_conglomerate_tpu.ops.heatmap import decode_heatmap_peaks
    from vision_conglomerate_tpu.ops.preprocess import normalize_images

    model, variables, folded = load_tracknet_model(
        weights_path, model_config, use_reparam=True)
    int8 = quantize == "int8"
    if int8:
        calib = normalize_images(jnp.asarray(calib_frames))
        variables = quantize_model_int8(model, variables, calib)

    @jax.jit
    def fwd(_state, frames, heatmaps):
        if frames.dtype == jnp.uint8:
            frames = normalize_images(frames)
        with bn_folding(folded), int8_serving(int8):
            logits = model.apply(variables, frames, train=False)
        loss = softmax_cross_entropy(
            logits.astype(jnp.float32),
            heatmaps.astype(jnp.int32)).mean(axis=(1, 2))
        pred_hm = jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        cx, cy, _r, found = decode_heatmap_peaks(
            pred_hm, threshold=heatmap_threshold)
        return loss, pred_hm, cx, cy, found

    return fwd


def run(args) -> dict:
    from vision_conglomerate_tpu.data import DataLoader, TrackNetDataset
    from vision_conglomerate_tpu.models import TrackNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainTrackNetPipeline, make_optimizer
    from vision_conglomerate_tpu.utils import load_yaml

    import jax.numpy as jnp

    config_path = args.config_path or os.path.join(
        Path(args.weights_path).parent.resolve(), "config", "config.yaml")
    cfg = load_yaml(config_path)
    tc = cfg["train_config"]
    img_cfg = tc["img_config"]
    num_stacks = int(img_cfg.get("num_stacks", 3))
    data_path = args.data_path or tc["data_path"]

    # the trainer's own 70/30 handoff: eval = windows the train split left
    train_ds = TrackNetDataset(
        data_path=data_path, num_stacks=num_stacks,
        img_wh=tuple(img_cfg["img_wh"]),
        avg_diameter=int(img_cfg.get("avg_diameter", 5)),
        split_percentage=float(tc.get("split_percentage", 0.7)),
        seed=42, transfer_dtype="uint8")
    eval_ds = TrackNetDataset(
        labels_df=train_ds.unused_labels_df, num_stacks=num_stacks,
        img_wh=tuple(img_cfg["img_wh"]),
        avg_diameter=int(img_cfg.get("avg_diameter", 5)),
        transfer_dtype="uint8")
    # wrap-padded tail = one compiled shape; evaluate() masks padded rows
    eval_dl = DataLoader(eval_ds, args.batch_size, shuffle=False,
                         num_workers=2, pad_last="wrap")

    quantize = args.quantize if args.quantize != "none" else None
    if quantize not in (None, "int8"):
        raise ValueError(f"unknown quantize mode: {quantize!r}")
    deploy = args.deploy or quantize is not None

    model = TrackNet(config=cfg["model_config"], dtype=jnp.bfloat16)
    tx, _ = make_optimizer(dict(tc["optimizer_config"]))
    pipe = TrainTrackNetPipeline(
        model, tx, mesh=make_mesh(1), checkpoint_path=args.weights_path,
        sample_input_shape=(img_cfg["img_wh"][1], img_cfg["img_wh"][0],
                            3 * num_stacks),
        tp_dist_tol=float(tc.get("tp_dist_tol", args.tp_dist_tol)),
        heatmap_threshold=int(tc.get("heatmap_threshold", 128)),
        decode=args.decode, hough_grad_config=tc.get("hough_grad_config"))

    if deploy:
        calib_frames = None
        if quantize == "int8":
            calib_frames, _, _ = next(iter(eval_dl))
        pipe._eval_forward = _deploy_eval_forward(
            args.weights_path, cfg["model_config"], pipe.heatmap_threshold,
            quantize, calib_frames)

    metrics = pipe.evaluate(eval_dl, verbose=args.verbose)
    out = {
        "f1": round(float(metrics["f1"]), 5),
        "precision": round(float(metrics["precision"]), 5),
        "recall": round(float(metrics["recall"]), 5),
        "tp": int(metrics["tp"]), "tn": int(metrics["tn"]),
        "fp": int(metrics["fp"]), "fn": int(metrics["fn"]),
        "eval_loss": round(float(metrics["loss"]), 6),
        "num_windows": len(eval_ds),
        "decode": args.decode,
        "form": ("int8" if quantize else "deploy") if deploy else "train",
        "weights": args.weights_path,
    }
    print(json.dumps(out))
    return out


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="TrackNet eval (official protocol)")
    parser.add_argument("--weights_path", type=str,
                        default="saved_model/tracknet/best_model/TrackNet.ckpt.tar",
                        metavar="", help="checkpoint manifest path")
    parser.add_argument("--config_path", type=str, default="", metavar="",
                        help="config YAML (default: <weights dir>/config/config.yaml)")
    parser.add_argument("--data_path", type=str, default="", metavar="",
                        help="clips root (default: train_config.data_path)")
    parser.add_argument("--batch_size", type=int, default=8, metavar="")
    parser.add_argument("--decode", type=str, default="centroid",
                        choices=["centroid", "hough"], metavar="",
                        help="centroid (on-device) | hough (cv2 parity)")
    parser.add_argument("--deploy", action="store_true",
                        help="score the serve form (BN folded / RepVGG fused)")
    parser.add_argument("--quantize", type=str, default="none",
                        choices=["none", "int8"], metavar="",
                        help="int8: PTQ on the first eval batch (implies --deploy)")
    parser.add_argument("--tp_dist_tol", type=float, default=4.0, metavar="",
                        help="tp tolerance in px (config tp_dist_tol wins)")
    parser.add_argument("--verbose", action="store_true")
    return parser


if __name__ == "__main__":
    logging.basicConfig(format=LOG_FORMAT, datefmt=LOG_DATE_FORMAT,
                        level=logging.INFO)
    run(build_parser().parse_args())
