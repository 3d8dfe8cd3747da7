"""Detection accuracy evaluation CLI: checkpoint + val dir -> mAP@IoU.

One command to the north-star accuracy metric (BASELINE.md): loads a
checkpoint (deploy/RepVGG-fused form by default, like inference_det.py),
runs forward + decode + NMS on device over a YOLO-format directory and
prints a JSON line {"map50": ..., "ap_per_class": [...], ...}.

The reference has no equivalent — its eval loop emits proxy metrics on
matched cells (/root/reference/modules/detection_loss.py:198-220); this CLI
is the beyond-reference accuracy instrument the framework is judged by.

Usage:
    python eval_det.py --weights_path saved_model/detection/best_model/DetectionNet.ckpt.tar \
        --data_dir data/detection/valid [--config_path .../config.yaml] [--iou 0.5]
"""
import argparse
import json
import logging
import os
from pathlib import Path

LOG_FORMAT = "%(asctime)s %(levelname)s %(filename)s: %(message)s"
LOG_DATE_FORMAT = "%Y-%m-%d %H:%M:%S"
logger = logging.getLogger(__name__)


def run(args) -> dict:
    import numpy as np

    from vision_conglomerate_tpu.tools.eval_harness import evaluate_checkpoint_map
    from vision_conglomerate_tpu.utils import load_yaml

    config_path = args.config_path or os.path.join(
        Path(args.weights_path).parent.resolve(), "config", "config.yaml")
    config = load_yaml(config_path)

    result = evaluate_checkpoint_map(
        args.weights_path,
        config,
        args.data_dir,
        batch_size=args.batch_size,
        iou_threshold=args.iou,
        nms_iou_threshold=args.nms_iou_threshold,
        score_threshold=args.score_threshold,
        max_detections=args.max_detections,
        use_reparam=not args.no_reparam,
        max_labels=args.max_labels,
        quantize=(args.quantize if args.quantize != "none" else None),
    )
    out = {
        f"map{int(round(args.iou * 100))}": round(result["map"], 5),
        "iou_threshold": args.iou,
        "ap_per_class": [None if np.isnan(v) else round(float(v), 5)
                         for v in result["ap_per_class"]],
        "num_gt_per_class": [int(v) for v in result["num_gt_per_class"]],
        "num_images": result["num_images"],
        "weights": args.weights_path,
        "data_dir": args.data_dir,
        "quantize": args.quantize,
    }
    print(json.dumps(out))
    return out


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="Detection mAP evaluation")
    parser.add_argument("--weights_path", type=str,
                        default="saved_model/detection/best_model/DetectionNet.ckpt.tar",
                        metavar="", help="checkpoint manifest path")
    parser.add_argument("--data_dir", type=str, default="data/detection/valid",
                        metavar="", help="YOLO-format directory (images + txt labels)")
    parser.add_argument("--config_path", type=str, default="", metavar="",
                        help="config YAML (default: <weights dir>/config/config.yaml)")
    parser.add_argument("--batch_size", type=int, default=16, metavar="")
    parser.add_argument("--iou", type=float, default=0.5, metavar="",
                        help="mAP matching IoU threshold")
    parser.add_argument("--nms_iou_threshold", type=float, default=0.35, metavar="")
    parser.add_argument("--score_threshold", type=float, default=0.001, metavar="",
                        help="low by design: mAP integrates the full PR curve")
    parser.add_argument("--max_detections", type=int, default=300, metavar="")
    parser.add_argument("--max_labels", type=int, default=64, metavar="")
    parser.add_argument("--no_reparam", action="store_true",
                        help="Evaluate the train-form (multi-branch) network")
    parser.add_argument("--quantize", type=str, default="none", choices=["none", "int8"], metavar="",
                        help="Evaluate the int8-PTQ serving form (mAP delta check vs bf16)")
    return parser


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, format=LOG_FORMAT, datefmt=LOG_DATE_FORMAT)
    run(build_parser().parse_args())
