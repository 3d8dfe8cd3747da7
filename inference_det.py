"""Detection inference CLI (same flag surface as the reference's
inference_det.py:319-331, plus --save_og_size — documented in the reference
readme.md:32 but never wired there — and --no_reparam to disable the RepVGG
deploy-form serving path)."""
import argparse
import logging
import os
from pathlib import Path

LOG_FORMAT = "%(asctime)s %(levelname)s %(filename)s: %(message)s"
LOG_DATE_FORMAT = "%Y-%m-%d %H:%M:%S"


def run(args, config_path: str, task: str = "detection"):
    from vision_conglomerate_tpu.infer.runner import run_detection_inference
    from vision_conglomerate_tpu.utils import load_yaml

    config = load_yaml(config_path)
    tracked = [int(i) for i in args.tracked_classes.split(",") if i != ""] or None
    run_detection_inference(
        path=args.path,
        weights_path=args.weights_path,
        config=config,
        task=task,
        batch_size=args.batch_size,
        iou_threshold=args.iou_threshold,
        score_threshold=args.score_threshold,
        fps=args.fps,
        with_summary=args.with_summary,
        tracked_classes=tracked,
        frame_skips=args.frame_skips,
        box_allowance=args.box_allowance,
        save_og_size=args.save_og_size,
        use_reparam=not args.no_reparam,
        quantize=(args.quantize if args.quantize != "none" else None),
        crop_masks=getattr(args, "crop_masks", False),
        out_ext=args.out_ext,
    )


def build_parser(task: str, default_weights: str) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=f"{task.title()} Inference")
    parser.add_argument("--path", type=str, metavar="", help="input path (image, folder of images or single video)")
    parser.add_argument("--batch_size", type=int, default=32, metavar="", help="Inference batch size")
    parser.add_argument("--weights_path", type=str, default=default_weights, metavar="", help="saved model path")
    parser.add_argument("--dl_workers", type=int, default=0, metavar="", help="Number of dataloader workers")
    parser.add_argument("--device", type=str, default="tpu", metavar="", help="device to run inference on")
    parser.add_argument("--fps", type=int, default=30, metavar="", help="Number of frames per second for video")
    parser.add_argument("--iou_threshold", type=float, default=0.35, metavar="", help="IOU threshold for NMS")
    parser.add_argument("--score_threshold", type=float, default=0.3, metavar="", help="Confidence score threshold")
    parser.add_argument("--with_summary", action="store_true", help="Store output with csv summary of detection")
    parser.add_argument("--tracked_classes", type=str, default="", metavar="", help="class indexes to track")
    parser.add_argument("--frame_skips", type=int, default=0, metavar="", help="Number of frames to skip (only applicable to video stream)")
    parser.add_argument("--box_allowance", type=int, default=4, metavar="", help="Bounding box width and height allowance")
    parser.add_argument("--save_og_size", dest="save_og_size", action="store_true",
                        help="Render outputs at original image size (default; documented by the reference readme.md:32 but never wired there)")
    parser.add_argument("--no_save_og_size", dest="save_og_size", action="store_false",
                        help="Render outputs at network resolution instead of original size")
    parser.set_defaults(save_og_size=True)
    parser.add_argument("--no_reparam", action="store_true", help="Serve the train-form (multi-branch RepVGG) network")
    parser.add_argument("--quantize", type=str, default="none", choices=["none", "int8"], metavar="",
                        help="Post-training quantization of the deploy-form convs (int8 MXU; calibrated on the first batch)")
    parser.add_argument("--out_ext", type=str, default="png", choices=["png", "jpg", "jpeg"], metavar="",
                        help="Annotated-image output format; png matches the reference "
                             "(inference_det.py:157-158), jpg is ~20x cheaper to encode on "
                             "small hosts (docs/PERF.md end-to-end serving)")
    return parser


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, format=LOG_FORMAT, datefmt=LOG_DATE_FORMAT)
    best_model_path = "saved_model/detection/best_model/DetectionNet.ckpt.tar"
    config_path = os.path.join(Path(best_model_path).parent.resolve(), "config", "config.yaml")
    parser = build_parser("detection", best_model_path)
    args = parser.parse_args()
    run(args, config_path, task="detection")
