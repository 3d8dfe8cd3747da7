"""TrackNet inference CLI (reference inference_tracknet.py:209-220 flag
surface: --path --batch_size --weights_path --dl_workers --device --fps
--img_ext --frame_skips --with_summary --max_num_trace
--max_circle_thickness)."""
import argparse
import logging
import os
from pathlib import Path

LOG_FORMAT = "%(asctime)s %(levelname)s %(filename)s: %(message)s"
LOG_DATE_FORMAT = "%Y-%m-%d %H:%M:%S"


def run(args, config_path: str):
    from vision_conglomerate_tpu.infer.tracknet_runner import run_tracknet_inference
    from vision_conglomerate_tpu.utils import load_yaml

    config = load_yaml(config_path)
    run_tracknet_inference(
        path=args.path,
        weights_path=args.weights_path,
        config=config,
        batch_size=args.batch_size,
        fps=args.fps,
        img_ext=args.img_ext,
        frame_skips=args.frame_skips,
        with_summary=args.with_summary,
        max_num_trace=args.max_num_trace,
        max_circle_thickness=args.max_circle_thickness,
        use_reparam=not args.no_reparam,
        quantize=(args.quantize if args.quantize != "none" else None),
    )


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, format=LOG_FORMAT, datefmt=LOG_DATE_FORMAT)
    best_model_path = "saved_model/tracknet/best_model/TrackNet.ckpt.tar"
    config_path = os.path.join(Path(best_model_path).parent.resolve(), "config", "config.yaml")
    parser = argparse.ArgumentParser(description="TrackNet Inference")
    parser.add_argument("--path", type=str, metavar="", help="input path (folder of frames or single video)")
    parser.add_argument("--batch_size", type=int, default=32, metavar="", help="Inference batch size")
    parser.add_argument("--weights_path", type=str, default=best_model_path, metavar="", help="saved model path")
    parser.add_argument("--dl_workers", type=int, default=0, metavar="", help="Number of dataloader workers")
    parser.add_argument("--device", type=str, default="tpu", metavar="", help="device to run inference on")
    parser.add_argument("--fps", type=int, default=30, metavar="", help="Number of frames per second for video")
    parser.add_argument("--img_ext", type=str, default="jpg", metavar="", help="Image extension for frame folders")
    parser.add_argument("--frame_skips", type=int, default=0, metavar="", help="Number of frames to skip (video only)")
    parser.add_argument("--with_summary", action="store_true", help="Store output with csv summary [frame, x, y, r]")
    parser.add_argument("--max_num_trace", type=int, default=5, metavar="", help="Number of past positions in the fading trace")
    parser.add_argument("--max_circle_thickness", type=int, default=10, metavar="", help="Max thickness of trace circles")
    parser.add_argument("--no_reparam", action="store_true", help="Serve the train-form network (advanced arch only)")
    parser.add_argument("--quantize", type=str, default="none", choices=["none", "int8"], metavar="",
                        help="Beyond-reference: int8 PTQ serving (calibrates on the first batch)")
    args = parser.parse_args()
    run(args, config_path)
