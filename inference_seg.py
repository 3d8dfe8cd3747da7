"""Segmentation inference CLI (reference inference_seg.py flag surface).
Adds mask assembly between NMS and drawing: sigmoid(protos @ coefs) ->
bilinear to og size -> >0.5 -> colored overlay (on device up to the binary
masks)."""
import logging
import os
from pathlib import Path

from inference_det import build_parser, run

LOG_FORMAT = "%(asctime)s %(levelname)s %(filename)s: %(message)s"
LOG_DATE_FORMAT = "%Y-%m-%d %H:%M:%S"

if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, format=LOG_FORMAT, datefmt=LOG_DATE_FORMAT)
    best_model_path = "saved_model/segmentation/best_model/SegmentationNet.ckpt.tar"
    config_path = os.path.join(Path(best_model_path).parent.resolve(), "config", "config.yaml")
    parser = build_parser("segmentation", best_model_path)
    parser.add_argument("--crop_masks", action="store_true",
                        help="Beyond-reference: crop assembled masks to their predicted "
                             "boxes before drawing (the reference renders uncropped masks)")
    args = parser.parse_args()
    run(args, config_path, task="segmentation")
