"""Detection dataset: YOLO-format images + txt labels -> padded batches.

Re-design of /root/reference/dataset/detection_dataset.py:15-88 for fixed
shapes under jit: instead of the reference's ragged concat-collate (batch-idx
column stamped into a flat (sum_n, 6) tensor), every batch is padded to
`max_labels` rows per image with a boolean validity mask — the layout the
fixed-capacity assigner consumes directly.

Keypoint handling matches the reference: keypoint xy re-normalised from
image space to bbox-relative coordinates, clipped to [0, 1]
(detection_dataset.py:41-51); ragged keypoint rows are padded with +inf so
the loss's finite-filter drops them (detection_loss.py:167-172).
"""
import glob
import logging
import os
from typing import Optional, Tuple, Union

import numpy as np

from ..utils.image import load_and_process_img
from ..utils.labels import get_class_weights, load_bbox_labels, xywh2xyxy_np

logger = logging.getLogger(__name__)


class DetectionDataset:
    def __init__(
        self,
        data_dir: str,
        img_ext: str = "png",
        img_wh: Union[int, Tuple[int, int]] = (640, 640),
        max_labels: int = 64,
        decode_backend: str = "pil",  # "pil" | "native" (C++ jpeg/png +
        # PIL-parity bicubic resize; see data/native_loader.py)
    ):
        if isinstance(img_wh, int):
            img_wh = (img_wh, img_wh)
        self.img_wh = img_wh
        self.max_labels = max_labels
        self.decode_backend = decode_backend
        self._native = None
        if decode_backend == "native":
            from .native_loader import NativeImageDecoder

            self._native = NativeImageDecoder()
        elif decode_backend != "pil":
            raise ValueError(f"unknown decode_backend: {decode_backend!r}")

        self.img_files = sorted(
            glob.glob(os.path.join(data_dir, "**", f"*.{img_ext}"), recursive=True))
        self.annotation_files = sorted(
            glob.glob(os.path.join(data_dir, "**", "*.txt"), recursive=True))
        if len(self.img_files) == 0:
            raise FileNotFoundError(
                f"{data_dir} does not contain any .{img_ext} files in its base and sub directories")
        if len(self.annotation_files) == 0:
            raise FileNotFoundError(
                f"{data_dir} does not contain any .txt files in its base and sub directories")
        assert len(self.img_files) == len(self.annotation_files)
        logger.info(f"Number of image samples: {len(self)}")

        self._num_label_cols: Optional[int] = None

    def __len__(self) -> int:
        return len(self.img_files)

    @property
    def num_label_cols(self) -> int:
        """Columns per label row (5 or 5+3K); sniffed from the first non-empty file."""
        if self._num_label_cols is None:
            cols = 5
            for f in self.annotation_files:
                raw = load_bbox_labels(f, bbox_only=False)
                if raw.shape[0] > 0:
                    cols = raw.shape[1]
                    break
            self._num_label_cols = cols
        return self._num_label_cols

    @property
    def num_keypoints(self) -> int:
        """Reference sniffing rule (train_det.py:137): (cols - 5) // 3 keypoints
        per box (cols there includes the batch-idx column, hence their -6)."""
        return max(0, (self.num_label_cols - 5) // 3)

    def load_labels(self, annotation_file: str) -> np.ndarray:
        raw = load_bbox_labels(annotation_file, bbox_only=False)
        if raw.shape[0] > 0 and raw.shape[1] > 5:
            bbox = raw[:, :5]
            kp = raw[:, 5:].reshape(raw.shape[0], -1, 3)
            xyxy = xywh2xyxy_np(bbox[:, 1:])
            span = xyxy[:, None, 2:] - xyxy[:, None, :2]
            kp[..., :2] = np.clip(
                (kp[..., :2] - xyxy[:, None, :2]) / np.maximum(span, 1e-9), 0.0, 1.0)
            raw = np.concatenate([bbox, kp.reshape(kp.shape[0], -1)], axis=1)
        return raw

    def _load_image(self, idx: int) -> np.ndarray:
        """Resized uint8 RGB via the configured decode backend (shared with
        SegmentationDataset)."""
        if self._native is not None:
            with open(self.img_files[idx], "rb") as f:
                return self._native.decode_resize(f.read(), self.img_wh,
                                                  resize="pil")
        return load_and_process_img(
            self.img_files[idx], img_wh=self.img_wh, scale=False,
            convert_to="RGB")

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        # ship uint8: PIL resizes the uint8 image BEFORE the reference's /255
        # (utils/utils.py:32-40), so normalizing on device after an identical
        # uint8 resize is bit-equivalent and cuts H2D traffic 4x — the
        # trainers normalize in-jit (ops/preprocess.normalize_images).
        img = self._load_image(idx)
        labels = self.load_labels(self.annotation_files[idx]).astype(np.float32)
        return img, labels

    def get_class_weights(self) -> np.ndarray:
        classes = []
        for f in self.annotation_files:
            boxes = load_bbox_labels(f)
            classes.extend(boxes[:, 0].tolist())
        return get_class_weights(classes).astype(np.float32)

    @staticmethod
    def save_label_map(class2idx_map: dict, _dir: str):
        """Persist idx->class json (reference detection_dataset.py:72-79)."""
        import json

        os.makedirs(_dir, exist_ok=True)
        idx2class = {v: k for k, v in class2idx_map.items()}
        with open(os.path.join(_dir, "class_map.json"), "w") as f:
            json.dump(idx2class, f)

    # ---------------------------------------------------------- collate
    def collate_fn(self, batch):
        """Stack images; pad labels to (B, max_labels, C) + validity mask.

        Ragged keypoint rows are padded with +inf (see module docstring).
        """
        imgs, labels = zip(*batch)
        b = len(imgs)
        cols = max(self.num_label_cols, max((l.shape[1] for l in labels if l.size), default=5))
        out = np.full((b, self.max_labels, cols), np.inf, dtype=np.float32)
        out[:, :, :5] = 0.0
        mask = np.zeros((b, self.max_labels), dtype=bool)
        for i, lab in enumerate(labels):
            n = min(lab.shape[0], self.max_labels)
            if lab.shape[0] > self.max_labels:
                logger.warning(
                    f"sample has {lab.shape[0]} labels; truncating to max_labels={self.max_labels}")
            out[i, :n, :lab.shape[1]] = lab[:n]
            mask[i, :n] = True
        return np.stack(imgs, axis=0), out, mask
