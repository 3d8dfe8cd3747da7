"""Segmentation dataset: polygon labels -> boxes + rasterized masks.

Re-design of /root/reference/dataset/segmentation_dataset.py:19-77 with the
padded-batch layout. Default overlap mode compresses all instances of an
image into one indexed (H, W) mask where smaller objects get higher ids
(utils/labels.overlap_masks); labels are re-ordered by descending area to
stay aligned with mask ids, exactly as the reference does
(segmentation_dataset.py:42-45). The per-image label slot m then corresponds
to mask id m+1 — the assigner's overlap tmask_idx convention.

Non-overlap mode stores per-instance masks (max_labels, Hm, Wm); the
`mask_store_wh` lets the host pre-resize masks (nearest) so device memory
stays bounded — the loss nearest-resizes to proto resolution anyway
(segmentation_loss.py:157-158 in the reference).
"""
from typing import Optional, Tuple

import numpy as np

from .detection import DetectionDataset
from ..utils.image import load_and_process_img
from ..utils.labels import (
    get_class_weights,
    interpolate_polygons,
    load_polygon_labels,
    overlap_masks,
    polygons_2_masks,
    polygons_2_xywh,
)


class SegmentationDataset(DetectionDataset):
    def __init__(self, *args, overlap_masks: bool = True, mask_scale_factor: float = 1.0,
                 mask_store_wh: Optional[Tuple[int, int]] = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.overlap_masks = overlap_masks
        self.mask_scale_factor = mask_scale_factor
        self.mask_store_wh = mask_store_wh

    @property
    def num_label_cols(self) -> int:
        return 5

    def __getitem__(self, idx: int):
        # uint8 out; device-side /255 in the trainer (see DetectionDataset);
        # honors decode_backend="native" via the shared helper
        img = self._load_image(idx)
        raw = load_polygon_labels(self.annotation_files[idx])
        h, w = img.shape[0], img.shape[1]

        if len(raw) > 0:
            classes = np.asarray([p[0] for p in raw])
            polygons = interpolate_polygons([p[1:] for p in raw])
            bboxes = np.asarray(polygons_2_xywh(polygons))
            labels = np.zeros((len(polygons), 5), dtype=np.float32)
            labels[:, 0] = classes
            labels[:, 1:] = bboxes
            if self.overlap_masks:
                masks = polygons_2_masks(polygons, w, h, scale_factor=self.mask_scale_factor)
                masks, order = overlap_masks(masks)
                labels = labels[order]
            else:
                masks = polygons_2_masks(polygons, w, h, scale_factor=self.mask_scale_factor)
        else:
            labels = np.zeros((0, 5), dtype=np.float32)
            mh = round(h * self.mask_scale_factor)
            mw = round(w * self.mask_scale_factor)
            masks = np.zeros(((1 if self.overlap_masks else 0), mh, mw), dtype=np.uint8)
        if self.mask_store_wh is not None:
            masks = _nearest_resize_stack(masks, self.mask_store_wh)
        return img, labels, masks

    def get_class_weights(self) -> np.ndarray:
        classes = []
        for f in self.annotation_files:
            classes.extend(p[0] for p in load_polygon_labels(f))
        return get_class_weights(classes).astype(np.float32)

    def collate_fn(self, batch):
        """(B,H,W,3) imgs, (B,M,5) labels, mask validity, target masks.

        overlap: masks (B, Hm, Wm) uint8 indexed; non-overlap:
        (B, M, Hm, Wm) uint8 binary, slot-aligned with labels.
        """
        imgs, labels, masks = zip(*batch)
        b = len(imgs)
        out = np.zeros((b, self.max_labels, 5), dtype=np.float32)
        valid = np.zeros((b, self.max_labels), dtype=bool)
        for i, lab in enumerate(labels):
            n = min(lab.shape[0], self.max_labels)
            out[i, :n] = lab[:n]
            valid[i, :n] = True
        if self.overlap_masks:
            tgt = np.stack([m[0] for m in masks], axis=0)
        else:
            mh, mw = masks[0].shape[1:] if masks[0].shape[0] else (
                round(imgs[0].shape[0] * self.mask_scale_factor),
                round(imgs[0].shape[1] * self.mask_scale_factor))
            tgt = np.zeros((b, self.max_labels, mh, mw), dtype=np.uint8)
            for i, m in enumerate(masks):
                n = min(m.shape[0], self.max_labels)
                tgt[i, :n] = m[:n]
        return np.stack(imgs, axis=0), out, valid, tgt


def _nearest_resize_stack(masks: np.ndarray, wh: Tuple[int, int]) -> np.ndarray:
    """Nearest resize of a (n, H, W) uint8 stack to (n, h, w) on host."""
    if masks.shape[0] == 0:
        return np.zeros((0, wh[1], wh[0]), dtype=masks.dtype)
    w, h = wh
    ys = (np.arange(h) * masks.shape[1] / h).astype(int)
    xs = (np.arange(w) * masks.shape[2] / w).astype(int)
    return masks[:, ys][:, :, xs]
