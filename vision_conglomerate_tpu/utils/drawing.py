"""Host-side rendering + summary tables (cv2/pandas).

Re-implementations of the reference drawing stack (utils/utils.py:241-401).
Inputs are HWC numpy images (the framework's layout); CHW is accepted and
transposed for drop-in compatibility.
"""
from typing import Any, Dict, List, Optional

import numpy as np
import pandas as pd

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from .labels import overlap_masks


def _to_uint8_hwc(img: np.ndarray) -> np.ndarray:
    assert img.ndim == 3
    if img.shape[0] == 3 and img.shape[-1] != 3:
        img = np.ascontiguousarray(img.transpose(1, 2, 0))
    if img.dtype != np.uint8:
        img = (img * 255).astype(np.uint8)
    return np.ascontiguousarray(img)


def apply_segments(img: np.ndarray, masks: np.ndarray, alpha: float = 0.5,
                   colormap: Optional[np.ndarray] = None) -> np.ndarray:
    """Overlay instance masks (reference utils/utils.py:241-267).
    masks: (1 or m, H, W); multi-instance stacks are overlap-compressed first."""
    img = _to_uint8_hwc(img)
    masks = masks.astype(np.uint8)
    colored = np.zeros_like(img)
    if masks.shape[0] > 1:
        masks, _ = overlap_masks(masks)
    masks = masks.squeeze(axis=0)
    if colormap is None:
        num_objects = int(masks.max()) + 1
        colormap = np.random.randint(0, 255, size=(num_objects, 3))
    for obj_id in range(colormap.shape[0]):
        colored[masks == obj_id + 1] = colormap[obj_id]
    return cv2.addWeighted(src1=img, alpha=alpha, src2=colored, beta=1 - alpha, gamma=0)


def apply_bboxes(img: np.ndarray, bboxes: np.ndarray, box_thickness: int = 2,
                 text_thickness: int = 2, font: Optional[int] = None,
                 font_scale: float = 0.4, colormap: Optional[np.ndarray] = None,
                 classmap: Optional[List[Dict[str, Any]]] = None) -> np.ndarray:
    """Draw (score, class, x1, y1, x2, y2) boxes with labels
    (reference utils/utils.py:270-310)."""
    img = _to_uint8_hwc(img)
    assert bboxes.ndim == 2 and bboxes.shape[1] == 6
    font = cv2.FONT_HERSHEY_SIMPLEX if font is None else font
    if colormap is None:
        colormap = np.random.randint(0, 255, size=(int(bboxes[:, 1].max()) + 1, 3))
    for box in bboxes:
        score, class_idx, x1, y1, x2, y2 = box
        class_idx = int(class_idx)
        x1, y1, x2, y2 = (round(float(v)) for v in (x1, y1, x2, y2))
        color = tuple(int(v) for v in colormap[class_idx])
        img = cv2.rectangle(img, (x1, y1), (x2, y2), color, box_thickness)
        name = classmap[class_idx]["name"] if classmap else class_idx
        text = f"({name} {score :.2f})"
        tw, th = cv2.getTextSize(text, font, font_scale, text_thickness)[0]
        img = cv2.rectangle(img, (x1, y1 - th - 4), (x1 + tw + 2, y1), color, cv2.FILLED)
        img = cv2.putText(img, text, (x1, y1 - 2), font, font_scale, (0, 0, 0), text_thickness)
    return img


def apply_keypoints(img: np.ndarray, keypoints: np.ndarray) -> np.ndarray:
    """Visibility-colored keypoint dots (reference utils/utils.py:312-331)."""
    img = _to_uint8_hwc(img)
    keypoints = keypoints.astype(int)
    for kp in keypoints:
        if kp[2] == 0:
            color = (255, 255, 255)  # visible
        elif kp[2] == 1:
            color = (255, 255, 100)  # occluded
        else:
            continue
        img = cv2.circle(img, tuple(kp[:2]), 3, color=color, thickness=-1)
    return img


def apply_bboxes_from_tracks(img: np.ndarray, tracks: np.ndarray,
                             box_thickness: int = 2, text_thickness: int = 2,
                             font: Optional[int] = None, font_scale: float = 0.4,
                             colormap: Optional[np.ndarray] = None,
                             classmap: Optional[List[Dict[str, Any]]] = None):
    """Draw tracked boxes with `id:{track_id}` labels
    (reference utils/utils.py:333-378). tracks: (n, 7)
    [track_id, score, class_idx, x1, y1, x2, y2]. Returns (img, boxes)."""
    img = _to_uint8_hwc(img)
    boxes = []
    for row in np.asarray(tracks).reshape(-1, 7):
        track_id, score, class_idx, x1, y1, x2, y2 = row
        if score is None or np.isnan(score):
            continue
        class_idx = int(class_idx)
        boxes.append([int(track_id), float(score), class_idx, x1, y1, x2, y2])
        x1, y1, x2, y2 = (round(float(v)) for v in (x1, y1, x2, y2))
        color = tuple(int(v) for v in colormap[class_idx]) if colormap is not None else (0, 255, 0)
        fnt = cv2.FONT_HERSHEY_SIMPLEX if font is None else font
        img = cv2.rectangle(img, (x1, y1), (x2, y2), color, box_thickness)
        name = classmap[class_idx]["name"] if classmap else class_idx
        text = f"id:{int(track_id)} ({name} {score :.2f})"
        tw, th = cv2.getTextSize(text, fnt, font_scale, text_thickness)[0]
        img = cv2.rectangle(img, (x1, y1 - th - 4), (x1 + tw + 2, y1), color, cv2.FILLED)
        img = cv2.putText(img, text, (x1, y1 - 2), fnt, font_scale, (0, 0, 0), text_thickness)
    return img, np.asarray(boxes)


def detection_summary_df(bboxes: np.ndarray,
                         classmap: Optional[List[Dict[str, Any]]] = None,
                         box_coord_label: Optional[List[str]] = None) -> Optional[pd.DataFrame]:
    """Per-box summary rows (reference utils/utils.py:380-401). Accepts
    (n, 6) [score, cls, ...] or (n, 7) [track_id, score, cls, ...]."""
    box_coord_label = box_coord_label or ["X", "Y", "W", "H"]
    data = []
    for box in np.asarray(bboxes):
        row = {}
        if len(box) == 6:
            score, class_idx, *coords = box
        else:
            track_id, score, class_idx, *coords = box
            row["track_id"] = track_id
        class_idx = int(class_idx)
        row.update({
            "confidence": score,
            "class": classmap[class_idx]["name"] if classmap else class_idx,
        })
        row.update({k: int(v) for k, v in zip(box_coord_label, coords)})
        data.append(row)
    if data:
        return pd.DataFrame(data)
    return None
