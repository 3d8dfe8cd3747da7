"""Inference datasets: single image, image dir, video stream (+ TrackNet
frame-stacking variants).

Re-design of /root/reference/dataset/inference_dataset.py:11-163. Each item
is (resized float image, original uint8 image). The resize is plain bilinear
— aspect ratio NOT preserved, no letterboxing — matching the reference
exactly (inference_dataset.py:26-28). Layout is HWC.
"""
import glob
import os
from collections import deque
from typing import Iterator, Optional, Tuple

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from ..utils.image import load_and_process_img


def _resize_bilinear(img_f32: np.ndarray, wh: Tuple[int, int]) -> np.ndarray:
    """Bilinear resize HWC float image to (w, h) — torch F.interpolate
    (align_corners=False) equivalent; cv2.INTER_LINEAR uses the same
    half-pixel convention."""
    return cv2.resize(img_f32, wh, interpolation=cv2.INTER_LINEAR)


class SingleImgSample:
    """One image (reference inference_dataset.py:11-29)."""

    def __init__(self, img_path: str, img_wh: Tuple[int, int]):
        self.img_wh = img_wh
        og = load_and_process_img(img_path, None, scale=False)  # uint8 HWC
        self.og_img = og
        self.img = _resize_bilinear((og / 255.0).astype(np.float32), img_wh)

    def __len__(self):
        return 1

    def __getitem__(self, idx: int):
        if idx >= 1:  # legacy-iteration protocol terminates on IndexError
            raise IndexError(idx)
        return self.img, self.og_img


class InferenceImgDataset:
    """Directory of images (reference inference_dataset.py:32-59; the driver
    passes img_exts=["png", "jpg", "jpeg"], inference_det.py:261-265)."""

    def __init__(self, img_dir: str, img_ext=None, img_exts=None,
                 img_wh: Tuple[int, int] = (640, 640)):
        self.img_wh = img_wh
        exts = img_exts if img_exts is not None else (
            [img_ext] if isinstance(img_ext, str) else (img_ext or ["png", "jpg", "jpeg"]))
        files = []
        for ext in exts:
            files += glob.glob(os.path.join(img_dir, "**", f"*.{ext}"), recursive=True)
        self.img_files = sorted(set(files))
        if len(self.img_files) == 0:
            raise FileNotFoundError(f"no {exts} files under {img_dir}")

    def __len__(self):
        return len(self.img_files)

    def __getitem__(self, idx: int):
        og = load_and_process_img(self.img_files[idx], None, scale=False)
        img = _resize_bilinear((og / 255.0).astype(np.float32), self.img_wh)
        return img, og


class InferenceVideoDataset:
    """Iterable over video frames with frame skipping
    (reference inference_dataset.py:62-96)."""

    def __init__(self, video_path: str, img_wh: Tuple[int, int] = (640, 640),
                 frame_skips: int = 0):
        self.video_path = video_path
        self.img_wh = img_wh
        self.frame_skips = max(0, frame_skips)
        cap = cv2.VideoCapture(video_path)
        self.fps = cap.get(cv2.CAP_PROP_FPS)
        self.frame_count = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()

    def __iter__(self) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        cap = cv2.VideoCapture(self.video_path)
        idx = 0
        try:
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if idx % (self.frame_skips + 1) == 0:
                    og = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                    img = _resize_bilinear((og / 255.0).astype(np.float32), self.img_wh)
                    yield img, og
                idx += 1
        finally:
            cap.release()


class TrackNetInferenceImgDataset:
    """Sliding window of num_stacks frames over an image sequence
    (reference inference_dataset.py:99-123)."""

    def __init__(self, img_dir: str, img_ext: str = "jpg",
                 img_wh: Tuple[int, int] = (640, 352), num_stacks: int = 3):
        self.img_wh = img_wh
        self.num_stacks = num_stacks
        self.img_files = sorted(
            glob.glob(os.path.join(img_dir, "**", f"*.{img_ext}"), recursive=True))
        if len(self.img_files) < num_stacks:
            raise FileNotFoundError(
                f"need >= {num_stacks} .{img_ext} files under {img_dir}")

    def __len__(self):
        return len(self.img_files) - (self.num_stacks - 1)

    def __getitem__(self, idx: int):
        if idx >= len(self) or idx < 0:
            # slices past the end would silently yield short (ragged) stacks;
            # the legacy-iteration protocol also relies on IndexError here
            raise IndexError(idx)
        paths = self.img_files[idx: idx + self.num_stacks][::-1]  # newest first
        frames = [load_and_process_img(p, None, scale=False) for p in paths]
        og = frames[0]
        stacked = np.concatenate(
            [(f / 255.0).astype(np.float32) for f in frames], axis=-1)
        stacked = _resize_bilinear(stacked, self.img_wh)
        return stacked, og


class TrackNetInferenceVideoDataset:
    """Deque of the last num_stacks video frames
    (reference inference_dataset.py:126-163)."""

    def __init__(self, video_path: str, img_wh: Tuple[int, int] = (640, 352),
                 num_stacks: int = 3, frame_skips: int = 0):
        self.video_path = video_path
        self.img_wh = img_wh
        self.num_stacks = num_stacks
        self.frame_skips = max(0, frame_skips)
        cap = cv2.VideoCapture(video_path)
        self.fps = cap.get(cv2.CAP_PROP_FPS)
        self.frame_count = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()

    def __iter__(self):
        cap = cv2.VideoCapture(self.video_path)
        buf = deque(maxlen=self.num_stacks)
        idx = 0
        try:
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                if idx % (self.frame_skips + 1) == 0:
                    og = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                    buf.append((og / 255.0).astype(np.float32))
                    if len(buf) == self.num_stacks:
                        stacked = np.concatenate(list(buf)[::-1], axis=-1)  # newest first
                        stacked = _resize_bilinear(stacked, self.img_wh)
                        yield stacked, og
                idx += 1
        finally:
            cap.release()
