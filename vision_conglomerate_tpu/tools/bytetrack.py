"""ByteTrack multi-object tracker (host-side, numpy + scipy Hungarian).

The reference delegates tracking to `supervision.ByteTrack`
(/root/reference/inference_det.py:288-294, configured with
track_activation_threshold=0.35, lost_track_buffer=30,
minimum_matching_threshold=0.85, frame_rate=30,
minimum_consecutive_frames=1). That package is not available here, so this
is a from-scratch implementation of the ByteTrack association algorithm
(Zhang et al., 2022): a constant-velocity Kalman filter per track plus
two-stage IoU association — high-score detections first, then low-score
detections against the remaining tracks.

Tracking is sequential per-frame CPU logic by design (SURVEY.md §2.2): the
TPU handles everything up to and including NMS; the (<=K, 6) filtered boxes
then cross to host for association/drawing.
"""
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np
from scipy.optimize import linear_sum_assignment


@dataclass
class Detections:
    """Minimal stand-in for supervision.Detections."""

    xyxy: np.ndarray                      # (n, 4)
    confidence: Optional[np.ndarray] = None   # (n,)
    class_id: Optional[np.ndarray] = None     # (n,)
    tracker_id: Optional[np.ndarray] = None   # (n,)
    mask: Optional[np.ndarray] = None         # (n, H, W) bool

    def __len__(self):
        return int(self.xyxy.shape[0])

    def __getitem__(self, index):
        take = lambda a: None if a is None else a[index]  # noqa: E731
        return Detections(self.xyxy[index], take(self.confidence),
                          take(self.class_id), take(self.tracker_id), take(self.mask))


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=2)
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=1)
    area_b = np.prod(b[:, 2:] - b[:, :2], axis=1)
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


class _KalmanFilter:
    """Constant-velocity KF on (cx, cy, aspect, h) + velocities."""

    ndim = 4

    def __init__(self):
        self._F = np.eye(8)
        self._F[:4, 4:] = np.eye(4)
        self._H = np.eye(4, 8)
        self._std_weight_pos = 1.0 / 20
        self._std_weight_vel = 1.0 / 160

    def initiate(self, meas):
        mean = np.zeros(8)
        mean[:4] = meas
        std = [
            2 * self._std_weight_pos * meas[3], 2 * self._std_weight_pos * meas[3],
            1e-2, 2 * self._std_weight_pos * meas[3],
            10 * self._std_weight_vel * meas[3], 10 * self._std_weight_vel * meas[3],
            1e-5, 10 * self._std_weight_vel * meas[3],
        ]
        cov = np.diag(np.square(std))
        return mean, cov

    def predict(self, mean, cov):
        std = [
            self._std_weight_pos * mean[3], self._std_weight_pos * mean[3],
            1e-2, self._std_weight_pos * mean[3],
            self._std_weight_vel * mean[3], self._std_weight_vel * mean[3],
            1e-5, self._std_weight_vel * mean[3],
        ]
        q = np.diag(np.square(std))
        mean = self._F @ mean
        cov = self._F @ cov @ self._F.T + q
        return mean, cov

    def update(self, mean, cov, meas):
        std = [
            self._std_weight_pos * mean[3], self._std_weight_pos * mean[3],
            1e-1, self._std_weight_pos * mean[3],
        ]
        r = np.diag(np.square(std))
        s = self._H @ cov @ self._H.T + r
        k = cov @ self._H.T @ np.linalg.inv(s)
        innovation = meas - self._H @ mean
        mean = mean + k @ innovation
        cov = cov - k @ s @ k.T
        return mean, cov


def _xyxy_to_cxcyah(box):
    w = box[2] - box[0]
    h = box[3] - box[1]
    return np.asarray([box[0] + w / 2, box[1] + h / 2, w / max(h, 1e-9), h])


def _cxcyah_to_xyxy(state):
    cx, cy, a, h = state[:4]
    w = a * h
    return np.asarray([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])


@dataclass
class _Track:
    mean: np.ndarray
    cov: np.ndarray
    score: float
    class_id: int
    track_id: int
    hits: int = 1
    time_since_update: int = 0
    activated: bool = False

    @property
    def xyxy(self):
        return _cxcyah_to_xyxy(self.mean)


class ByteTrack:
    def __init__(
        self,
        track_activation_threshold: float = 0.25,
        lost_track_buffer: int = 30,
        minimum_matching_threshold: float = 0.8,
        frame_rate: int = 30,
        minimum_consecutive_frames: int = 1,
        low_score_threshold: float = 0.1,
    ):
        self.track_activation_threshold = track_activation_threshold
        self.max_time_lost = int(frame_rate / 30.0 * lost_track_buffer)
        self.match_thresh = minimum_matching_threshold
        self.min_consecutive = minimum_consecutive_frames
        self.low_thresh = low_score_threshold
        self.kf = _KalmanFilter()
        self.tracks: List[_Track] = []
        self._next_id = 1

    def reset(self):
        self.tracks = []
        self._next_id = 1

    def _match(self, tracks: List[_Track], dets: Detections, iou_thresh: float):
        track_boxes = np.asarray([t.xyxy for t in tracks]).reshape(-1, 4)
        iou = _iou_matrix(track_boxes, dets.xyxy)
        cost = 1.0 - iou
        if cost.size == 0:
            return [], list(range(len(tracks))), list(range(len(dets)))
        rows, cols = linear_sum_assignment(cost)
        matches, un_t, un_d = [], [], []
        matched_t, matched_d = set(), set()
        for r, c in zip(rows, cols):
            if iou[r, c] >= 1.0 - iou_thresh:
                matches.append((r, c))
                matched_t.add(r)
                matched_d.add(c)
        un_t = [i for i in range(len(tracks)) if i not in matched_t]
        un_d = [i for i in range(len(dets)) if i not in matched_d]
        return matches, un_t, un_d

    def update_with_detections(self, detections: Detections) -> Detections:
        """Associate detections with tracks; returns detections whose rows are
        the activated matched tracks with tracker_id filled."""
        scores = (detections.confidence if detections.confidence is not None
                  else np.ones(len(detections)))
        high = scores >= self.track_activation_threshold
        low = (~high) & (scores >= self.low_thresh)
        dets_high = detections[high]
        dets_low = detections[low]

        for t in self.tracks:
            t.mean, t.cov = self.kf.predict(t.mean, t.cov)
            t.time_since_update += 1

        # stage 1: high-score detections vs all tracks
        matches, un_t, un_d_high = self._match(self.tracks, dets_high, self.match_thresh)
        out_rows = []
        for r, c in matches:
            t = self.tracks[r]
            t.mean, t.cov = self.kf.update(
                t.mean, t.cov, _xyxy_to_cxcyah(dets_high.xyxy[c]))
            t.score = float(scores[high][c])
            t.hits += 1
            t.time_since_update = 0
            if t.hits >= self.min_consecutive:
                t.activated = True
            if t.activated:
                out_rows.append((t, dets_high, c))

        # stage 2: low-score detections vs remaining tracks
        remaining = [self.tracks[i] for i in un_t]
        matches2, un_t2, _ = self._match(remaining, dets_low, 0.5)
        for r, c in matches2:
            t = remaining[r]
            t.mean, t.cov = self.kf.update(
                t.mean, t.cov, _xyxy_to_cxcyah(dets_low.xyxy[c]))
            t.score = float(scores[low][c])
            t.hits += 1
            t.time_since_update = 0
            if t.activated:
                out_rows.append((t, dets_low, c))

        # births from unmatched high-score detections
        for c in un_d_high:
            if scores[high][c] < self.track_activation_threshold:
                continue
            mean, cov = self.kf.initiate(_xyxy_to_cxcyah(dets_high.xyxy[c]))
            t = _Track(
                mean=mean, cov=cov, score=float(scores[high][c]),
                class_id=int(dets_high.class_id[c]) if dets_high.class_id is not None else -1,
                track_id=self._next_id,
                activated=self.min_consecutive <= 1,
            )
            self._next_id += 1
            self.tracks.append(t)
            if t.activated:
                out_rows.append((t, dets_high, c))

        # deaths
        self.tracks = [t for t in self.tracks if t.time_since_update <= self.max_time_lost]

        if not out_rows:
            return Detections(
                xyxy=np.zeros((0, 4), np.float32),
                confidence=np.zeros((0,), np.float32),
                class_id=np.zeros((0,), np.int32),
                tracker_id=np.zeros((0,), np.int32),
            )
        xyxy = np.stack([d.xyxy[c] for _, d, c in out_rows])
        conf = np.asarray([t.score for t, _, _ in out_rows], np.float32)
        cls = np.asarray(
            [d.class_id[c] if d.class_id is not None else t.class_id
             for t, d, c in out_rows], np.int32)
        tid = np.asarray([t.track_id for t, _, _ in out_rows], np.int32)
        masks = None
        if detections.mask is not None:
            masks = np.stack([d.mask[c] for _, d, c in out_rows])
        return Detections(xyxy=xyxy, confidence=conf, class_id=cls,
                          tracker_id=tid, mask=masks)
