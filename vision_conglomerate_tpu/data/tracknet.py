"""TrackNet dataset: clip CSVs -> sliding frame stacks + Gaussian GT heatmaps.

Re-design of /root/reference/dataset/tracknet_dataset.py:11-95:
- aggregates `*/Clip*/Label.csv`, builds windows of num_stacks consecutive
  frames labeled by the last frame's (visibility, x, y, status);
- frames are stacked newest-first (reference [::-1], tracknet_dataset.py:48);
- frames bilinear-resized to img_wh, GT heatmap is exp(-(dx^2+dy^2)/(2*var))
  * 255 as uint8 with variance = avg_diameter;
- the reference's 70/30 handoff (sample(frac=1) + unused_labels_df) is kept
  via split_percentage/unused_labels_df.
"""
import glob
import os
from typing import Optional, Tuple, Union

import numpy as np
import pandas as pd

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from ..ops.heatmap import make_gt_heatmap_np
from ..utils.image import load_and_process_img


class TrackNetDataset:
    def __init__(
        self,
        data_path: Optional[str] = None,
        labels_df: Optional[pd.DataFrame] = None,
        *,
        num_stacks: int = 3,
        img_wh: Union[int, Tuple[int, int]] = (640, 352),
        avg_diameter: int = 5,
        split_percentage: Optional[float] = None,
        seed: Optional[int] = None,
        cache: bool = False,
        transfer_dtype: str = "float32",  # "float32" (reference parity) | "uint8"
    ):
        if transfer_dtype not in ("float32", "uint8"):
            raise ValueError(f"transfer_dtype must be 'float32' or 'uint8', got {transfer_dtype!r}")
        if (labels_df is not None and data_path is not None) or (
                labels_df is None and data_path is None):
            raise ValueError(
                "You either pass in labels_df or data_path, not both and both cannot be NoneType")
        self.data_path = data_path
        self.img_wh = img_wh if not isinstance(img_wh, int) else (img_wh, img_wh)
        self.num_stacks = num_stacks
        self.avg_diameter = avg_diameter
        self.split_percentage = split_percentage or 1.0

        df = self._aggregate_labels_dfs() if data_path is not None else labels_df
        df = df.sample(frac=1, random_state=seed)
        split = int(self.split_percentage * df.shape[0])
        self.labels_df = df.iloc[:split].reset_index(drop=True)
        self.unused_labels_df = df.iloc[split:].reset_index(drop=True)
        # In-memory sample cache: TrackNet windows share frames (each frame
        # appears in num_stacks windows) and clips are small, so caching the
        # decoded (frames, heatmap, others) tuples removes the host decode
        # bottleneck on repeated epochs. Samples are deterministic (no
        # augmentation), so the cache is exact.
        self.cache = cache
        self._cache: dict = {}
        self.transfer_dtype = transfer_dtype

    def __len__(self) -> int:
        return self.labels_df.shape[0]

    def __getitem__(self, idx: int):
        if self.cache and idx in self._cache:
            return self._cache[idx]
        item = self._load_item(idx)
        if self.cache:
            # cached arrays are shared across epochs: freeze them so an
            # in-place mutation by a future consumer fails loudly instead of
            # silently corrupting the cache (collate_fn copies today)
            for arr in item:
                arr.flags.writeable = False
            self._cache[idx] = item
        return item

    def _load_item(self, idx: int):
        *frame_paths, visibility, x, y, status = self.labels_df.iloc[idx, :]
        ship_u8 = self.transfer_dtype == "uint8"
        frames = [load_and_process_img(p, None, scale=not ship_u8)
                  for p in frame_paths][::-1]  # newest first
        stacked = np.concatenate(frames, axis=-1)  # (H, W, 3*num_stacks)
        if visibility == 0:
            x, y = -1, -1
        else:
            x = x * (self.img_wh[0] / stacked.shape[1])
            y = y * (self.img_wh[1] / stacked.shape[0])
        # uint8 mode resizes the raw bytes and leaves /255 to the trainer's
        # in-jit normalize (4x less H2D). Error vs the reference's
        # /255-then-resize order (utils/utils.py:40) is ~1.5/255 worst-case,
        # not one LSB: cv2 bilinear on uint8 inputs quantizes before
        # interpolating (measured bound in tests/test_tracknet.py::
        # test_tracknet_dataset_uint8_transfer, atol=1.5/255).
        stacked = cv2.resize(stacked, self.img_wh, interpolation=cv2.INTER_LINEAR)
        heatmap = make_gt_heatmap_np(
            int(x), int(y), int(visibility), self.img_wh, variance=self.avg_diameter)
        others = np.asarray([visibility, x, y, status], dtype=np.float32)
        return (stacked if ship_u8 else stacked.astype(np.float32)), heatmap, others

    def collate_fn(self, batch):
        frames, heatmaps, others = zip(*batch)
        return (np.stack(frames, axis=0), np.stack(heatmaps, axis=0),
                np.stack(others, axis=0))

    def _aggregate_labels_dfs(self) -> pd.DataFrame:
        dfs = []
        for clip_dir in glob.glob(os.path.join(self.data_path, "*/Clip*"), recursive=True):
            df = pd.read_csv(os.path.join(clip_dir, "Label.csv"))
            dfs.append(self._finalize_label_df(df, clip_dir))
        out = pd.concat(dfs, axis=0)
        return out.reset_index(drop=True)

    def _finalize_label_df(self, label_df: pd.DataFrame, clip_dir: str) -> pd.DataFrame:
        """Sliding windows of num_stacks frame paths + last-frame labels
        (reference tracknet_dataset.py:86-95)."""
        paths = os.path.join(clip_dir, "") + label_df["file name"]
        final = pd.DataFrame()
        n = label_df.shape[0]
        for i in range(self.num_stacks):
            final[f"frame{i + 1}"] = paths.iloc[i: n - (self.num_stacks - i) + 1].to_list()
        extra = label_df.iloc[self.num_stacks - 1:][
            ["visibility", "x-coordinate", "y-coordinate", "status"]].reset_index(drop=True)
        return pd.concat([final, extra], axis=1)
