"""Host-side image IO (PIL/cv2). Device-side resize lives in ops/resize.py.

Reference: utils/utils.py:25-41 (PIL load + resize, /255 scaling). Layout is
HWC (channels-last) to match the framework's NHWC device convention — the
reference's CHW permute is a torch-ism we drop.
"""
from typing import Optional, Tuple

import numpy as np
from PIL import Image


def load_and_process_img(
    img_path: str,
    img_wh: Optional[Tuple[int, int]] = None,
    scale: bool = True,
    convert_to: str = "RGB",
) -> np.ndarray:
    """Load an image -> HWC array; optional PIL resize to (w, h); optional /255."""
    img = Image.open(img_path).convert(convert_to)
    if img_wh is not None:
        img = img.resize(img_wh)
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[..., None]
    if scale:
        arr = (arr / 255.0).astype(np.float32)
    return arr
