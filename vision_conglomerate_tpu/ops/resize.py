"""Device-side resize ops (NHWC).

TPU-native replacements for the reference's `nn.Upsample` /
`F.interpolate` usage (reference: modules/common.py:110,271-272,307-308;
dataset/inference_dataset.py:26-28). Nearest up×2 / down×0.5 are exact
strided/repeat formulations (identical index semantics to
torch.nn.Upsample(mode="nearest")); the general path is jax.image.resize.
"""
from typing import Sequence, Union

import jax
import jax.numpy as jnp


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample of an NHWC tensor."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def downsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 0.5x downsample of an NHWC tensor.

    torch.nn.Upsample(scale_factor=0.5, mode="nearest") selects source index
    floor(i / 0.5) = 2*i, i.e. every even row/col.
    """
    return x[:, ::2, ::2, :]


def resize_nhwc(
    x: jnp.ndarray,
    scale: Union[float, None] = None,
    size: Union[Sequence[int], None] = None,
    method: str = "nearest",
) -> jnp.ndarray:
    """Resize NHWC tensor by `scale` or to spatial `size` (h, w)."""
    if method == "nearest":
        if scale == 2.0:
            return upsample_nearest_2x(x)
        if scale == 0.5:
            return downsample_nearest_2x(x)
    if size is None:
        assert scale is not None
        size = (int(round(x.shape[1] * scale)), int(round(x.shape[2] * scale)))
    out_shape = (x.shape[0], int(size[0]), int(size[1]), x.shape[3])
    if method == "bilinear":
        method = "linear"
    return jax.image.resize(x, out_shape, method=method)


def resize_hwc(x: jnp.ndarray, size: Sequence[int], method: str = "bilinear") -> jnp.ndarray:
    """Resize a single HWC image to (h, w)."""
    return resize_nhwc(x[None], size=size, method=method)[0]


def bilinear_resize_chw_like_torch(x: jnp.ndarray, size: Sequence[int]) -> jnp.ndarray:
    """Bilinear resize matching torch F.interpolate(align_corners=False).

    jax.image.resize(method='linear') uses half-pixel centers, the same
    convention as torch's align_corners=False, so this is a thin wrapper kept
    for intent documentation (reference: dataset/inference_dataset.py:26-28 —
    plain bilinear, aspect ratio NOT preserved, no letterboxing).
    """
    out_shape = x.shape[:-2] + (int(size[0]), int(size[1]))
    return jax.image.resize(x, out_shape, method="linear")
