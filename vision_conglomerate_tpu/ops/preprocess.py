"""Device-side input preprocessing (BASELINE.json north star: resize,
normalization and augmentation fused into XLA ops, prefetched to HBM).

The host ships uint8 NHWC frames (4x less H2D traffic than f32); everything
else — normalize, resize/letterbox, layout, augmentation — runs under jit on
device and fuses into the first conv's input pipeline.

NOTE on parity: the reference resizes with plain bilinear and does NOT
letterbox (dataset/inference_dataset.py:26-28), so `letterbox_nhwc` is an
opt-in improvement, not the parity default.
"""
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("dtype",))
def normalize_images(imgs_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 NHWC -> [0, 1] float (the /255 of reference utils/utils.py:40)."""
    return imgs_u8.astype(dtype) / jnp.asarray(255.0, dtype)


@partial(jax.jit, static_argnames=("size", "dtype"))
def resize_images(imgs_u8: jnp.ndarray, size: Tuple[int, int],
                  dtype=jnp.float32) -> jnp.ndarray:
    """uint8 NHWC -> bilinear resize to (h, w) + normalize, on device."""
    imgs = normalize_images(imgs_u8, dtype=jnp.float32)
    out = jax.image.resize(
        imgs, (imgs.shape[0], int(size[0]), int(size[1]), imgs.shape[3]),
        method="linear")
    return out.astype(dtype)


@partial(jax.jit, static_argnames=("size", "dtype"))
def letterbox_nhwc(
    imgs_u8: jnp.ndarray,
    size: Tuple[int, int],
    pad_value: float = 114.0 / 255.0,
    dtype=jnp.float32,
):
    """Aspect-preserving resize + center pad to (h, w) (YOLO letterbox).

    Returns (images, scale, (pad_top, pad_left)) so callers can map boxes
    back to the original frame: orig = (coord - pad) / scale.
    """
    b, h, w, c = imgs_u8.shape
    th, tw = int(size[0]), int(size[1])
    scale = min(th / h, tw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    imgs = normalize_images(imgs_u8, dtype=jnp.float32)
    resized = jax.image.resize(imgs, (b, nh, nw, c), method="linear")
    pad_top = (th - nh) // 2
    pad_left = (tw - nw) // 2
    out = jnp.full((b, th, tw, c), pad_value, jnp.float32)
    out = jax.lax.dynamic_update_slice(out, resized, (0, pad_top, pad_left, 0))
    return out.astype(dtype), scale, (pad_top, pad_left)


def random_hflip(
    key: jax.Array,
    imgs: jnp.ndarray,          # (B, H, W, C)
    labels: jnp.ndarray,        # (B, M, 5+) [cls, x, y, w, h, ...] normalized
    prob: float = 0.5,
):
    """Per-sample random horizontal flip with box x-coordinate mirroring.

    Device-side augmentation (the reference has none; opt-in extra). Keypoint
    extras are bbox-relative so their x is mirrored too when present.
    """
    b = imgs.shape[0]
    flip = jax.random.uniform(key, (b,)) < prob
    flipped_imgs = jnp.where(flip[:, None, None, None], imgs[:, :, ::-1, :], imgs)
    x = jnp.where(flip[:, None], 1.0 - labels[..., 1], labels[..., 1])
    new_labels = labels.at[..., 1].set(x)
    e = labels.shape[-1] - 5
    if e > 0:
        kp = new_labels[..., 5:].reshape(*labels.shape[:-1], -1, 3)
        kx = jnp.where(flip[:, None, None], 1.0 - kp[..., 0], kp[..., 0])
        kp = kp.at[..., 0].set(kx)
        new_labels = jnp.concatenate(
            [new_labels[..., :5], kp.reshape(*labels.shape[:-1], -1)], axis=-1)
    return flipped_imgs, new_labels
