"""Device-side preprocessing op tests."""
import numpy as np

import jax
import jax.numpy as jnp

from vision_conglomerate_tpu.ops.preprocess import (
    letterbox_nhwc,
    normalize_images,
    random_hflip,
    resize_images,
)


def test_normalize_images():
    u8 = jnp.asarray(np.full((1, 4, 4, 3), 255, np.uint8))
    out = normalize_images(u8)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), 1.0)


def test_resize_images_matches_host_bilinear():
    rng = np.random.default_rng(0)
    u8 = (rng.uniform(size=(1, 8, 12, 3)) * 255).astype(np.uint8)
    out = resize_images(jnp.asarray(u8), (16, 24))
    assert out.shape == (1, 16, 24, 3)
    ref = jax.image.resize(jnp.asarray(u8, jnp.float32) / 255.0,
                           (1, 16, 24, 3), method="linear")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_letterbox_preserves_aspect_and_pads():
    u8 = jnp.asarray(np.full((1, 100, 200, 3), 255, np.uint8))
    out, scale, (pt, pl) = letterbox_nhwc(u8, (128, 128))
    assert out.shape == (1, 128, 128, 3)
    assert scale == 128 / 200
    nh = round(100 * scale)
    assert pt == (128 - nh) // 2 and pl == 0
    arr = np.asarray(out[0])
    np.testing.assert_allclose(arr[pt + 1, 64], 1.0)     # content
    np.testing.assert_allclose(arr[0, 64], 114 / 255.0)  # pad
    # box mapping roundtrip: center of content maps back to og center
    y_center_lb = pt + nh / 2
    assert abs((y_center_lb - pt) / scale - 50) < 1


def test_random_hflip_mirrors_boxes_and_keypoints():
    key = jax.random.PRNGKey(0)
    imgs = jnp.arange(2 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 4, 1)
    labels = jnp.asarray([
        [[0, 0.25, 0.5, 0.2, 0.2, 0.1, 0.3, 0.0]],
        [[1, 0.75, 0.5, 0.2, 0.2, 0.9, 0.3, 1.0]],
    ], jnp.float32)
    out_i, out_l = random_hflip(key, imgs, labels, prob=1.0)  # always flip
    np.testing.assert_allclose(np.asarray(out_i[0, :, :, 0]),
                               np.asarray(imgs[0, :, ::-1, 0]))
    np.testing.assert_allclose(float(out_l[0, 0, 1]), 0.75)
    np.testing.assert_allclose(float(out_l[1, 0, 1]), 0.25)
    np.testing.assert_allclose(float(out_l[0, 0, 5]), 0.9)  # kp x mirrored
    np.testing.assert_allclose(float(out_l[0, 0, 6]), 0.3)  # kp y unchanged

    _, same_l = random_hflip(key, imgs, labels, prob=0.0)  # never flip
    np.testing.assert_allclose(np.asarray(same_l), np.asarray(labels))
