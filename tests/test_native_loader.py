"""Native (C++) decode+resize library tests (skipped if not built)."""
import io

import numpy as np
import pytest
from PIL import Image

from vision_conglomerate_tpu.data.native_loader import (
    NativeImageDecoder,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="libvctdata.so not built (make -C native)")


@pytest.fixture(scope="module")
def jpeg_bytes():
    rng = np.random.default_rng(0)
    img = (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=90)
    return buf.getvalue()


def test_decode_matches_pil_exactly(jpeg_bytes):
    """Same libjpeg -> bit-identical decode at native size (no resize)."""
    dec = NativeImageDecoder()
    ours = dec.decode_resize(jpeg_bytes, (64, 48))
    ref = np.asarray(Image.open(io.BytesIO(jpeg_bytes)).convert("RGB"))
    np.testing.assert_array_equal(ours, ref)


def test_resize_matches_cv2_bilinear(jpeg_bytes):
    """The fused bilinear resize uses half-pixel centers (cv2.INTER_LINEAR)."""
    cv2 = pytest.importorskip("cv2")
    dec = NativeImageDecoder()
    ours = dec.decode_resize(jpeg_bytes, (32, 24))
    full = np.asarray(Image.open(io.BytesIO(jpeg_bytes)).convert("RGB"))
    ref = cv2.resize(full, (32, 24), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert diff.max() <= 1  # rounding-mode differences only


def test_batch_decode(jpeg_bytes):
    dec = NativeImageDecoder()
    out = dec.decode_resize_batch([jpeg_bytes] * 5, (32, 32))
    assert out.shape == (5, 32, 32, 3) and out.dtype == np.uint8
    np.testing.assert_array_equal(out[0], out[4])


def test_invalid_jpeg_raises():
    dec = NativeImageDecoder()
    with pytest.raises(ValueError):
        dec.decode_resize(b"not a jpeg", (8, 8))
