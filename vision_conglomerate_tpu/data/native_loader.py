"""ctypes bindings for the native host-side decode+resize library.

native/vct_data.cc provides multi-threaded libjpeg/libpng decode (format
sniffed per item) fused with resize straight into a caller-provided uint8
NHWC batch buffer — the host-runtime piece of the input pipeline for the
training path, which is input-bound on this workload (docs/PERF.md). The
reference gets this from PIL inside torch DataLoader workers
(/root/reference/utils/utils.py:32-40, /root/reference/dataset/
detection_dataset.py:31-39); here it is a first-party C++ library so decode
threads scale without Python intermediates or the GIL.

Two resize modes, matching the two consumers:
- "bilinear": half-pixel-center bilinear (cv2.INTER_LINEAR semantics) for
  the inference/video path;
- "pil": PIL-parity antialiased bicubic (uint8 inter-pass quantization like
  PIL's int16 fixed point; <=1 LSB difference) for the train-dataset path,
  selected by DetectionDataset(decode_backend="native").

The shared library is built on first use (make -C native) if g++ and the
system libjpeg/libpng are present; `native_available()` reports whether the
backend is usable without raising.
"""
import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libvctdata.so")

_RESIZE_MODES = {"bilinear": 0, "pil": 1}

_lib = None
_lib_lock = threading.Lock()
_build_attempted = False


def _try_build() -> None:
    global _build_attempted
    if _build_attempted:
        return
    _build_attempted = True
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120)
    except Exception:
        pass  # native_available() will report False


def _load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the shared library; None if unusable."""
    global _lib
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH):
            _try_build()
        if not os.path.exists(_SO_PATH):
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.vct_decode_resize_mode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.vct_decode_resize_mode.restype = ctypes.c_int
        lib.vct_decode_resize_batch_mode.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        lib.vct_decode_resize_batch_mode.restype = ctypes.c_int
        lib.vct_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.vct_probe.restype = ctypes.c_int
        _lib = lib
        return _lib


def native_available() -> bool:
    """True if the C++ decode library is built (or buildable) and loadable."""
    return _load() is not None


class NativeImageDecoder:
    """Decode JPEG/PNG bytes and resize on the host via native/vct_data.cc.

    All methods release the GIL for the duration of the C call; the batch
    path additionally fans decodes across an internal C++ thread pool
    (`n_threads` <= 0 -> hardware_concurrency).
    """

    def __init__(self, n_threads: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError(
                "libvctdata.so is not available; build it with `make -C native` "
                "(requires g++ + system libjpeg/libpng)")
        self._lib = lib
        self.n_threads = n_threads

    def probe(self, data: bytes) -> Tuple[int, int]:
        """(width, height) of an encoded image without a full decode."""
        w = ctypes.c_int()
        h = ctypes.c_int()
        if self._lib.vct_probe(data, len(data), ctypes.byref(w), ctypes.byref(h)):
            raise ValueError("not a decodable JPEG/PNG buffer")
        return w.value, h.value

    def decode_resize(
        self,
        data: bytes,
        out_wh: Union[int, Tuple[int, int]],
        resize: str = "bilinear",
    ) -> np.ndarray:
        """Decode one image and resize to (w, h) -> uint8 RGB (h, w, 3)."""
        if isinstance(out_wh, int):
            out_wh = (out_wh, out_wh)
        w, h = out_wh
        out = np.empty((h, w, 3), dtype=np.uint8)
        rc = self._lib.vct_decode_resize_mode(
            data, len(data), w, h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _RESIZE_MODES[resize])
        if rc:
            raise ValueError("not a decodable JPEG/PNG buffer")
        return out

    def decode_resize_batch(
        self,
        blobs: Sequence[bytes],
        out_wh: Union[int, Tuple[int, int]],
        resize: str = "bilinear",
        out: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Decode a batch into one contiguous (n, h, w, 3) uint8 buffer.

        Failed decodes are zero-filled (matching the C contract) and raise
        after the batch completes so one bad file doesn't strand the pool.
        `out` lets a loader reuse a pinned batch buffer across steps.
        """
        if isinstance(out_wh, int):
            out_wh = (out_wh, out_wh)
        w, h = out_wh
        n = len(blobs)
        if out is None:
            out = np.empty((n, h, w, 3), dtype=np.uint8)
        else:
            assert out.shape == (n, h, w, 3) and out.dtype == np.uint8
        ptrs = (ctypes.c_char_p * n)(*blobs)
        lens = (ctypes.c_size_t * n)(*[len(b) for b in blobs])
        failures = self._lib.vct_decode_resize_batch_mode(
            ptrs, lens, n, w, h,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.n_threads, _RESIZE_MODES[resize])
        if failures:
            raise ValueError(f"{failures}/{n} images failed to decode")
        return out


def decode_file(path: str, out_wh, resize: str = "bilinear") -> np.ndarray:
    """One-shot convenience: read + decode + resize a file."""
    with open(path, "rb") as f:
        return NativeImageDecoder().decode_resize(f.read(), out_wh, resize)
