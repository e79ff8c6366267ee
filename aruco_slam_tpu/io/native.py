"""ctypes bindings for the native host runtime (native/hostpipe.cpp).

Builds the shared library with g++ on first use (cached under the repo
build dir); every consumer degrades gracefully to numpy when the
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parents[2]
_SRC = _REPO / "native" / "hostpipe.cpp"
_BUILD = _REPO / "native" / "build"
_LIB_PATH = _BUILD / "libhostpipe.so"
_lock = threading.Lock()
_lib = None


def _build() -> Path:
    _BUILD.mkdir(parents=True, exist_ok=True)
    if (_LIB_PATH.exists()
            and _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime):
        return _LIB_PATH
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
         "-std=c++17", str(_SRC), "-o", str(_LIB_PATH)],
        check=True, capture_output=True)
    return _LIB_PATH


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        try:
            lib = ctypes.CDLL(str(_build()))
        except Exception:
            return None
        lib.hp_gray_resize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        lib.hp_ring_create.restype = ctypes.c_void_p
        lib.hp_ring_create.argtypes = [ctypes.c_int, ctypes.c_int64]
        lib.hp_ring_push.restype = ctypes.c_int
        lib.hp_ring_push.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64]
        lib.hp_ring_pop.restype = ctypes.c_int64
        lib.hp_ring_pop.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
        lib.hp_ring_close.argtypes = [ctypes.c_void_p]
        lib.hp_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.hp_ring_size.restype = ctypes.c_int
        lib.hp_ring_size.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def _as_u8_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def gray_resize(frame: np.ndarray, out_hw: tuple[int, int],
                swap_rb: bool = False) -> np.ndarray:
    """RGB/BGR/gray uint8 frame -> grayscale uint8 at out_hw.

    Native single-pass conversion; numpy fallback without the lib.
    """
    oh, ow = out_hw
    lib = get_lib()
    frame = np.ascontiguousarray(frame)
    ch = 1 if frame.ndim == 2 else frame.shape[2]
    if lib is not None:
        out = np.empty((oh, ow), np.uint8)
        lib.hp_gray_resize(_as_u8_ptr(frame), frame.shape[0],
                           frame.shape[1], ch, int(swap_rb),
                           _as_u8_ptr(out), oh, ow)
        return out
    # numpy fallback
    if ch == 1:
        g = frame.astype(np.float32)
    else:
        w = ([29, 150, 77] if swap_rb else [77, 150, 29])
        g = frame[..., :3].astype(np.float32) @ (np.asarray(w) / 256.0)
    ys = (np.arange(oh) * frame.shape[0] // oh)
    xs = (np.arange(ow) * frame.shape[1] // ow)
    return g[ys][:, xs].astype(np.uint8)


class FrameRing:
    """Bounded producer/consumer frame queue backed by the native ring
    (decode on a host thread overlaps device compute)."""

    def __init__(self, capacity: int, frame_bytes: int) -> None:
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native hostpipe unavailable")
        self._lib = lib
        self.frame_bytes = frame_bytes
        self._h = ctypes.c_void_p(
            lib.hp_ring_create(capacity, frame_bytes))

    def push(self, frame: np.ndarray) -> bool:
        frame = np.ascontiguousarray(frame)
        assert frame.nbytes <= self.frame_bytes
        return bool(self._lib.hp_ring_push(
            self._h, _as_u8_ptr(frame.view(np.uint8).reshape(-1)),
            frame.nbytes))

    def pop(self, shape, dtype=np.uint8):
        out = np.empty(int(np.prod(shape))
                       * np.dtype(dtype).itemsize, np.uint8)
        n = self._lib.hp_ring_pop(self._h, _as_u8_ptr(out))
        if n == 0:
            return None
        return out[:n].view(dtype).reshape(shape)

    def close(self) -> None:
        self._lib.hp_ring_close(self._h)

    def __len__(self) -> int:
        return self._lib.hp_ring_size(self._h)

    def __del__(self):
        try:
            self._lib.hp_ring_destroy(self._h)
        except Exception:
            pass


class PrefetchingFrameSource:
    """Wrap a frame iterator with a background decode thread + native
    ring: `for ts, gray in PrefetchingFrameSource(src.frames(), ...)`.
    """

    def __init__(self, frame_iter, frame_shape, capacity: int = 8):
        self.shape = frame_shape
        nbytes = int(np.prod(frame_shape)) + 8  # + timestamp
        self.ring = FrameRing(capacity, nbytes)

        def producer():
            try:
                for ts, frame in frame_iter:
                    buf = np.empty(nbytes, np.uint8)
                    buf[:8] = np.frombuffer(
                        np.float64(ts).tobytes(), np.uint8)
                    buf[8:] = frame.reshape(-1).view(np.uint8)
                    if not self.ring.push(buf):
                        break
            finally:
                self.ring.close()

        self.thread = threading.Thread(target=producer, daemon=True)
        self.thread.start()

    def __iter__(self):
        while True:
            buf = self.ring.pop((int(np.prod(self.shape)) + 8,))
            if buf is None:
                return
            ts = float(np.frombuffer(buf[:8].tobytes(), np.float64)[0])
            yield ts, buf[8:].reshape(self.shape)
