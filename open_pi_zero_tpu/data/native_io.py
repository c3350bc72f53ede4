"""ctypes binding for the native host-IO runtime (native/opz_io.cc).

Provides the C++-backed hot host loop of the data pipeline — TFRecord
shard reading with crc32c verification + threaded prefetch, and libjpeg
image decode — replacing the TensorFlow C++ runtime the reference depends
on for these (SURVEY.md §2.5). The library is compiled once with g++ on
first use and cached next to the source; every entry point has a
pure-Python fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import logging
import os
import struct
import subprocess
import threading
from typing import Iterator, List, Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SRC = os.path.join(_NATIVE_DIR, "opz_io.cc")
_LIB = os.path.join(_NATIVE_DIR, "libopz_io.so")

_lib = None
_lib_lock = threading.Lock()


def _build() -> Optional[str]:
    try:
        if os.path.exists(_LIB) and (
            not os.path.exists(_SRC)
            or os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)
        ):
            return _LIB
        if not os.path.exists(_SRC):
            return None
        # compile to a private temp file and rename atomically: concurrent
        # builders (multi-process data workers) must never CDLL a
        # half-written .so
        tmp = f"{_LIB}.{os.getpid()}.tmp"
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            "-o", tmp, _SRC, "-ljpeg", "-lpthread",
        ]
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(tmp, _LIB)
        return _LIB
    except Exception as e:  # pragma: no cover - toolchain missing
        log.warning("native opz_io build failed (%s); using python fallback", e)
        return None


def load_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        path = _build()
        if path is None:
            _lib = False
            return None
        lib = ctypes.CDLL(path)
        lib.opz_reader_open.restype = ctypes.c_void_p
        lib.opz_reader_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
        ]
        lib.opz_reader_next.restype = ctypes.c_int
        lib.opz_reader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.opz_reader_crc_errors.restype = ctypes.c_long
        lib.opz_reader_crc_errors.argtypes = [ctypes.c_void_p]
        lib.opz_reader_open_errors.restype = ctypes.c_long
        lib.opz_reader_open_errors.argtypes = [ctypes.c_void_p]
        lib.opz_buf_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.opz_reader_close.argtypes = [ctypes.c_void_p]
        lib.opz_masked_crc32c.restype = ctypes.c_uint32
        lib.opz_masked_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.opz_jpeg_decode.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.opz_jpeg_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return lib


def native_available() -> bool:
    return load_library() is not None


class TFRecordReader:
    """Iterate serialized records from TFRecord shards with N reader
    threads and a bounded prefetch queue (C++; crc-verified)."""

    def __init__(
        self,
        paths: Sequence[str],
        num_threads: int = 4,
        capacity: int = 256,
        verify_crc: bool = True,
    ):
        self.paths = [os.fspath(p) for p in paths]
        self._lib = load_library()
        self._handle = None
        self._num_threads = num_threads
        self._capacity = capacity
        self._verify = verify_crc
        self._open()

    def _open(self):
        if self._lib is None:
            return
        arr = (ctypes.c_char_p * len(self.paths))(
            *[p.encode() for p in self.paths]
        )
        self._handle = self._lib.opz_reader_open(
            arr, len(self.paths), self._num_threads, self._capacity,
            int(self._verify),
        )

    def crc_errors(self) -> int:
        if self._handle is None:
            return self._final_crc_errors
        return int(self._lib.opz_reader_crc_errors(self._handle))

    def open_errors(self) -> int:
        """Shards that could not be opened (missing/permission) — the
        native reader skips them; check this after iteration."""
        if self._handle is None:
            return self._final_open_errors
        return int(self._lib.opz_reader_open_errors(self._handle))

    def __iter__(self) -> Iterator[bytes]:
        if self._lib is None:
            yield from _py_tfrecord_iter(self.paths, self._verify)
            return
        if self._handle is None:
            self._open()  # re-iteration: fresh native reader, never a
            # silent downgrade to the CRC-less python fallback
        data = ctypes.POINTER(ctypes.c_uint8)()
        length = ctypes.c_size_t()
        try:
            while self._lib.opz_reader_next(
                self._handle, ctypes.byref(data), ctypes.byref(length)
            ):
                out = ctypes.string_at(data, length.value)
                self._lib.opz_buf_free(data)
                yield out
        finally:
            self.close()

    _final_crc_errors = 0
    _final_open_errors = 0

    def close(self):
        if self._handle is not None:
            self._final_crc_errors = int(
                self._lib.opz_reader_crc_errors(self._handle)
            )
            self._final_open_errors = int(
                self._lib.opz_reader_open_errors(self._handle)
            )
            self._lib.opz_reader_close(self._handle)
            self._handle = None

    def __del__(self):
        self.close()


def _py_tfrecord_iter(paths: List[str], verify_crc: bool) -> Iterator[bytes]:
    """Pure-Python fallback (no crc verification — python crc32c would
    dominate the loop)."""
    for p in paths:
        with open(p, "rb") as f:
            while True:
                header = f.read(12)
                if len(header) < 12:
                    break
                (length,) = struct.unpack("<Q", header[:8])
                payload = f.read(length)
                f.read(4)  # footer crc
                if len(payload) < length:
                    break
                yield payload


def masked_crc32c(data: bytes) -> Optional[int]:
    lib = load_library()
    if lib is None:
        return None
    return int(lib.opz_masked_crc32c(data, len(data)))


def decode_jpeg(data: bytes) -> np.ndarray:
    """JPEG bytes -> RGB uint8 [H, W, 3] via libjpeg; tf fallback."""
    lib = load_library()
    if lib is None:
        import tensorflow as tf

        return tf.io.decode_jpeg(data, channels=3).numpy()
    w = ctypes.c_int()
    h = ctypes.c_int()
    c = ctypes.c_int()
    buf = lib.opz_jpeg_decode(
        data, len(data), ctypes.byref(w), ctypes.byref(h), ctypes.byref(c)
    )
    if not buf:
        raise ValueError("corrupt JPEG")
    try:
        arr = np.ctypeslib.as_array(buf, shape=(h.value, w.value, c.value)).copy()
    finally:
        lib.opz_buf_free(buf)
    return arr
