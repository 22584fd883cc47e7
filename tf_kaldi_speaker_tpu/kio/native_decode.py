"""ctypes bridge to the native ark decode core (tf_kaldi_speaker_tpu/native).

Compiles the shared library on first use with g++ (cached next to the
source). Falls back gracefully: every entry point returns None when the
native core is unavailable, and callers use the pure-numpy codec instead.
Set ``TFKS_DISABLE_NATIVE=1`` to force the numpy path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_MAX_COLS = 4096  # generous bound on feature dim for the scratch buffer

_lib = None
_lib_lock = threading.Lock()
_load_failed = False
_tls = threading.local()


def build_native_lib(src_name: str, so_name: str) -> ctypes.CDLL:
    """Compile (when stale) and dlopen one of the native cores in
    ``tf_kaldi_speaker_tpu/native``. Shared by every ctypes bridge (this
    module, backend/decoder.py, scripts/build_native.sh) so the build
    recipe lives in exactly one place. Raises on any failure — callers
    wrap it in their own availability caching. ``TFKS_DISABLE_NATIVE=1``
    raises too (forces the numpy/pure-Python fallbacks)."""
    if os.environ.get("TFKS_DISABLE_NATIVE") == "1":
        raise RuntimeError("native cores disabled via TFKS_DISABLE_NATIVE")
    src_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native"
    )
    src = os.path.join(src_dir, src_name)
    so = os.path.join(src_dir, so_name)
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", src, "-o", so],
            check=True,
            capture_output=True,
        )
    return ctypes.CDLL(so)


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _load_failed
    try:
        lib = build_native_lib("ark_decoder.cpp", "libarkdecode.so")
        lib.tfks_decode_submat.restype = ctypes.c_int
        lib.tfks_decode_submat.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.tfks_close_all.restype = ctypes.c_int
        lib.tfks_read_batch_codes.restype = ctypes.c_int
        lib.tfks_read_batch_codes.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
        ]
        lib.tfks_crc32c.restype = ctypes.c_uint32
        lib.tfks_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.tfks_decode_batch.restype = ctypes.c_int
        lib.tfks_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
        ]
        return lib
    except Exception:
        _load_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is None and not _load_failed:
            _lib = _build_and_load()
    return _lib


def read_submat_fast(
    filename: str, offset: int, start: int, length: int
) -> Optional[np.ndarray]:
    """Decode rows [start, start+length) of the matrix at filename:offset.

    Returns a float32 [length, cols] array, or None if the native core is
    unavailable or reports a recoverable error (caller falls back to numpy).
    """
    lib = _get_lib()
    if lib is None or start is None or length is None or length <= 0:
        return None
    buf = getattr(_tls, "buf", None)
    if buf is None or buf.size < length * _MAX_COLS:
        buf = np.empty(max(length, 2048) * _MAX_COLS, dtype=np.float32)
        _tls.buf = buf
    cols = lib.tfks_decode_submat(
        filename.encode(),
        int(offset),
        int(start),
        int(length),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.size,
    )
    if cols <= 0:
        return None
    return buf[: length * cols].reshape(length, cols).copy()


def decode_batch_fast(
    items, out: np.ndarray, num_threads: int = 4
) -> bool:
    """Decode a batch of (filename, offset, start, length) into ``out``
    [B, L, D] float32 with one native call + internal thread pool.

    Returns False (out untouched or partially written) if the native core is
    unavailable or errors; callers fall back to per-row decoding.
    """
    lib = _get_lib()
    if lib is None or not items:
        return False
    b, stride_rows, cols = out.shape
    assert len(items) <= b
    paths = (ctypes.c_char_p * len(items))(
        *[it[0].encode() for it in items]
    )
    offsets = (ctypes.c_int64 * len(items))(*[int(it[1]) for it in items])
    starts = (ctypes.c_int32 * len(items))(*[int(it[2]) for it in items])
    lengths = (ctypes.c_int32 * len(items))(*[int(it[3]) for it in items])
    r = lib.tfks_decode_batch(
        paths, offsets, starts, lengths,
        len(items), stride_rows, cols,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    return r == cols


def read_batch_codes_fast(
    items, codes_out: np.ndarray, headers_out: np.ndarray, num_threads: int = 4
) -> bool:
    """Batch raw-code read: items = [(filename, offset, start, length)],
    codes_out [B, L, D] uint8, headers_out [B, 4, D] float32."""
    lib = _get_lib()
    if lib is None or not items:
        return False
    b, stride_rows, cols = codes_out.shape
    assert headers_out.shape == (b, 4, cols)
    paths = (ctypes.c_char_p * len(items))(*[it[0].encode() for it in items])
    offsets = (ctypes.c_int64 * len(items))(*[int(it[1]) for it in items])
    starts = (ctypes.c_int32 * len(items))(*[int(it[2]) for it in items])
    lengths = (ctypes.c_int32 * len(items))(*[int(it[3]) for it in items])
    r = lib.tfks_read_batch_codes(
        paths, offsets, starts, lengths,
        len(items), stride_rows, cols,
        codes_out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        headers_out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    return r == cols


def close_all() -> None:
    lib = _get_lib()
    if lib is not None:
        lib.tfks_close_all()


def native_available() -> bool:
    return _get_lib() is not None


def crc32c_fast(data: bytes) -> Optional[int]:
    """Unmasked CRC32C via the native core (memory-bandwidth rate), or None
    when it is unavailable (caller falls back to the pure-Python table)."""
    lib = _get_lib()
    if lib is None:
        return None
    return int(lib.tfks_crc32c(data, len(data)))
