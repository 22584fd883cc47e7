"""Robustness fuzz: corrupted/truncated ark bytes must fail CLEANLY.

The reference's kaldi_io (dataset/kaldi_io.py) makes no promises on
malformed input (struct.unpack errors, silent short reads); a production
codec should never hang, crash the interpreter, or allocate absurdly on
bad bytes. Contract pinned here: every read either returns a well-formed
array or raises a normal exception (codec errors, ValueError/EOFError/
OSError/struct.error/MemoryError) — single-byte flips, truncations, and
wild dimension fields included.
"""

import io
import struct

import numpy as np
import pytest

from tf_kaldi_speaker_tpu.kio import ark

OK_ERRORS = (
    ark.UnknownMatrixHeader,
    ark.UnknownVectorHeader,
    ark.BadInputFormat,
    ark.UnsupportedDataType,
    ValueError,
    EOFError,
    OSError,
    MemoryError,
    struct.error,
)


def _mat_bytes(compress: bool) -> bytes:
    rng = np.random.RandomState(0)
    buf = io.BytesIO()
    ark.write_mat(buf, rng.randn(20, 13).astype(np.float32), key="utt1",
                  compress=compress)
    return buf.getvalue()


def _read_all(data: bytes):
    for _key, mat in ark.read_mat_ark(io.BytesIO(data)):
        np.isfinite(mat).all()  # force full decode
        _ = mat.shape


@pytest.mark.parametrize("compress", [False, True])
def test_truncations_fail_cleanly(compress):
    data = _mat_bytes(compress)
    # every truncation point after the key: clean error or clean EOF stop
    for cut in range(5, len(data), 7):
        try:
            _read_all(data[:cut])
        except OK_ERRORS:
            pass


@pytest.mark.parametrize("compress", [False, True])
def test_byte_flips_fail_cleanly(compress):
    data = _mat_bytes(compress)
    rng = np.random.RandomState(1)
    for trial in range(200):
        pos = int(rng.randint(0, len(data)))
        corrupted = bytearray(data)
        corrupted[pos] ^= 1 << int(rng.randint(0, 8))
        try:
            _read_all(bytes(corrupted))
        except OK_ERRORS:
            pass


def test_wild_dims_do_not_allocate_the_moon():
    """A dimension field of ~2^31 must not be trusted ahead of the actual
    payload length: the decode must raise, not attempt a 100 GB array."""
    data = bytearray(_mat_bytes(False))
    # header: 'utt1 \0B FM \4 <rows:i32> \4 <cols:i32>'; rows int starts
    # after 'utt1 \0BFM \x04' = 5 + 2 + 3 + 1
    rows_off = data.index(b"FM ") + 4
    data[rows_off:rows_off + 4] = struct.pack("<i", 2**30)
    with pytest.raises(OK_ERRORS):
        _read_all(bytes(data))


def test_negative_dims_fail_cleanly():
    data = bytearray(_mat_bytes(False))
    rows_off = data.index(b"FM ") + 4
    data[rows_off:rows_off + 4] = struct.pack("<i", -5)
    with pytest.raises(OK_ERRORS):
        _read_all(bytes(data))


def _vec_bytes() -> bytes:
    buf = io.BytesIO()
    ark.write_vec_flt(buf, np.arange(13, dtype=np.float32), key="utt1")
    return buf.getvalue()


def _read_all_vec(data: bytes):
    for _key, vec in ark.read_vec_flt_ark(io.BytesIO(data)):
        np.isfinite(vec).all()
        _ = vec.shape


def test_vector_truncation_raises_not_truncates():
    """A truncated float-vector payload must raise, never silently return
    fewer elements than the dim field promises (frombuffer without count
    accepts whatever bytes are present)."""
    data = _vec_bytes()
    for cut in (len(data) - 8, len(data) - 1):
        with pytest.raises(OK_ERRORS):
            _read_all_vec(data[:cut])


def test_vector_wild_and_negative_dims_fail_cleanly():
    for wild in (2 ** 20, -5):
        data = bytearray(_vec_bytes())
        dim_off = data.index(b"FV ") + 4  # past 'FV ' and the \4 marker
        data[dim_off:dim_off + 4] = struct.pack("<i", wild)
        with pytest.raises(OK_ERRORS):
            _read_all_vec(bytes(data))


def test_vector_byte_flips_fail_cleanly():
    data = _vec_bytes()
    rng = np.random.RandomState(2)
    for _trial in range(100):
        pos = int(rng.randint(0, len(data)))
        corrupted = bytearray(data)
        corrupted[pos] ^= 1 << int(rng.randint(0, 8))
        try:
            _read_all_vec(bytes(corrupted))
        except OK_ERRORS:
            pass
