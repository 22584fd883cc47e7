"""Kaldi I/O codec tests: round trips, compressed matrices, partial reads.

Golden-file behavior is pinned with hand-constructed binary fixtures per the
public Kaldi format, plus round-trip properties (the reference had no such
tests; SURVEY.md §4 calls for them).
"""

import io
import os
import struct

import numpy as np
import pytest

from tf_kaldi_speaker_tpu import kio
from tf_kaldi_speaker_tpu.kio import ark
from tf_kaldi_speaker_tpu.kio.native_decode import native_available, read_submat_fast
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir


def test_mat_roundtrip_float32():
    m = np.random.RandomState(0).randn(17, 13).astype(np.float32)
    buf = io.BytesIO()
    kio.write_mat(buf, m, key="utt1")
    buf.seek(0)
    items = list(kio.read_mat_ark(buf))
    assert len(items) == 1
    key, got = items[0]
    assert key == "utt1"
    np.testing.assert_array_equal(got, m)


def test_mat_roundtrip_float64():
    m = np.random.RandomState(1).randn(5, 3)
    buf = io.BytesIO()
    kio.write_mat(buf, m)
    buf.seek(0)
    np.testing.assert_array_equal(kio.read_mat(buf), m)


def test_mat_golden_bytes():
    # Hand-assembled FM matrix [[1, 2], [3, 4]] per the Kaldi binary format.
    raw = (
        b"\0B" + b"FM " + b"\x04" + struct.pack("<I", 2) + b"\x04" + struct.pack("<I", 2)
        + np.array([[1, 2], [3, 4]], dtype=np.float32).tobytes()
    )
    got = kio.read_mat(io.BytesIO(raw))
    np.testing.assert_array_equal(got, np.array([[1, 2], [3, 4]], dtype=np.float32))


def test_ascii_matrix():
    got = kio.read_mat(io.BytesIO(b" [\n1 2 3\n4 5 6 ]\n"))
    np.testing.assert_array_equal(got, np.array([[1, 2, 3], [4, 5, 6]], dtype=np.float32))


def test_compressed_roundtrip_accuracy():
    rng = np.random.RandomState(2)
    m = (rng.randn(300, 30) * 3 + 1).astype(np.float32)
    buf = io.BytesIO()
    kio.write_mat(buf, m, compress=True)
    buf.seek(0)
    got = kio.read_mat(buf)
    assert got.shape == m.shape
    # Kaldi compression is lossy; resolution is bounded by the segment widths.
    err = np.abs(got - m)
    scale = m.max() - m.min()
    assert err.max() < 0.05 * scale
    assert err.mean() < 0.005 * scale


def test_compressed_constant_matrix():
    m = np.full((10, 4), 3.25, dtype=np.float32)
    buf = io.BytesIO()
    kio.write_mat(buf, m, compress=True)
    buf.seek(0)
    got = kio.read_mat(buf)
    np.testing.assert_allclose(got, m, atol=1e-3)


def test_compressed_submat_matches_full_read(tmp_path):
    rng = np.random.RandomState(3)
    m = rng.randn(257, 24).astype(np.float32)
    path = str(tmp_path / "feats.ark")
    with open(path, "wb") as f:
        kio.write_mat(f, m, key="u1", compress=True)
    with open(path, "rb") as f:
        kio.read_key(f)
        assert f.read(2) == b"\0B"
        full = ark._read_mat_binary(f)
    for start, length in [(0, 257), (5, 100), (200, 57), (256, 1)]:
        with open(path, "rb") as f:
            kio.read_key(f)
            assert f.read(2) == b"\0B"
            sub = ark._read_submat_binary(f, start, length)
        np.testing.assert_allclose(sub, full[start : start + length], atol=1e-6)


def test_uncompressed_submat_read(tmp_path):
    m = np.random.RandomState(4).randn(50, 7).astype(np.float32)
    path = str(tmp_path / "f.ark")
    with open(path, "wb") as f:
        kio.write_mat(f, m, key="u1")
    with open(path, "rb") as f:
        kio.read_key(f)
        assert f.read(2) == b"\0B"
        sub = ark._read_submat_binary(f, 10, 20)
    np.testing.assert_array_equal(sub, m[10:30])


def test_vec_flt_roundtrip():
    v = np.random.RandomState(5).randn(40).astype(np.float32)
    buf = io.BytesIO()
    kio.write_vec_flt(buf, v, key="k")
    buf.seek(0)
    items = dict(kio.read_vec_flt_ark(buf))
    np.testing.assert_array_equal(items["k"], v)


def test_vec_int_roundtrip():
    v = np.arange(23, dtype=np.int32) * 7 - 3
    buf = io.BytesIO()
    kio.write_vec_int(buf, v, key="a1")
    buf.seek(0)
    items = dict(kio.read_vec_int_ark(buf))
    np.testing.assert_array_equal(items["a1"], v)


def test_post_roundtrip():
    post = [[(1, 0.5), (2, 0.5)], [(3, 1.0)]]
    buf = io.BytesIO()
    kio.write_post(buf, post, key="p1")
    buf.seek(0)
    items = dict(kio.read_post_ark(buf))
    got = items["p1"]
    assert len(got) == 2
    assert got[0][0][0] == 1 and abs(got[0][0][1] - 0.5) < 1e-7
    assert got[1][0][0] == 3


def test_feature_reader_segment_vs_slice(fake_data):
    r = kio.FeatureReader(fake_data["data"])
    with open(fake_data["feats_scp"]) as f:
        segments = [line.strip() for line in f]
    for seg in segments[:6]:
        full, _ = r.read(seg)
        part, start = r.read_segment(seg, length=50, shuffle=True)
        assert part.shape[0] == 50
        np.testing.assert_allclose(part, full[start : start + 50], atol=1e-6)
    r.close()


def test_feature_reader_dim(fake_data):
    r = kio.FeatureReader(fake_data["data"])
    assert r.dim == 24
    r.close()


def test_feature_reader_v2(tmp_path):
    d = make_fake_data_dir(
        str(tmp_path / "mt"), num_speakers=3, utts_per_speaker=2, with_vad_ali=True
    )
    r = kio.FeatureReaderV2(d["data"], d["ali_dir"], left_context=4, right_context=2)
    with open(d["feats_scp"]) as f:
        utt = f.readline().split(" ")[0]
    mat, vad, ali, start = r.read_segment(utt, length=100, shuffle=True)
    assert mat.shape[0] == 100 + 4 + 2
    assert vad.shape[0] == 100 and ali.shape[0] == 100
    # Context expansion tiles edge frames when the chunk touches a boundary.
    mat0, vad0, ali0, _ = r.read_segment(utt, length=50, start=0)
    np.testing.assert_allclose(mat0[0], mat0[1], atol=1e-6)  # left tile
    r.close()


def test_rspecifier_pipe(tmp_path):
    m = np.random.RandomState(6).randn(8, 4).astype(np.float32)
    path = str(tmp_path / "x.ark")
    with open(path, "wb") as f:
        kio.write_mat(f, m, key="u1")
    items = dict(kio.read_mat_ark("ark:cat %s |" % path))
    np.testing.assert_array_equal(items["u1"], m)


def test_scp_offset_read(tmp_path, fake_data):
    with open(fake_data["feats_scp"]) as f:
        line = f.readline().strip()
    _, rxfile = line.split(" ")
    mat = kio.read_mat(rxfile)
    assert mat.ndim == 2 and mat.shape[1] == 24


@pytest.mark.skipif(not native_available(), reason="native core unavailable")
def test_native_decode_matches_numpy(tmp_path):
    rng = np.random.RandomState(7)
    m = (rng.randn(300, 30) * 2).astype(np.float32)
    for compress in (True, False):
        path = str(tmp_path / ("n%d.ark" % compress))
        with open(path, "wb") as f:
            kio.write_mat(f, m, key="u1", compress=compress)
        offset = len("u1") + 1
        for start, length in [(0, 300), (17, 100), (299, 1)]:
            fast = read_submat_fast(path, offset, start, length)
            assert fast is not None
            with open(path, "rb") as f:
                kio.read_key(f)
                assert f.read(2) == b"\0B"
                ref = ark._read_submat_binary(f, start, length)
            np.testing.assert_allclose(fast, ref, atol=1e-6)
