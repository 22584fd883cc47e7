"""Cross-validation against the reference's OWN Kaldi reader.

The reference's dataset/kaldi_io.py is pure numpy, so (when the reference
tree is present) we can verify true interchange: arks WE write — including
compressed matrices, which the reference itself cannot write — are read
back bit-correctly by THEIR reader, and vice versa. Skipped when the
reference checkout is absent.
"""

import importlib.util
import io
import os
import sys

import numpy as np
import pytest

from tf_kaldi_speaker_tpu import kio

REF = "/root/reference/dataset/kaldi_io.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref_kaldi_io():
    spec = importlib.util.spec_from_file_location("ref_kaldi_io", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_kaldi_io"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_reference_reads_our_uncompressed_ark(tmp_path, ref_kaldi_io):
    m = np.random.RandomState(0).randn(37, 13).astype(np.float32)
    path = str(tmp_path / "a.ark")
    with open(path, "wb") as f:
        kio.write_mat(f, m, key="utt1")
    items = dict(ref_kaldi_io.read_mat_ark(path))
    np.testing.assert_array_equal(items["utt1"], m)


def test_reference_reads_our_compressed_ark(tmp_path, ref_kaldi_io):
    rng = np.random.RandomState(1)
    m = (rng.randn(200, 30) * 2 + 1).astype(np.float32)
    path = str(tmp_path / "c.ark")
    with open(path, "wb") as f:
        kio.write_mat(f, m, key="utt1", compress=True)
    theirs = dict(ref_kaldi_io.read_mat_ark(path))["utt1"]
    ours = dict(kio.read_mat_ark(path))["utt1"]
    # Decoders agree to float ULPs on OUR compressed bytes (the reference
    # divides the segment slope by 64 before multiplying; we after).
    np.testing.assert_allclose(theirs, ours, rtol=1e-6, atol=1e-6)
    # And the lossy round trip stays accurate.
    assert np.abs(theirs - m).max() < 0.05 * (m.max() - m.min())


def test_we_read_reference_written_vectors(tmp_path, ref_kaldi_io):
    v = np.random.RandomState(2).randn(19).astype(np.float32)
    path = str(tmp_path / "v.ark")
    with open(path, "wb") as f:
        ref_kaldi_io.write_vec_flt(f, v, key="k1")
    np.testing.assert_array_equal(dict(kio.read_vec_flt_ark(path))["k1"], v)


def test_we_read_reference_written_matrices(tmp_path, ref_kaldi_io):
    m = np.random.RandomState(3).randn(11, 7).astype(np.float32)
    path = str(tmp_path / "m.ark")
    with open(path, "wb") as f:
        ref_kaldi_io.write_mat(f, m, key="k1")
    np.testing.assert_array_equal(dict(kio.read_mat_ark(path))["k1"], m)


def test_we_read_reference_written_int_vectors(tmp_path, ref_kaldi_io):
    v = (np.arange(23) * 3).astype(np.int32)
    path = str(tmp_path / "i.ark")
    with open(path, "wb") as f:
        ref_kaldi_io.write_vec_int(f, v, key="a")
    np.testing.assert_array_equal(dict(kio.read_vec_int_ark(path))["a"], v)


def test_reference_partial_read_matches_ours(tmp_path, ref_kaldi_io):
    rng = np.random.RandomState(4)
    m = rng.randn(300, 24).astype(np.float32)
    path = str(tmp_path / "p.ark")
    with open(path, "wb") as f:
        kio.write_mat(f, m, key="u1", compress=True)
    offset = len("u1") + 1
    with open(path, "rb") as f:
        f.seek(offset)
        assert f.read(2) == b"\0B"
        theirs = ref_kaldi_io._read_submat_binary(f, 17, 100)
    from tf_kaldi_speaker_tpu.kio import ark

    with open(path, "rb") as f:
        f.seek(offset)
        assert f.read(2) == b"\0B"
        ours = ark._read_submat_binary(f, 17, 100)
    np.testing.assert_allclose(theirs, ours, rtol=1e-6, atol=1e-6)
