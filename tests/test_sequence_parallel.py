"""Sequence parallelism: time-sharded embedding == single-device forward."""

import numpy as np

from tf_kaldi_speaker_tpu.parallel.mesh import make_mesh
from tf_kaldi_speaker_tpu.parallel.sequence_parallel import sp_embed
from test_exact_long import make_model


def test_sp_embed_matches_full_forward(tmp_path):
    from tf_kaldi_speaker_tpu.extract.extractor import Extractor

    model = make_model(tmp_path)
    ex = Extractor(model, min_chunk_size=20, chunk_size=5000, batch_size=2)
    rng = np.random.RandomState(0)
    feat = rng.randn(1000, 20).astype(np.float32)
    full = ex.embed_utterance(feat)

    mesh = make_mesh()  # 8 virtual CPU devices
    tdnn_vars = {
        "params": ex.variables["params"]["tdnn"],
        "batch_stats": ex.variables["batch_stats"].get("tdnn", {}),
    }
    sp = sp_embed(tdnn_vars, ex.params.dict, feat, mesh, node=ex.node)
    np.testing.assert_allclose(sp, full, rtol=5e-3, atol=5e-4)


def test_sp_embed_uneven_length(tmp_path):
    from tf_kaldi_speaker_tpu.extract.extractor import Extractor

    model = make_model(tmp_path)
    ex = Extractor(model, min_chunk_size=20, chunk_size=5000, batch_size=2)
    rng = np.random.RandomState(1)
    # length chosen so positions don't divide evenly across 8 devices
    feat = rng.randn(333, 20).astype(np.float32)
    full = ex.embed_utterance(feat)
    mesh = make_mesh()
    tdnn_vars = {
        "params": ex.variables["params"]["tdnn"],
        "batch_stats": ex.variables["batch_stats"].get("tdnn", {}),
    }
    sp = sp_embed(tdnn_vars, ex.params.dict, feat, mesh, node=ex.node)
    np.testing.assert_allclose(sp, full, rtol=5e-3, atol=5e-4)
