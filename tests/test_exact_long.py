"""Exact long-utterance extraction: streamed stats == one giant forward."""

import json
import os

import numpy as np

from tf_kaldi_speaker_tpu.extract.extractor import Extractor
from tf_kaldi_speaker_tpu.train.trainer import Trainer
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
from test_extract_backend import TINY_CONFIG


def make_model(tmp_path):
    params = ParamsPlain(**TINY_CONFIG)
    nnet = str(tmp_path / "m" / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=8)
    t.build("train", 20, "softmax", 8)
    t.save(0)
    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(TINY_CONFIG, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("20\n")
    return str(tmp_path / "m")


def test_exact_long_matches_full_forward(tmp_path):
    model = make_model(tmp_path)
    ex = Extractor(model, min_chunk_size=20, chunk_size=5000, batch_size=2)
    rng = np.random.RandomState(0)
    feat = rng.randn(700, 20).astype(np.float32)
    # full forward via the normal path (fits within chunk_size)
    full = ex.embed_utterance(feat)
    # exact streamed path with a small chunk, forcing many accumulations
    ex.chunk_size = 128
    exact = ex.embed_long_exact(feat)
    np.testing.assert_allclose(exact, full, rtol=5e-3, atol=5e-4)


def test_exact_long_differs_from_weighted_average(tmp_path):
    # The reference's chunk-average is an approximation; the exact path is
    # our improvement. Verify they're close but not identical on long input.
    model = make_model(tmp_path)
    rng = np.random.RandomState(1)
    feat = rng.randn(900, 20).astype(np.float32)
    ex = Extractor(model, min_chunk_size=20, chunk_size=300, batch_size=2)
    approx = ex.embed_utterance(feat)  # triggers 50%-overlap averaging
    exact = ex.embed_long_exact(feat)
    assert np.linalg.norm(exact - approx) > 0
    cos = exact @ approx / (np.linalg.norm(exact) * np.linalg.norm(approx))
    assert cos > 0.9
