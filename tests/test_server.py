"""Embedding server: concurrent clients, batched results == direct forward."""

import threading

import numpy as np

from tf_kaldi_speaker_tpu.extract.server import EmbeddingServer, embed_remote
from test_exact_long import make_model


def test_server_batches_and_matches_direct(tmp_path):
    model = make_model(tmp_path)
    server = EmbeddingServer(model, batch_size=4, max_wait_ms=50.0)
    addr = server.start_background()
    try:
        rng = np.random.RandomState(0)
        feats = [rng.randn(60 + 10 * i, 20).astype(np.float32) for i in range(6)]
        results = [None] * len(feats)

        def client(i):
            results[i] = embed_remote(addr, feats[i])

        threads = [threading.Thread(target=client, args=(i,)) for i in range(len(feats))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        for i, f in enumerate(feats):
            assert results[i] is not None, "client %d timed out" % i
            direct = server.extractor.embed_utterance(f)
            np.testing.assert_allclose(results[i], direct, rtol=2e-3, atol=2e-4)
    finally:
        server.shutdown()


def test_server_rejects_short_utterance_and_keeps_serving(tmp_path):
    """A too-short utterance gets the error sentinel (emb_dim 0) instead of
    killing the collector thread — and the next request still works."""
    import pytest

    model = make_model(tmp_path)
    server = EmbeddingServer(model, batch_size=2, max_wait_ms=10.0)
    addr = server.start_background()
    try:
        rng = np.random.RandomState(1)
        with pytest.raises(ValueError, match="could not embed"):
            embed_remote(addr, rng.randn(5, 20).astype(np.float32))
        # the daemon must still serve subsequent requests
        emb = embed_remote(addr, rng.randn(80, 20).astype(np.float32))
        assert emb.shape[0] > 0 and np.isfinite(emb).all()
    finally:
        server.shutdown()
