"""Extraction + backend tests: CMVN/VAD parity, masked-batch exactness,
full train→extract→score e2e on synthetic data."""

import os
import subprocess
import sys

import numpy as np
import pytest

from tf_kaldi_speaker_tpu.backend.metrics import (
    compute_cos_pairwise_eer,
    compute_eer,
    min_dcf08,
    min_dcf10,
)
from tf_kaldi_speaker_tpu.backend.scoring import (
    LDA,
    cosine_score_trials,
    length_norm,
    speaker_means,
    subtract_global_mean,
)
from tf_kaldi_speaker_tpu.ops.cmvn import sliding_cmvn, sliding_cmvn_jax
from tf_kaldi_speaker_tpu.ops.vad import compute_vad_energy, select_voiced_frames


def test_sliding_cmvn_reference_window():
    # Window larger than T: global mean subtraction.
    x = np.random.RandomState(0).randn(50, 4).astype(np.float32)
    out = sliding_cmvn(x, window=300)
    np.testing.assert_allclose(out, x - x.mean(0), atol=1e-5)


def test_sliding_cmvn_bruteforce():
    rng = np.random.RandomState(1)
    x = rng.randn(200, 3).astype(np.float32)
    window, got = 50, sliding_cmvn(np.copy(x), window=50)
    for t in [0, 10, 100, 150, 199]:
        start = t - window // 2
        end = start + window
        if start < 0:
            end -= start
            start = 0
        if end > 200:
            start -= end - 200
            end = 200
            start = max(start, 0)
        np.testing.assert_allclose(
            got[t], x[t] - x[start:end].mean(0), atol=1e-4, err_msg=str(t)
        )


def test_sliding_cmvn_jax_matches_numpy():
    import jax.numpy as jnp

    x = np.random.RandomState(2).randn(2, 120, 5).astype(np.float32)
    got = np.asarray(sliding_cmvn_jax(jnp.asarray(x), window=40))
    for b in range(2):
        np.testing.assert_allclose(got[b], sliding_cmvn(x[b], window=40), atol=1e-4)


def test_vad_and_selection():
    rng = np.random.RandomState(3)
    x = rng.randn(100, 10).astype(np.float32)
    x[:50, 0] = 20.0   # high energy
    x[50:, 0] = -20.0  # silence
    vad = compute_vad_energy(x)
    assert vad[:50].all() and not vad[50:].any()
    kept = select_voiced_frames(x, vad)
    assert kept.shape[0] == 50
    # context voting smooths isolated flips
    x[25, 0] = -20.0
    vad2 = compute_vad_energy(x, frames_context=2, proportion_threshold=0.6)
    assert vad2[25] == 1.0


def test_eer_metrics_sanity():
    rng = np.random.RandomState(4)
    target = rng.randn(500) + 2.0
    nontarget = rng.randn(500)
    scores = np.concatenate([target, nontarget])
    labels = np.concatenate([np.ones(500), np.zeros(500)])
    eer, _ = compute_eer(scores, labels)
    assert 0.05 < eer < 0.3
    assert 0 <= min_dcf10(scores, labels) <= 1.0
    assert min_dcf08(scores, labels) < 0.1 * 10  # unnormalized SRE08 cost
    # perfect separation -> 0 EER
    eer0, _ = compute_eer(np.concatenate([np.ones(10), np.zeros(10)]),
                          np.concatenate([np.ones(10), np.zeros(10)]))
    assert eer0 < 0.05
    # min_dcf threshold is a usable decision point: applying it reproduces
    # the minimum cost (sid/compute_min_dcf.py returns a threshold, not an
    # index)
    from tf_kaldi_speaker_tpu.backend.metrics import compute_min_dcf
    p_target = 0.01
    dcf, thr = compute_min_dcf(scores, labels, p_target=p_target)
    miss = np.mean(scores[labels == 1] <= thr)
    fa = np.mean(scores[labels == 0] > thr)
    cost = (miss * p_target + fa * (1 - p_target)) / min(p_target, 1 - p_target)
    np.testing.assert_allclose(cost, dcf, rtol=1e-9)


def test_cos_pairwise_eer_separable():
    rng = np.random.RandomState(5)
    means = rng.randn(4, 16) * 5
    embs = np.concatenate([means[i] + 0.1 * rng.randn(20, 16) for i in range(4)])
    labels = np.repeat(np.arange(4), 20)
    assert compute_cos_pairwise_eer(embs, labels) < 0.05


def test_length_norm_and_mean():
    x = np.random.RandomState(6).randn(10, 8)
    y = length_norm(x)
    np.testing.assert_allclose(np.linalg.norm(y, axis=1), np.sqrt(8), rtol=1e-9)
    centered, mean = subtract_global_mean(x)
    np.testing.assert_allclose(centered.mean(0), 0, atol=1e-12)


def test_lda_improves_separation():
    rng = np.random.RandomState(7)
    n_class, per = 10, 30
    means = rng.randn(n_class, 20) * 3
    noise_dir = rng.randn(20, 20)
    x = np.concatenate(
        [means[i] + rng.randn(per, 20) @ noise_dir * 0.3 for i in range(n_class)]
    )
    labels = np.repeat(np.arange(n_class), per)
    lda = LDA(dim_out=8).fit(x, labels)
    proj = lda.transform_vecs(x)
    assert proj.shape == (n_class * per, 8)
    eer_before = compute_cos_pairwise_eer(x, labels)
    eer_after = compute_cos_pairwise_eer(proj, labels)
    assert eer_after <= eer_before + 0.02


def test_lda_matches_kaldi_invariants():
    """ivector-compute-lda (--total-covariance-factor=0): the fitted
    transform leaves the projected within-class covariance EXACTLY unit and
    the projected between-class covariance diagonal with the top-k
    eigenvalues in descending order; no further row rescaling."""
    rng = np.random.RandomState(11)
    n_class, per, dim, k = 12, 25, 20, 8
    means = rng.randn(n_class, dim) * 2
    x = np.concatenate([means[i] + rng.randn(per, dim) for i in range(n_class)])
    labels = np.repeat(np.arange(n_class), per)
    lda = LDA(dim_out=k).fit(x, labels)
    A = lda.transform

    xc = x - x.mean(0)
    within = np.zeros((dim, dim))
    between = np.zeros((dim, dim))
    for c in range(n_class):
        xs = xc[labels == c]
        mu = xs.mean(0)
        within += (xs - mu).T @ (xs - mu)
        between += len(xs) * np.outer(mu, mu)
    within /= len(x)
    between /= len(x)

    np.testing.assert_allclose(A @ within @ A.T, np.eye(k), atol=1e-8)
    pb = A @ between @ A.T
    np.testing.assert_allclose(pb, np.diag(np.diag(pb)), atol=1e-8)
    d = np.diag(pb)
    assert (np.diff(d) <= 1e-9).all()  # descending
    # top-k generalized eigenvalues of (between, within)
    wvals, wvecs = np.linalg.eigh(within)
    wh = wvecs @ np.diag(wvals**-0.5) @ wvecs.T
    gev = np.sort(np.linalg.eigvalsh(wh @ between @ wh))[::-1][:k]
    np.testing.assert_allclose(d, gev, rtol=1e-8)


def test_speaker_means_and_trials():
    keys = ["a1", "a2", "b1"]
    embs = np.array([[1.0, 0], [3.0, 0], [0, 2.0]])
    utt2spk = {"a1": "A", "a2": "A", "b1": "B"}
    spks, means, counts = speaker_means(keys, embs, utt2spk)
    assert spks == ["A", "B"] and counts == {"A": 2, "B": 1}
    np.testing.assert_allclose(means[0], [2.0, 0])
    scores = cosine_score_trials(
        {"A": means[0], "B": means[1]},
        {"a1": embs[0], "b1": embs[2]},
        [("A", "a1"), ("A", "b1"), ("B", "b1")],
    )
    np.testing.assert_allclose(scores, [1.0, 0.0, 1.0], atol=1e-12)


# ----------------------------------------------------------------------
# End-to-end: train a tiny model via the CLI, extract, score.
# ----------------------------------------------------------------------

TINY_CONFIG = {
    "seed": 0,
    "network_type": "tdnn",
    "tdnn_layer_size": 32,
    "num_nodes_pooling_layer": 64,
    "num_nodes_last_layer": 32,
    "pooling_type": "statistics_pooling",
    "embedding_node": "tdnn6_dense",
    "loss_func": "softmax",
    "learning_rate": 0.1,
    "optimizer": "momentum",
    "momentum": 0.9,
    "weight_l2_regularizer": 1e-4,
    "batchnorm_momentum": 0.9,
    "num_epochs": 3,
    "num_steps_per_epoch": 25,
    "reduce_lr_epochs": 2,
    "early_stop_epochs": 6,
    "min_learning_rate": 1e-5,
    "show_training_progress": 10,
    "keep_checkpoint_max": 3,
    "save_checkpoints_steps": 25,
    "valid_max_iterations": 3,
    "num_parallel_datasets": 2,
    "max_queue_size": 6,
    "num_speakers_per_batch": 8,
    "num_segments_per_speaker": 1,
    "min_segment_len": 64,
    "max_segment_len": 96,
    "batch_type": "softmax",
}


@pytest.mark.slow
def test_cli_train_extract_score(tmp_path):
    import json

    from tf_kaldi_speaker_tpu.cli import extract as extract_cli
    from tf_kaldi_speaker_tpu.cli import train as train_cli
    from tf_kaldi_speaker_tpu.kio import read_vec_flt_ark
    from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

    train_d = make_fake_data_dir(
        str(tmp_path / "train"), num_speakers=8, utts_per_speaker=6, dim=20,
        min_len=100, max_len=200, seed=0,
    )
    valid_d = make_fake_data_dir(
        str(tmp_path / "valid"), num_speakers=8, utts_per_speaker=3, dim=20,
        min_len=100, max_len=200, seed=1,
    )
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(TINY_CONFIG, f)
    model_dir = str(tmp_path / "exp")

    rc = train_cli.main([
        "--config", cfg_path,
        train_d["data"], train_d["spklist"],
        valid_d["data"], valid_d["spklist"],
        model_dir,
    ])
    assert rc == 0
    nnet = os.path.join(model_dir, "nnet")
    assert os.path.exists(os.path.join(nnet, "checkpoint"))
    assert os.path.exists(os.path.join(nnet, "valid_loss"))
    assert os.path.exists(os.path.join(nnet, "learning_rate"))
    assert os.path.isdir(os.path.join(model_dir, "codes"))

    out_ark = str(tmp_path / "xvector.ark")
    rc = extract_cli.main([
        "--min-chunk-size", "10", model_dir,
        "ark:" + os.path.join(train_d["data"], "feats.ark"),
        "ark:" + out_ark,
    ])
    assert rc == 0
    embs = dict(read_vec_flt_ark(out_ark))
    assert len(embs) == 48  # 8 spk × 6 utts
    keys = sorted(embs)
    X = np.stack([embs[k] for k in keys])
    labels = np.array([int(k[3:6]) for k in keys])
    eer = compute_cos_pairwise_eer(X, labels)
    # Synthetic data is linearly separable; a briefly-trained tiny model
    # must do far better than chance (~0.5).
    assert eer < 0.25, eer


def test_extractor_masked_batch_equals_single(tmp_path):
    """Padding+mask in a bucketed batch must equal per-utterance forward."""
    import json

    from tf_kaldi_speaker_tpu.extract.extractor import Extractor
    from tf_kaldi_speaker_tpu.train.trainer import Trainer
    from tf_kaldi_speaker_tpu.utils.params import ParamsPlain

    params = ParamsPlain(**TINY_CONFIG)
    nnet = str(tmp_path / "m" / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=8)
    t.build("train", 20, "softmax", 8)
    t.save(0)
    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(TINY_CONFIG, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("20\n")

    ex = Extractor(str(tmp_path / "m"), min_chunk_size=10, batch_size=4)
    rng = np.random.RandomState(8)
    utts = {"u%d" % i: rng.randn(40 + 13 * i, 20).astype(np.float32) for i in range(6)}
    batched = dict(ex.embed_stream(iter(utts.items())))
    for k, f in utts.items():
        single = ex.embed_utterance(f)
        np.testing.assert_allclose(batched[k], single, rtol=2e-3, atol=2e-4)

    # chunked long-utterance path
    long_feat = rng.randn(260, 20).astype(np.float32)
    ex2 = Extractor(str(tmp_path / "m"), min_chunk_size=10, chunk_size=100, batch_size=4)
    emb = ex2.embed_utterance(long_feat)
    assert emb.shape == (32,) and np.isfinite(emb).all()


def test_extractor_sharded_over_mesh_matches_single_device(tmp_path):
    """DP extraction over the 8-device mesh == 1-device mesh exactly
    (SURVEY §2.5: one sharded program replaces the nj extraction jobs)."""
    import json

    import jax

    from tf_kaldi_speaker_tpu.extract.extractor import Extractor
    from tf_kaldi_speaker_tpu.parallel.mesh import make_mesh
    from tf_kaldi_speaker_tpu.train.trainer import Trainer
    from tf_kaldi_speaker_tpu.utils.params import ParamsPlain

    params = ParamsPlain(**TINY_CONFIG)
    nnet = str(tmp_path / "m" / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=8)
    t.build("train", 20, "softmax", 8)
    t.save(0)
    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(TINY_CONFIG, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("20\n")

    rng = np.random.RandomState(9)
    # 11 utts: fills one 8-wide sharded batch + a partial bucket flush;
    # one long utterance exercises the batch-of-1 chunk path under sharding.
    utts = {"u%02d" % i: rng.randn(40 + 9 * i, 20).astype(np.float32) for i in range(11)}
    utts["long"] = rng.randn(260, 20).astype(np.float32)

    ex1 = Extractor(str(tmp_path / "m"), min_chunk_size=10, chunk_size=100,
                    batch_size=8, mesh=make_mesh(jax.devices()[:1]))
    ex8 = Extractor(str(tmp_path / "m"), min_chunk_size=10, chunk_size=100,
                    batch_size=8, mesh=make_mesh(jax.devices()))
    assert len(ex8.mesh.devices.flatten()) == 8
    out1 = dict(ex1.embed_stream(iter(utts.items())))
    out8 = dict(ex8.embed_stream(iter(utts.items())))
    assert sorted(out1) == sorted(out8) == sorted(utts)
    for k in utts:
        np.testing.assert_allclose(out1[k], out8[k], rtol=1e-5, atol=1e-6)


def test_extractor_normalize_contract(tmp_path):
    """normalize=True applies the reference's FINAL L2 norm on every path
    (short, chunk-average long, exact long) — reference extract.py:85-93."""
    import json

    from tf_kaldi_speaker_tpu.extract.extractor import Extractor
    from tf_kaldi_speaker_tpu.train.trainer import Trainer
    from tf_kaldi_speaker_tpu.utils.params import ParamsPlain

    params = ParamsPlain(**TINY_CONFIG)
    nnet = str(tmp_path / "m" / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=8)
    t.build("train", 20, "softmax", 8)
    t.save(0)
    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(TINY_CONFIG, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("20\n")

    rng = np.random.RandomState(3)
    ex = Extractor(str(tmp_path / "m"), min_chunk_size=10, chunk_size=100,
                   batch_size=4, normalize=True)
    short = ex.embed_utterance(rng.randn(60, 20).astype(np.float32))
    np.testing.assert_allclose(np.linalg.norm(short), 1.0, rtol=1e-5)
    long_avg = ex.embed_utterance(rng.randn(260, 20).astype(np.float32))
    np.testing.assert_allclose(np.linalg.norm(long_avg), 1.0, rtol=1e-5)
    exact = ex.embed_long_exact(rng.randn(300, 20).astype(np.float32))
    np.testing.assert_allclose(np.linalg.norm(exact), 1.0, rtol=1e-5)

    # normalize=False keeps raw embeddings (no hidden normalization)
    ex_raw = Extractor(str(tmp_path / "m"), min_chunk_size=10,
                       chunk_size=100, batch_size=4)
    raw = ex_raw.embed_utterance(rng.randn(60, 20).astype(np.float32))
    assert abs(np.linalg.norm(raw) - 1.0) > 1e-3


def test_exact_long_guards(tmp_path):
    """embed_long_exact raises clear errors for too-short inputs instead of
    crashing inside jit."""
    import json

    import pytest

    from tf_kaldi_speaker_tpu.extract.extractor import Extractor
    from tf_kaldi_speaker_tpu.train.trainer import Trainer
    from tf_kaldi_speaker_tpu.utils.params import ParamsPlain

    params = ParamsPlain(**TINY_CONFIG)
    nnet = str(tmp_path / "m" / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=8)
    t.build("train", 20, "softmax", 8)
    t.save(0)
    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(TINY_CONFIG, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("20\n")
    ex = Extractor(str(tmp_path / "m"), min_chunk_size=10, chunk_size=100)
    with pytest.raises(ValueError, match="too short"):
        ex.embed_long_exact(np.zeros((10, 20), np.float32))


def test_extractor_bf16_host_cast_bit_identical(tmp_path):
    """bf16 models ship features as HOST-cast bfloat16 (2 B/element over
    the host->device link); embeddings must be bit-identical to shipping
    f32 and casting on device (both casts are round-to-nearest-even)."""
    import json

    import jax

    from tf_kaldi_speaker_tpu.extract.extractor import Extractor
    from tf_kaldi_speaker_tpu.train.trainer import Trainer
    from tf_kaldi_speaker_tpu.utils.params import ParamsPlain

    cfg = dict(TINY_CONFIG, compute_dtype="bfloat16")
    params = ParamsPlain(**cfg)
    nnet = str(tmp_path / "m" / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=8)
    t.build("train", 20, "softmax", 8)
    t.save(0)
    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(cfg, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("20\n")

    ex = Extractor(str(tmp_path / "m"), min_chunk_size=10, batch_size=8)
    import ml_dtypes

    assert ex._feed_dtype == ml_dtypes.bfloat16
    rng = np.random.RandomState(3)
    utts = {"u%d" % i: rng.randn(50 + 7 * i, 20).astype(np.float32) for i in range(8)}
    got = dict(ex.embed_stream(iter(utts.items())))

    # Reference: the pre-change semantics — pad to the same bucket, ship
    # float32, let the jitted forward cast on device.
    bucket = ex._bucket_for(max(f.shape[0] for f in utts.values()))
    B = ex.batch_size
    feats = np.zeros((B, bucket, 20), np.float32)
    mask = np.zeros((B, bucket), np.float32)
    keys = list(utts)
    for i, k in enumerate(keys):
        f = utts[k]
        feats[i, : f.shape[0]] = f
        mask[i, : f.shape[0]] = 1.0
    want = np.asarray(
        ex._fwd(ex.variables, jax.device_put(feats, ex._bsh),
                jax.device_put(mask, ex._bsh))
    )
    for i, k in enumerate(keys):
        bk = ex._bucket_for(utts[k].shape[0])
        if bk != bucket:
            continue  # different bucket length -> different (valid) program
        np.testing.assert_array_equal(got[k], want[i])


def test_on_the_fly_pipe_order_matches_reference():
    """--cmvn --vad must reproduce the reference feature pipe
    (run_extract_embeddings.sh:47): CMVN over ALL frames first, then
    voiced-frame selection with VAD computed from the RAW features."""
    from tf_kaldi_speaker_tpu.cli.extract import apply_cmvn_vad
    from tf_kaldi_speaker_tpu.ops.cmvn import sliding_cmvn
    from tf_kaldi_speaker_tpu.ops.vad import (
        compute_vad_energy,
        select_voiced_frames,
    )

    rng = np.random.RandomState(0)
    T, D = 400, 20
    feats = rng.randn(T, D).astype(np.float32)
    # Loud first half, silent second half: dropping the silent frames
    # before CMVN would shift every window mean.
    feats[: T // 2, 0] += 12.0
    feats[T // 2 :, 0] -= 12.0

    got = apply_cmvn_vad(feats, cmvn=True, vad=True, cmn_window=100)
    vad = compute_vad_energy(feats)  # on RAW features (vad.scp semantics)
    want = select_voiced_frames(sliding_cmvn(feats, window=100), vad)
    assert 0 < want.shape[0] < T
    np.testing.assert_array_equal(got, want)

    # The swapped order (select, then CMVN on the survivors) is genuinely
    # different on this input — the test has discriminative power.
    swapped = sliding_cmvn(select_voiced_frames(feats, vad), window=100)
    assert not np.allclose(swapped, want)

    # Single-op modes pass through the other stage untouched.
    np.testing.assert_array_equal(
        apply_cmvn_vad(feats, cmvn=True, vad=False, cmn_window=100),
        sliding_cmvn(feats, window=100),
    )
    np.testing.assert_array_equal(
        apply_cmvn_vad(feats, cmvn=False, vad=True),
        select_voiced_frames(feats, vad),
    )


def test_sliding_cmvn_jax_masked_matches_numpy_per_row():
    import jax.numpy as jnp

    from tf_kaldi_speaker_tpu.ops.cmvn import sliding_cmvn, sliding_cmvn_jax_masked

    rng = np.random.RandomState(0)
    lengths = np.array([5, 37, 64, 0], np.int32)  # incl. < window and a pad row
    T, D = 64, 6
    feats = np.zeros((4, T, D), np.float32)
    for i, n in enumerate(lengths):
        feats[i, :n] = rng.randn(n, D)
    out = np.asarray(sliding_cmvn_jax_masked(jnp.asarray(feats), jnp.asarray(lengths), window=20))
    assert np.isfinite(out).all()
    for i, n in enumerate(lengths):
        if n == 0:
            continue
        want = sliding_cmvn(feats[i, :n], window=20)
        np.testing.assert_allclose(out[i, :n], want, rtol=2e-5, atol=2e-5)


def test_vad_energy_jax_matches_numpy_per_row():
    import jax.numpy as jnp

    from tf_kaldi_speaker_tpu.ops.vad import compute_vad_energy, compute_vad_energy_jax

    rng = np.random.RandomState(1)
    lengths = np.array([12, 50, 0], np.int32)
    T, D = 50, 4
    feats = np.zeros((3, T, D), np.float32)
    for i, n in enumerate(lengths):
        f = rng.randn(n, D).astype(np.float32)
        f[:, 0] = np.where(rng.rand(n) > 0.4, 15.0, -15.0)  # far from cutoff
        feats[i, :n] = f
    for ctx, prop in ((0, 0.6), (2, 0.6), (5, 0.4)):
        got = np.asarray(compute_vad_energy_jax(
            jnp.asarray(feats), jnp.asarray(lengths),
            frames_context=ctx, proportion_threshold=prop))
        for i, n in enumerate(lengths):
            want = compute_vad_energy(
                feats[i, :n], frames_context=ctx, proportion_threshold=prop
            ) > 0.5 if n else np.zeros(0, bool)
            np.testing.assert_array_equal(got[i, :n], want)
            assert not got[i, n:].any()


def test_rows_for_power_of_two_quantization(tmp_path):
    """Flush dispatches allocate the smallest n_data*2^k rows that fit the
    items (capped at batch_size) so partial buckets don't ship a full
    batch of padding over the host->device link."""
    import json

    from tf_kaldi_speaker_tpu.extract.extractor import Extractor
    from tf_kaldi_speaker_tpu.parallel.mesh import DATA_AXIS
    from tf_kaldi_speaker_tpu.train.trainer import Trainer
    from tf_kaldi_speaker_tpu.utils.params import ParamsPlain

    params = ParamsPlain(**TINY_CONFIG)
    nnet = str(tmp_path / "m" / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=8)
    t.build("train", 20, "softmax", 8)
    t.save(0)
    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(TINY_CONFIG, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("20\n")

    ex = Extractor(str(tmp_path / "m"), batch_size=128)
    n = ex.mesh.shape[DATA_AXIS]
    assert ex._rows_for(1) == n
    assert ex._rows_for(n) == n
    assert ex._rows_for(n + 1) == 2 * n
    assert ex._rows_for(ex.batch_size - 1) == ex.batch_size
    assert ex._rows_for(ex.batch_size) == ex.batch_size
    # never above batch_size even for oversized requests
    assert ex._rows_for(10 * ex.batch_size) == ex.batch_size
