"""Data pipeline tests: sampler semantics, determinism, prefetch loaders."""

import numpy as np
import pytest

from tf_kaldi_speaker_tpu.data import (
    DataOutOfRange,
    KaldiDataRandomQueue,
    KaldiDataSeqQueue,
    RandomChunkSampler,
    SequentialChunkSampler,
    bucket_lengths,
    get_speaker_info,
)


def test_bucket_lengths_are_static_and_bounded():
    b = bucket_lengths(200, 400, 8)
    assert all(200 <= x <= 400 for x in b)
    assert len(b) <= 8
    assert all(x % 8 == 0 or x in (200, 400) for x in b)
    assert bucket_lengths(100, 100) == [100]


def test_get_speaker_info(fake_data):
    spk2features, features2spk, spk2index = get_speaker_info(
        fake_data["data"], fake_data["spklist"]
    )
    assert len(spk2index) == 6
    assert sum(len(v) for v in spk2features.values()) == 24
    for spk, feats in spk2features.items():
        for f in feats:
            assert features2spk[f] == spk


def test_random_sampler_shapes_and_labels(fake_data):
    s = RandomChunkSampler(
        fake_data["data"], fake_data["spklist"], num_speakers=4, num_segments=2,
        min_len=100, max_len=200, seed=7,
    )
    it = iter(s)
    for _ in range(3):
        feats, labels = next(it)
        assert feats.shape[0] == 8 and feats.dtype == np.float32
        assert 100 <= feats.shape[1] <= 200
        assert feats.shape[2] == 24
        # segments of the same speaker are adjacent
        assert labels[0] == labels[1] and labels[2] == labels[3]
        assert not np.allclose(feats[0], 0)
    s.close()


def test_random_sampler_deterministic(fake_data):
    def take(seed):
        s = RandomChunkSampler(
            fake_data["data"], fake_data["spklist"], num_speakers=3,
            min_len=100, max_len=150, seed=seed,
        )
        it = iter(s)
        out = [next(it) for _ in range(2)]
        s.close()
        return out

    a, b = take(5), take(5)
    for (fa, la), (fb, lb) in zip(a, b):
        np.testing.assert_array_equal(fa, fb)
        np.testing.assert_array_equal(la, lb)
    c = take(6)
    assert not np.array_equal(a[0][1], c[0][1]) or not np.allclose(a[0][0], c[0][0])


def test_sequential_sampler_one_pass(fake_data):
    s = SequentialChunkSampler(
        fake_data["data"], fake_data["spklist"], batch_size=5,
        min_len=100, max_len=150, shuffle=False, seed=0,
    )
    batches = list(s)
    # 24 utts / batch 5 -> 4 full batches + 1 partial tail of 4
    assert len(batches) == s.num_batches == 5
    for feats, labels in batches[:-1]:
        assert feats.shape[0] == 5
    assert batches[-1][0].shape[0] == 4
    assert sum(b[0].shape[0] for b in batches) == 24
    s.close()


def test_random_queue_fetch(fake_data):
    q = KaldiDataRandomQueue(
        fake_data["data"], fake_data["spklist"], num_parallel=2, max_qsize=4,
        num_speakers=4, num_segments=1, min_len=80, max_len=120,
    )
    assert q.num_total_speakers == 6
    q.start()
    for _ in range(5):
        feats, labels = q.fetch()
        assert feats.shape[0] == 4
    q.stop()


def test_seq_queue_raises_out_of_range(fake_data):
    q = KaldiDataSeqQueue(
        fake_data["data"], fake_data["spklist"], num_parallel=2, max_qsize=4,
        batch_size=4, min_len=80, max_len=120,
    )
    q.start()
    count = 0
    with pytest.raises(DataOutOfRange):
        while True:
            q.fetch()
            count += 1
    assert count == 24 // 8 * 2  # two workers, each 12//4 batches
    q.stop()


def test_multi_sampler_aux_alignment(tmp_path):
    # Aux features = main features (same ark); chunks must align exactly.
    from tf_kaldi_speaker_tpu.data import MultiRandomChunkSampler
    from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

    d = make_fake_data_dir(str(tmp_path / "mi"), num_speakers=4, utts_per_speaker=3)
    s = MultiRandomChunkSampler(
        d["data"], {"aux": d["data"]}, d["spklist"], num_speakers=3,
        min_len=80, max_len=120, seed=1,
    )
    feats, labels = next(iter(s))
    assert set(feats) == {"features", "aux"}
    np.testing.assert_allclose(feats["features"], feats["aux"], atol=1e-6)
    s.close()


def test_device_prefetch_threaded_matches_inline():
    """The transfer-thread path must yield the same batches in the same
    order as the inline double-buffer, propagate worker exceptions, and
    terminate cleanly on early exit."""
    from tf_kaldi_speaker_tpu.data import device_prefetch

    batches = [
        (np.full((2, 3), i, np.float32), np.array([i], np.int32))
        for i in range(7)
    ]
    inline = list(device_prefetch(iter(batches), threaded=False))
    threaded = list(device_prefetch(iter(batches), threaded=True))
    assert len(inline) == len(threaded) == 7
    for (af, al), (bf, bl) in zip(inline, threaded):
        np.testing.assert_array_equal(np.asarray(af), np.asarray(bf))
        np.testing.assert_array_equal(np.asarray(al), np.asarray(bl))

    def boom():
        yield batches[0]
        raise ValueError("worker failed")

    it = device_prefetch(boom(), threaded=True)
    next(it)
    with pytest.raises(ValueError, match="worker failed"):
        next(it)

    # early close while the producer still has items in flight
    it = device_prefetch(iter(batches), threaded=True, depth=1)
    next(it)
    it.close()


def test_phone_signal_learnable_and_byte_stable(tmp_path):
    """utils/testdata phone_signal: alignments become learnable (frames
    carry per-phone offsets) while phone_signal=0 keeps every generated
    byte identical to the pre-option generator (fixture stability)."""
    import os

    from tf_kaldi_speaker_tpu.kio import read_mat_scp, read_vec_int_ark
    from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

    base = make_fake_data_dir(
        str(tmp_path / "base"), num_speakers=3, utts_per_speaker=2,
        dim=8, with_vad_ali=True, num_phones=6, seed=5)
    sig = make_fake_data_dir(
        str(tmp_path / "sig"), num_speakers=3, utts_per_speaker=2,
        dim=8, with_vad_ali=True, num_phones=6, seed=5, phone_signal=2.0)

    base_feats = dict(read_mat_scp(base["feats_scp"]))
    sig_feats = dict(read_mat_scp(sig["feats_scp"]))
    base_ali = dict(read_vec_int_ark(
        os.path.join(base["ali_dir"], "pdf.ark")))
    sig_ali = dict(read_vec_int_ark(
        os.path.join(sig["ali_dir"], "pdf.ark")))
    assert sorted(base_feats) == sorted(sig_feats)

    phn_means = np.random.RandomState(5 + 424242).randn(6, 8) * 2.0
    for utt in base_feats:
        # identical alignments; features differ by exactly the per-phone
        # offsets (up to CM compression quantization)
        np.testing.assert_array_equal(base_ali[utt], sig_ali[utt])
        delta = sig_feats[utt] - base_feats[utt]
        expect = phn_means[sig_ali[utt]]
        assert np.abs(delta - expect).max() < 0.15  # CM quantization
    # per-phone frame groups separate in feature space when signal is on
    f = np.concatenate(list(sig_feats.values()))
    a = np.concatenate(list(sig_ali.values()))
    centroid = np.stack([f[a == p].mean(0) for p in range(6)])
    d_centroid = np.linalg.norm(centroid - phn_means, axis=1)
    # centroids land near the injected phone means (speaker/channel noise
    # averages out across utterances)
    assert d_centroid.mean() < np.linalg.norm(phn_means, axis=1).mean()
