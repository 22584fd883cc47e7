"""Frontend tests: MFCC, wav I/O, augmentation, prep CLIs end-to-end."""

import os

import numpy as np
import pytest

from tf_kaldi_speaker_tpu.data.augment import add_babble, add_noise, reverberate
from tf_kaldi_speaker_tpu.kio.wav import read_wav, write_wav
from tf_kaldi_speaker_tpu.ops.mfcc import MfccConfig, dct_matrix, mel_banks, mfcc, mfcc_jax


def tone(freq, dur=1.0, rate=16000, amp=8000.0):
    t = np.arange(int(dur * rate)) / rate
    return amp * np.sin(2 * np.pi * freq * t)


def test_mfcc_shapes_and_energy():
    cfg = MfccConfig(dither=0.0)
    x = tone(440)
    f = mfcc(x, cfg)
    assert f.shape == (1 + (16000 - 400) // 160, 30)
    # C0 = raw log-energy grows with amplitude
    f_loud = mfcc(10 * x, cfg)
    assert (f_loud[:, 0] > f[:, 0]).all()


def test_mfcc_distinguishes_tones():
    cfg = MfccConfig(dither=0.0, use_energy=False)
    a = mfcc(tone(300), cfg).mean(axis=0)
    b = mfcc(tone(3000), cfg).mean(axis=0)
    assert np.linalg.norm(a - b) > 1.0


def test_mel_banks_partition():
    cfg = MfccConfig()
    banks = mel_banks(cfg)
    assert banks.shape == (30, 257)
    assert (banks >= 0).all()
    # interior FFT bins are covered by at least one filter
    covered = banks.sum(axis=0)
    lo = int(np.ceil(cfg.low_freq / (16000 / 512))) + 2
    hi = int(np.floor(cfg.high_freq / (16000 / 512))) - 2
    assert (covered[lo:hi] > 0).all()


def test_dct_orthonormal():
    m = dct_matrix(30, 30)
    np.testing.assert_allclose(m @ m.T, np.eye(30), atol=1e-10)


def test_mfcc_jax_matches_numpy():
    cfg = MfccConfig(dither=0.0)
    x = tone(700, dur=0.3)
    ref = mfcc(x, cfg)
    import jax.numpy as jnp

    batch = np.asarray(mfcc_jax(jnp.asarray(x[None]), cfg))[0]
    # jax runs the FFT in float32; numpy in float64.
    np.testing.assert_allclose(batch, ref, rtol=2e-3, atol=0.1)


def test_wav_roundtrip(tmp_path):
    x = tone(500, dur=0.2)
    path = str(tmp_path / "a.wav")
    write_wav(path, x, 16000)
    y, rate = read_wav(path)
    assert rate == 16000
    np.testing.assert_allclose(y, np.round(np.clip(x, -32768, 32767)), atol=1.0)
    # pipe rxfilename
    y2, _ = read_wav("cat %s |" % path)
    np.testing.assert_array_equal(y, y2)


def test_reverberate_and_noise():
    rng = np.random.RandomState(0)
    x = tone(440, dur=0.3)
    rir = np.exp(-np.arange(800) / 100.0) * rng.randn(800)
    rir[0] = 1.0
    y = reverberate(x, rir)
    assert y.shape == x.shape
    np.testing.assert_allclose(np.mean(y**2), np.mean(x**2), rtol=1e-6)

    noise = rng.randn(2000) * 1000
    z = add_noise(x, noise, snr_db=10.0, rng=rng)
    resid = z - x
    snr = 10 * np.log10(np.mean(x**2) / np.mean(resid**2))
    assert abs(snr - 10.0) < 0.5

    bab = add_babble(x, [tone(200), tone(900)], snr_db=5.0, rng=rng)
    assert bab.shape == x.shape


def test_prep_pipeline_cli(tmp_path):
    from tf_kaldi_speaker_tpu.cli import compute_vad, make_mfcc, prepare_feats

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    scp = str(tmp_path / "wav.scp")
    rng = np.random.RandomState(0)
    with open(scp, "w") as f:
        for i in range(3):
            path = str(wav_dir / ("u%d.wav" % i))
            sig = np.concatenate([tone(300 + 100 * i, 0.4), np.zeros(3200)])
            write_wav(path, sig + rng.randn(len(sig)) * 3.0, 16000)
            f.write("u%d %s\n" % (i, path))

    feat_dir = str(tmp_path / "mfcc")
    assert make_mfcc.main(["--compress", scp, feat_dir]) == 0
    assert os.path.exists(os.path.join(feat_dir, "feats.scp"))
    assert compute_vad.main([os.path.join(feat_dir, "feats.scp"), feat_dir]) == 0
    assert os.path.exists(os.path.join(feat_dir, "vad.scp"))

    egs_dir = str(tmp_path / "egs")
    assert prepare_feats.main([feat_dir, egs_dir]) == 0
    from tf_kaldi_speaker_tpu.kio import read_mat_scp

    feats = dict(read_mat_scp(os.path.join(egs_dir, "feats.scp")))
    assert len(feats) == 3
    for utt, m in feats.items():
        assert m.shape[1] == 30
        # silence removed: fewer frames than the raw features
    raw = dict(read_mat_scp(os.path.join(feat_dir, "feats.scp")))
    assert all(feats[u].shape[0] < raw[u].shape[0] for u in feats)
