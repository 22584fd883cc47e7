"""Generate the pinned frontend golden fixture (tests/golden/frontend.npz).

VERDICT r4 item 4: the MFCC/VAD/sliding-CMVN frontend implements Kaldi
conventions (compute-mfcc-feats / compute-vad / apply-cmvn-sliding —
reference egs/voxceleb/v1/run.sh:59-62) but, with no real Kaldi in this
environment, has only ever been property-tested.  This script pins the
CURRENT numerical outputs on fixed deterministic waveforms so that ANY
later numerics drift (window shape, mel edges, liftering, energy floor,
cumsum windowing...) fails CI loudly instead of silently moving EER of
models imported from the reference ecosystem.  The fixture is also the
artifact to diff against real `compute-mfcc-feats` output the first time
a Kaldi build is available (docs/VALIDATION.md "validation boundary").

Deterministic inputs: multi-tone + seeded-noise speech-like signal with a
leading/trailing silence (exercises VAD both ways), at 16 kHz (VoxCeleb
config) and 8 kHz (SRE config, high_freq 3700).

Run:  python scripts/make_frontend_golden.py   (overwrites the fixture)
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tf_kaldi_speaker_tpu.ops.cmvn import sliding_cmvn  # noqa: E402
from tf_kaldi_speaker_tpu.ops.mfcc import MfccConfig, mfcc  # noqa: E402
from tf_kaldi_speaker_tpu.ops.vad import compute_vad_energy  # noqa: E402

OUT = os.path.join(REPO, "tests", "golden", "frontend.npz")


def make_wave(rate: int, seed: int) -> np.ndarray:
    """1.2 s: 0.2 s near-silence, 0.8 s multi-tone+noise 'speech', 0.2 s
    near-silence. Integer-16 quantized so the waveform is exactly
    representable (what a wav file would carry)."""
    rng = np.random.RandomState(seed)
    n_sil = int(0.2 * rate)
    n_speech = int(0.8 * rate)
    t = np.arange(n_speech) / rate
    speech = (
        4000.0 * np.sin(2 * np.pi * 220.0 * t)
        + 2500.0 * np.sin(2 * np.pi * 680.0 * t + 0.7)
        + 1200.0 * np.sin(2 * np.pi * 1900.0 * t + 1.9)
        + 300.0 * rng.randn(n_speech)
    )
    sil = 20.0 * rng.randn(n_sil)
    sil2 = 20.0 * rng.randn(n_sil)
    wav = np.concatenate([sil, speech, sil2])
    return np.round(np.clip(wav, -32768, 32767)).astype(np.float64)


def main() -> None:
    out = {}
    specs = {
        "vox16k": (make_wave(16000, 1), MfccConfig(dither=0.0)),
        # the 8 kHz SRE mfcc.conf: 3700 Hz high cutoff, 23 bins/ceps
        "sre8k": (make_wave(8000, 2),
                  MfccConfig(sample_rate=8000, high_freq=3700.0,
                             num_mel_bins=23, num_ceps=23, dither=0.0)),
        # dithered path with a FIXED seed (pins the dither RNG convention)
        "vox16k_dither": (make_wave(16000, 1), MfccConfig(dither=1.0)),
    }
    for name, (wav, cfg) in specs.items():
        out[name + "_wav"] = wav
        feats = mfcc(wav, cfg, seed=123)
        out[name + "_mfcc"] = feats
        out[name + "_vad"] = compute_vad_energy(
            feats, energy_threshold=5.5, energy_mean_scale=0.5)
        out[name + "_vad_ctx"] = compute_vad_energy(
            feats, energy_threshold=5.5, energy_mean_scale=0.5,
            frames_context=2, proportion_threshold=0.6)
        out[name + "_cmvn"] = sliding_cmvn(feats, window=300, center=True)
        out[name + "_cmvn_nocenter"] = sliding_cmvn(
            feats, window=50, center=False)
        out[name + "_cmvn_vars"] = sliding_cmvn(
            feats, window=120, center=True, norm_vars=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez_compressed(OUT, **out)
    size = os.path.getsize(OUT)
    print("wrote %s (%d arrays, %.0f KiB)" % (OUT, len(out), size / 1024))


if __name__ == "__main__":
    main()
