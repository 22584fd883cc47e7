"""Offline audio augmentation: reverberation and additive noise.

Replaces the Kaldi/MUSAN/RIRS augmentation step of the reference recipes
(run.sh:82-114: reverberate_data_dir.py / augment_data_dir.py /
wav-reverberate): convolve with a room impulse response, and mix
noise/music/babble at a target SNR. Pure numpy; deterministic given a seed.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np


def _power(x: np.ndarray) -> float:
    return float(np.mean(np.square(x))) + 1e-20


def reverberate(signal: np.ndarray, rir: np.ndarray, shift_output: bool = True) -> np.ndarray:
    """Convolve with an RIR, keep the input's duration and power.

    wav-reverberate semantics: output is shifted so the direct path (RIR
    peak) aligns with the input, then power-normalized to the input level.
    """
    signal = np.asarray(signal, np.float64)
    rir = np.asarray(rir, np.float64)
    rir = rir / (np.max(np.abs(rir)) + 1e-20)
    out = np.convolve(signal, rir)
    if shift_output:
        peak = int(np.argmax(np.abs(rir)))
        out = out[peak : peak + len(signal)]
    else:
        out = out[: len(signal)]
    out = out * np.sqrt(_power(signal) / _power(out))
    return out


def add_noise(
    signal: np.ndarray,
    noise: np.ndarray,
    snr_db: float,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    """Mix one noise at the given SNR; noise is looped/cropped to length."""
    rng = rng or np.random
    signal = np.asarray(signal, np.float64)
    noise = np.asarray(noise, np.float64)
    if len(noise) < len(signal):
        reps = int(np.ceil(len(signal) / len(noise)))
        noise = np.tile(noise, reps)
    start = rng.randint(0, len(noise) - len(signal) + 1)
    noise = noise[start : start + len(signal)]
    scale = np.sqrt(_power(signal) / (_power(noise) * (10.0 ** (snr_db / 10.0))))
    return signal + scale * noise


def add_babble(
    signal: np.ndarray,
    speakers: List[np.ndarray],
    snr_db: float,
    rng: Optional[np.random.RandomState] = None,
) -> np.ndarray:
    """MUSAN-style babble: sum of 3-7 speech signals mixed at one SNR."""
    rng = rng or np.random
    mix = np.zeros(len(signal))
    for s in speakers:
        s = np.asarray(s, np.float64)
        if len(s) < len(signal):
            s = np.tile(s, int(np.ceil(len(signal) / len(s))))
        start = rng.randint(0, len(s) - len(signal) + 1)
        mix += s[start : start + len(signal)]
    return add_noise(signal, mix, snr_db, rng)
