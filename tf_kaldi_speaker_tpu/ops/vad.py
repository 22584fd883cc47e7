"""Energy-based voice activity detection + voiced-frame selection.

Replaces the external Kaldi binaries ``compute-vad`` (run.sh:62 via
sid/compute_vad_decision.sh) and ``select-voiced-frames``
(run_extract_embeddings.sh:47). Kaldi's energy VAD: frame t is voiced when

    log_energy(t) > threshold + mean_scale · mean(log_energy)

with optional context voting: consider frames within ±context; voiced if at
least ``proportion`` of them pass. log-energy is feature column 0 (MFCC C0).
"""

from __future__ import annotations

import numpy as np


def compute_vad_energy(
    feats: np.ndarray,
    energy_threshold: float = 5.5,
    energy_mean_scale: float = 0.5,
    frames_context: int = 0,
    proportion_threshold: float = 0.6,
) -> np.ndarray:
    """Energy VAD over [T, D] features; returns float32 0/1 decisions [T]."""
    log_energy = np.asarray(feats, dtype=np.float64)[:, 0]
    T = log_energy.shape[0]
    cutoff = energy_threshold
    if energy_mean_scale != 0.0:
        cutoff = energy_threshold + energy_mean_scale * log_energy.sum() / T
    pass_mask = (log_energy > cutoff).astype(np.float64)
    if frames_context <= 0:
        return pass_mask.astype(np.float32)
    # Context voting: fraction of passing frames in [t-ctx, t+ctx].
    csum = np.concatenate([[0.0], np.cumsum(pass_mask)])
    t = np.arange(T)
    lo = np.maximum(t - frames_context, 0)
    hi = np.minimum(t + frames_context + 1, T)
    frac = (csum[hi] - csum[lo]) / (hi - lo)
    return (frac >= proportion_threshold).astype(np.float32)


def select_voiced_frames(feats: np.ndarray, vad: np.ndarray) -> np.ndarray:
    """Keep rows whose VAD decision is nonzero (select-voiced-frames)."""
    vad = np.asarray(vad)
    assert feats.shape[0] == vad.shape[0], "features/vad length mismatch"
    return feats[vad > 0.5]
