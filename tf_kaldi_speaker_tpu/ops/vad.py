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


def compute_vad_energy_jax(
    feats,
    lengths,
    energy_threshold: float = 5.5,
    energy_mean_scale: float = 0.5,
    frames_context: int = 0,
    proportion_threshold: float = 0.6,
):
    """jnp energy VAD over a padded batch [B, T, D] with per-row valid
    lengths [B]; returns bool decisions [B, T] (False beyond lengths).

    Same math as :func:`compute_vad_energy` per row (cutoff from the
    mean log-energy of the VALID frames only). Padding frames must be
    zero on input. Used by the decode-on-device extraction pipe."""
    import jax.numpy as jnp

    e = feats[:, :, 0]  # [B, T] log-energy (MFCC C0)
    b, T = e.shape
    t = jnp.arange(T, dtype=jnp.int32)[None, :]
    n = lengths.astype(jnp.int32)[:, None]
    valid = t < n
    cutoff = jnp.float32(energy_threshold)
    if energy_mean_scale != 0.0:
        mean_e = jnp.sum(jnp.where(valid, e, 0.0), axis=1) / jnp.maximum(
            n[:, 0], 1
        ).astype(e.dtype)
        cutoff = cutoff + energy_mean_scale * mean_e[:, None]
    pass_mask = (e > cutoff) & valid
    if frames_context <= 0:
        return pass_mask
    csum = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.float32),
         jnp.cumsum(pass_mask.astype(jnp.float32), axis=1)], axis=1
    )
    lo = jnp.maximum(t - frames_context, 0)
    hi = jnp.minimum(t + frames_context + 1, jnp.maximum(n, 1))
    lo = jnp.broadcast_to(lo, (b, T))
    hi = jnp.maximum(jnp.broadcast_to(hi, (b, T)), lo + 1)
    frac = (
        jnp.take_along_axis(csum, hi, axis=1)
        - jnp.take_along_axis(csum, lo, axis=1)
    ) / (hi - lo).astype(jnp.float32)
    return (frac >= proportion_threshold) & valid
