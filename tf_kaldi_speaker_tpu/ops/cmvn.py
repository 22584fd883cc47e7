"""Sliding-window cepstral mean (and variance) normalization.

Replaces the external Kaldi binary ``apply-cmvn-sliding`` (invoked by the
reference at run_extract_embeddings.sh:47 with --norm-vars=false
--center=true --cmn-window=300). Window clipping follows Kaldi's
sliding-window logic: a centered window of ``cmn_window`` frames, shifted
inward at the edges so it always holds min(cmn_window, T) frames.

Two implementations: numpy (host pipeline) and jnp (fused on-device with the
embedding forward — the host→device transfer then ships raw features).
"""

from __future__ import annotations

import numpy as np

try:
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None


def _window_bounds(t: np.ndarray, num_frames: int, window: int, center: bool):
    if center:
        start = t - window // 2
    else:
        start = t - window + 1
    end = start + window
    # Shift inward at the edges (Kaldi SlidingWindowCmnInternal).
    shift_left = np.maximum(-start, 0)
    start = start + shift_left
    end = end + shift_left
    shift_right = np.maximum(end - num_frames, 0)
    start = np.maximum(start - shift_right, 0)
    end = end - shift_right
    return start, end


def sliding_cmvn(
    feats: np.ndarray,
    window: int = 300,
    center: bool = True,
    norm_vars: bool = False,
) -> np.ndarray:
    """Numpy sliding CMVN over [T, D] features. O(T·D) via cumulative sums."""
    feats = np.asarray(feats, dtype=np.float64)
    T = feats.shape[0]
    t = np.arange(T)
    start, end = _window_bounds(t, T, window, center)
    csum = np.concatenate([np.zeros((1, feats.shape[1])), np.cumsum(feats, axis=0)], 0)
    counts = (end - start).astype(np.float64)[:, None]
    mean = (csum[end] - csum[start]) / counts
    out = feats - mean
    if norm_vars:
        csq = np.concatenate(
            [np.zeros((1, feats.shape[1])), np.cumsum(feats**2, axis=0)], 0
        )
        var = (csq[end] - csq[start]) / counts - mean**2
        out = out / np.sqrt(np.maximum(var, 1e-10))
    return out.astype(np.float32)


def sliding_cmvn_jax(feats, window: int = 300, center: bool = True):
    """jnp sliding CMVN over [B, T, D] (mean subtraction only), jit-safe.

    Same math as :func:`sliding_cmvn`; static shapes, cumsum-based.
    """
    b, T, d = feats.shape
    t = jnp.arange(T)
    if center:
        start = t - window // 2
    else:
        start = t - window + 1
    end = start + window
    shift_left = jnp.maximum(-start, 0)
    start = start + shift_left
    end = end + shift_left
    shift_right = jnp.maximum(end - T, 0)
    start = jnp.maximum(start - shift_right, 0)
    end = end - shift_right
    csum = jnp.concatenate(
        [jnp.zeros((b, 1, d), feats.dtype), jnp.cumsum(feats, axis=1)], axis=1
    )
    counts = (end - start).astype(feats.dtype)[None, :, None]
    mean = (jnp.take(csum, end, axis=1) - jnp.take(csum, start, axis=1)) / counts
    return feats - mean


def sliding_cmvn_jax_masked(feats, lengths, window: int = 300, center: bool = True):
    """jnp sliding CMVN over a padded batch [B, T, D] with per-row valid
    lengths [B] (mean subtraction only), jit-safe.

    Row b is normalized exactly like :func:`sliding_cmvn` on its first
    ``lengths[b]`` frames (window edges shift inward against lengths[b],
    not T). Frames at t >= lengths[b] MUST be zero on input (so the cumsum
    is unaffected); their output is garbage and must stay masked
    downstream. Used by the decode-on-device extraction pipe."""
    b, T, d = feats.shape
    t = jnp.arange(T, dtype=jnp.int32)[None, :]  # [1, T]
    n = lengths.astype(jnp.int32)[:, None]  # [B, 1]
    if center:
        start = t - window // 2
    else:
        start = t - window + 1
    start = jnp.broadcast_to(start, (b, T))
    end = start + window
    shift_left = jnp.maximum(-start, 0)
    start = start + shift_left
    end = end + shift_left
    shift_right = jnp.maximum(end - n, 0)
    start = jnp.maximum(start - shift_right, 0)
    end = end - shift_right
    # Padding rows (n == 0) and frames t >= n produce degenerate windows;
    # clamp so the division is finite (the result is masked out anyway).
    end = jnp.clip(end, 0, jnp.maximum(n, 1))
    counts = jnp.maximum(end - start, 1).astype(feats.dtype)
    csum = jnp.concatenate(
        [jnp.zeros((b, 1, d), feats.dtype), jnp.cumsum(feats, axis=1)], axis=1
    )
    hi = jnp.take_along_axis(csum, end[:, :, None], axis=1)
    lo = jnp.take_along_axis(csum, start[:, :, None], axis=1)
    return feats - (hi - lo) / counts[:, :, None]
