"""MFCC frontend (Kaldi compute-mfcc-feats equivalent).

Replaces the external Kaldi binary invoked by the reference recipes
(steps/make_mfcc.sh at run.sh:59; 30-dim 16 kHz VoxCeleb config, 8 kHz SRE).
Kaldi conventions: 25 ms povey-windowed frames every 10 ms with snipped
edges, DC removal, dither, pre-emphasis 0.97, power spectrum, mel filter
bank, DCT-II (ortho), cepstral liftering, C0 replaced by raw log-energy.

Vectorized numpy for the host prep pipeline, plus a jnp batch variant
(``mfcc_jax``) so feature extraction can run on-device inside jit.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

try:
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None


@dataclass
class MfccConfig:
    sample_rate: int = 16000
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_ceps: int = 30
    num_mel_bins: int = 30
    low_freq: float = 20.0
    high_freq: float = 7600.0       # VoxCeleb mfcc.conf; 3700 for 8 kHz SRE
    preemphasis: float = 0.97
    dither: float = 1.0             # in 16-bit integer units, like Kaldi
    remove_dc_offset: bool = True
    use_energy: bool = True
    raw_energy: bool = True
    cepstral_lifter: float = 22.0
    window_type: str = "povey"
    snip_edges: bool = True
    energy_floor: float = 0.0

    @property
    def frame_length(self) -> int:
        return int(self.sample_rate * self.frame_length_ms / 1000.0)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_rate * self.frame_shift_ms / 1000.0)

    @property
    def fft_size(self) -> int:
        n = 1
        while n < self.frame_length:
            n *= 2
        return n


def _window(cfg: MfccConfig) -> np.ndarray:
    n = cfg.frame_length
    a = 2.0 * np.pi / (n - 1)
    i = np.arange(n)
    if cfg.window_type == "povey":
        return (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    if cfg.window_type == "hamming":
        return 0.54 - 0.46 * np.cos(a * i)
    if cfg.window_type == "hanning":
        return 0.5 - 0.5 * np.cos(a * i)
    if cfg.window_type == "rectangular":
        return np.ones(n)
    raise ValueError(cfg.window_type)


def mel_scale(freq):
    return 1127.0 * np.log(1.0 + np.asarray(freq) / 700.0)


def inverse_mel_scale(mel):
    return 700.0 * (np.exp(np.asarray(mel) / 1127.0) - 1.0)


def mel_banks(cfg: MfccConfig) -> np.ndarray:
    """[num_mel_bins, fft_size//2+1] triangular filters (Kaldi MelBanks)."""
    nfft = cfg.fft_size
    num_bins = cfg.num_mel_bins
    high = cfg.high_freq if cfg.high_freq > 0 else cfg.sample_rate / 2 + cfg.high_freq
    mel_low, mel_high = mel_scale(cfg.low_freq), mel_scale(high)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)
    fft_freqs = np.arange(nfft // 2 + 1) * (cfg.sample_rate / nfft)
    mel_f = mel_scale(fft_freqs)  # [F]
    banks = np.zeros((num_bins, nfft // 2 + 1))
    for b in range(num_bins):
        left = mel_low + b * mel_delta
        center = left + mel_delta
        right = center + mel_delta
        up = (mel_f - left) / (center - left)
        down = (right - mel_f) / (right - center)
        banks[b] = np.maximum(0.0, np.minimum(up, down))
    return banks


def dct_matrix(num_ceps: int, num_bins: int) -> np.ndarray:
    """Orthonormal DCT-II [num_ceps, num_bins]."""
    m = np.zeros((num_ceps, num_bins))
    m[0] = np.sqrt(1.0 / num_bins)
    for k in range(1, num_ceps):
        m[k] = np.sqrt(2.0 / num_bins) * np.cos(
            np.pi * k * (np.arange(num_bins) + 0.5) / num_bins
        )
    return m


def lifter_coeffs(cfg: MfccConfig) -> np.ndarray:
    if cfg.cepstral_lifter == 0:
        return np.ones(cfg.num_ceps)
    q = cfg.cepstral_lifter
    return 1.0 + 0.5 * q * np.sin(np.pi * np.arange(cfg.num_ceps) / q)


def frame_signal(wav: np.ndarray, cfg: MfccConfig) -> np.ndarray:
    """[T] -> [num_frames, frame_length] with snipped edges."""
    n, shift = cfg.frame_length, cfg.frame_shift
    if len(wav) < n:
        return np.zeros((0, n), np.float64)
    num = 1 + (len(wav) - n) // shift
    idx = np.arange(n)[None, :] + shift * np.arange(num)[:, None]
    return np.asarray(wav, np.float64)[idx]


def mfcc(wav: np.ndarray, cfg: MfccConfig = MfccConfig(), seed: int = 0) -> np.ndarray:
    """[T] samples (int16 range) -> [num_frames, num_ceps] float32."""
    frames = frame_signal(wav, cfg)
    if frames.shape[0] == 0:
        return np.zeros((0, cfg.num_ceps), np.float32)
    if cfg.dither > 0:
        rng = np.random.RandomState(seed)
        frames = frames + cfg.dither * rng.randn(*frames.shape)
    if cfg.remove_dc_offset:
        frames = frames - frames.mean(axis=1, keepdims=True)
    if cfg.use_energy and cfg.raw_energy:
        energy = np.maximum((frames**2).sum(axis=1), np.finfo(np.float64).tiny)
        log_energy = np.log(energy)
    if cfg.preemphasis > 0:
        pre = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
        frames = frames - cfg.preemphasis * pre
    frames = frames * _window(cfg)[None, :]
    if cfg.use_energy and not cfg.raw_energy:
        energy = np.maximum((frames**2).sum(axis=1), np.finfo(np.float64).tiny)
        log_energy = np.log(energy)

    spec = np.abs(np.fft.rfft(frames, n=cfg.fft_size, axis=1)) ** 2
    mel_e = spec @ mel_banks(cfg).T
    mel_e = np.log(np.maximum(mel_e, np.finfo(np.float64).tiny))
    ceps = mel_e @ dct_matrix(cfg.num_ceps, cfg.num_mel_bins).T
    ceps = ceps * lifter_coeffs(cfg)[None, :]
    if cfg.use_energy:
        if cfg.energy_floor > 0:
            log_energy = np.maximum(log_energy, np.log(cfg.energy_floor))
        ceps[:, 0] = log_energy
    return ceps.astype(np.float32)


def mfcc_jax(wavs, cfg: MfccConfig = MfccConfig()):
    """Batched on-device MFCC [B, T] -> [B, F, num_ceps] (no dither)."""
    n, shift = cfg.frame_length, cfg.frame_shift
    b, t = wavs.shape
    num = 1 + (t - n) // shift
    idx = jnp.arange(n)[None, :] + shift * jnp.arange(num)[:, None]
    frames = wavs[:, idx]  # [B, F, n]
    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=2, keepdims=True)
    log_energy = jnp.log(jnp.maximum(jnp.sum(frames**2, axis=2), 1e-30))
    if cfg.preemphasis > 0:
        pre = jnp.concatenate([frames[:, :, :1], frames[:, :, :-1]], axis=2)
        frames = frames - cfg.preemphasis * pre
    frames = frames * jnp.asarray(_window(cfg), frames.dtype)[None, None, :]
    spec = jnp.abs(jnp.fft.rfft(frames, n=cfg.fft_size, axis=2)) ** 2
    mel_e = jnp.log(jnp.maximum(spec @ jnp.asarray(mel_banks(cfg), spec.dtype).T, 1e-30))
    ceps = mel_e @ jnp.asarray(dct_matrix(cfg.num_ceps, cfg.num_mel_bins), mel_e.dtype).T
    ceps = ceps * jnp.asarray(lifter_coeffs(cfg), ceps.dtype)[None, None, :]
    if cfg.use_energy:
        ceps = ceps.at[:, :, 0].set(log_energy)
    return ceps
