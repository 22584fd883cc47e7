"""DSP + Pallas TPU kernels: CMVN, VAD, MFCC, fused pooling, CM dequant."""

from .cm_dequant_pallas import cm_dequantize, cm_dequantize_jnp
from .cmvn import sliding_cmvn, sliding_cmvn_jax
from .mfcc import MfccConfig, mfcc, mfcc_jax
from .pooling_pallas import masked_stats_pooling
from .vad import compute_vad_energy, select_voiced_frames

__all__ = [
    "MfccConfig",
    "cm_dequantize",
    "cm_dequantize_jnp",
    "compute_vad_energy",
    "masked_stats_pooling",
    "mfcc",
    "mfcc_jax",
    "select_voiced_frames",
    "sliding_cmvn",
    "sliding_cmvn_jax",
]
