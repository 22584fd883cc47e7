"""On-device Kaldi compressed-matrix dequantization (Pallas).

The "decode-on-device" input path (SURVEY.md §7 hard-parts): the host ships
raw uint8 codes + per-column percentile headers (1 byte/element over PCIe
instead of 4), and this VPU kernel applies the piecewise-linear
CharToFloat mapping (same math as kio/ark.py:_decode_cm_data) fused at the
start of the train step.

Batch layout: codes [B, L, D] uint8, headers [B, 4, D] float32 (p0/p25/
p75/p100 per utterance-column).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _dequant_math(codes_f, p):
    """codes_f [L, D] float32, p [4, D] -> [L, D]."""
    p0, p25, p75, p100 = p[0], p[1], p[2], p[3]
    lo = p0 + (p25 - p0) * (codes_f / 64.0)
    mid = p25 + (p75 - p25) * ((codes_f - 64.0) / 128.0)
    hi = p75 + (p100 - p75) * ((codes_f - 192.0) / 63.0)
    return jnp.where(codes_f <= 64.0, lo, jnp.where(codes_f <= 192.0, mid, hi))


def _kernel(codes_ref, p_ref, out_ref):
    # Mosaic has no direct uint8->f32 cast; hop through int32.
    codes = codes_ref[0].astype(jnp.int32).astype(jnp.float32)  # [L, D]
    out_ref[0] = _dequant_math(codes, p_ref[0])


def cm_dequantize_jnp(codes: jnp.ndarray, headers: jnp.ndarray) -> jnp.ndarray:
    """Reference jnp path (also the CPU fallback)."""
    codes_f = codes.astype(jnp.float32)
    p = headers[:, :, None, :]  # [B, 4, 1, D]
    p0, p25, p75, p100 = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
    lo = p0 + (p25 - p0) * (codes_f / 64.0)
    mid = p25 + (p75 - p25) * ((codes_f - 64.0) / 128.0)
    hi = p75 + (p100 - p75) * ((codes_f - 192.0) / 63.0)
    return jnp.where(codes_f <= 64.0, lo, jnp.where(codes_f <= 192.0, mid, hi))


def cm_dequantize(codes: jnp.ndarray, headers: jnp.ndarray) -> jnp.ndarray:
    """[B, L, D] uint8 + [B, 4, D] float32 -> [B, L, D] float32."""
    if jax.default_backend() != "tpu":
        return cm_dequantize_jnp(codes, headers)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, l, d = codes.shape
    return pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, d), jnp.float32),
    )(codes, headers)
