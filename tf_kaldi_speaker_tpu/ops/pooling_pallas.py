"""Fused masked statistics-pooling Pallas kernel.

The pooling reduction (masked mean + variance + floored sqrt, reference
pooling.py:9-34) sits between two big matmuls; XLA handles it well, but the
two-pass variance materializes [B, L, D] intermediates in HBM twice. This
kernel computes sum/sumsq in ONE pass over VMEM tiles and derives
mean/stddev in-register: one HBM read of the activations total.

Forward = Pallas (TPU) / jnp (CPU or fallback); backward = analytic custom
VJP in jnp (cheap: two rank-1 broadcasts), so autodiff never traces the
kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..models.pooling import VAR2STD_EPSILON

_LANE = 128


def _stats_jnp(x, mask):
    m = mask[:, :, None].astype(x.dtype)
    denom = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    mean = jnp.sum(x * m, axis=1) / denom
    var = jnp.sum(jnp.square(x - mean[:, None, :]) * m, axis=1) / denom
    std = jnp.sqrt(jnp.where(var <= VAR2STD_EPSILON, VAR2STD_EPSILON, var))
    return jnp.concatenate([mean, std], axis=1)


def _kernel(x_ref, mask_ref, out_ref, mask_rows: int):
    # Blocks: x [1, L, DT] VMEM; mask is a [mask_rows, L] row block
    # containing this program's row (TPU tiling forbids a (1, L) block, so
    # the sublane-tile of 8 rows is the smallest legal slice — B % 8 == 0
    # batches read 8 rows per program instead of all B; see the r2 review).
    from jax.experimental import pallas as pl

    # All arithmetic in f32 (bf16 inputs upcast): Mosaic has no scalar
    # bf16 max, and f32 accumulation is better for the variance anyway.
    x = x_ref[0].astype(jnp.float32)                      # [L, DT]
    m = mask_ref[pl.program_id(0) % mask_rows][:, None]   # [L, 1] f32
    count = jnp.maximum(jnp.sum(m), 1.0)
    s1 = jnp.sum(x * m, axis=0)       # [DT]
    s2 = jnp.sum(x * x * m, axis=0)   # [DT]
    mean = s1 / count
    var = jnp.maximum(s2 / count - mean * mean, 0.0)
    std = jnp.sqrt(jnp.where(var <= VAR2STD_EPSILON, VAR2STD_EPSILON, var))
    out_ref[0, 0, :] = mean.astype(out_ref.dtype)
    out_ref[0, 1, :] = std.astype(out_ref.dtype)


def _stats_pallas(x, mask):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, l, d = x.shape
    dt = min(d, 512)
    while d % dt:
        dt //= 2
    dt = max(dt, _LANE) if d % _LANE == 0 else d
    if d % dt:
        dt = d
    grid = (b, d // dt)
    # 8-row mask blocks when the batch allows (sublane tile); else full B.
    mask_rows = 8 if b % 8 == 0 else b
    out = pl.pallas_call(
        functools.partial(_kernel, mask_rows=mask_rows),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, l, dt), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((mask_rows, l), lambda i, j, r=mask_rows: (i // r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, dt), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2, d), x.dtype),
        # mask stays f32: a single-row load from a bf16 (16,128)-tiled
        # VMEM block is not supported by Mosaic; f32's (8,128) tile is.
    )(x, mask.astype(jnp.float32))
    # [B, 2, D] -> [B, 2D] = [all means ‖ all stds]
    return jnp.concatenate([out[:, 0, :], out[:, 1, :]], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def masked_stats_pooling(x, mask):
    """[B, L, D], [B, L] -> [B, 2D] (mean ‖ floored stddev)."""
    if jax.default_backend() == "tpu":
        return _stats_pallas(x, mask)
    return _stats_jnp(x, mask)


def _fwd(x, mask):
    out = masked_stats_pooling(x, mask)
    return out, (x, mask, out)


def _bwd(res, g):
    x, mask, out = res
    d = x.shape[-1]
    mean = out[:, :d]
    std = out[:, d:]
    g_mean = g[:, :d]
    g_std = g[:, d:]
    m = mask[:, :, None].astype(x.dtype)
    count = jnp.maximum(jnp.sum(m, axis=1), 1.0)  # [B, 1]
    # d mean / dx = m / n ; d std / dx = m (x - mean) / (n * std), zero at floor
    floored = (std * std <= VAR2STD_EPSILON * (1 + 1e-6)).astype(x.dtype)
    inv_n = (1.0 / count)[:, None, :]
    gx = m * inv_n * g_mean[:, None, :]
    gx += m * inv_n * (x - mean[:, None, :]) / std[:, None, :] * (
        g_std[:, None, :] * (1.0 - floored[:, None, :])
    )
    return gx, None


masked_stats_pooling.defvjp(_fwd, _bwd)
