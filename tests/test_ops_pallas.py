"""Pallas kernel tests (CPU: jnp fallback paths + math parity; the kernels
themselves are exercised on TPU by bench.py and in interpret mode here)."""

import io

import jax
import jax.numpy as jnp
import numpy as np

from tf_kaldi_speaker_tpu import kio
from tf_kaldi_speaker_tpu.kio import ark
from tf_kaldi_speaker_tpu.models.pooling import StatisticsPooling
from tf_kaldi_speaker_tpu.ops.cm_dequant_pallas import cm_dequantize, cm_dequantize_jnp
from tf_kaldi_speaker_tpu.ops.pooling_pallas import _stats_jnp, masked_stats_pooling


def test_masked_stats_matches_module():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 50, 16).astype(np.float32))
    mask = jnp.asarray((rng.rand(4, 50) > 0.3).astype(np.float32))
    fused = masked_stats_pooling(x, mask)
    pool = StatisticsPooling()
    v = pool.init(jax.random.PRNGKey(0), x, {})
    ref = pool.apply(v, x, {}, mask=mask)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_masked_stats_grad_matches_autodiff():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 30, 8).astype(np.float32))
    mask = jnp.ones((2, 30), jnp.float32)

    def fused_loss(x):
        return jnp.sum(masked_stats_pooling(x, mask) ** 2)

    def ref_loss(x):
        return jnp.sum(_stats_jnp(x, mask) ** 2)

    g1 = jax.grad(fused_loss)(x)
    g2 = jax.grad(ref_loss)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-4)


def test_masked_stats_pallas_interpret():
    """Run the actual kernel in interpreter mode on CPU."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tf_kaldi_speaker_tpu.ops import pooling_pallas as pp

    rng = np.random.RandomState(2)
    b, l, d = 2, 20, 256
    x = jnp.asarray(rng.randn(b, l, d).astype(np.float32))
    mask = jnp.asarray((rng.rand(b, l) > 0.2).astype(np.float32))

    dt = 128
    import functools

    out = pl.pallas_call(
        functools.partial(pp._kernel, mask_rows=b),
        grid=(b, d // dt),
        in_specs=[
            pl.BlockSpec((1, l, dt), lambda i, j: (i, 0, j)),
            pl.BlockSpec((b, l), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, dt), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, 2, d), x.dtype),
        interpret=True,
    )(x, mask)
    out = jnp.concatenate([out[:, 0, :], out[:, 1, :]], axis=1)
    ref = _stats_jnp(x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-4)


def test_cm_dequantize_matches_host_codec():
    """Device dequant must reproduce the numpy ark decode bit-for-bit-ish."""
    rng = np.random.RandomState(3)
    mat = (rng.randn(120, 24) * 2 + 0.5).astype(np.float32)
    buf = io.BytesIO()
    kio.write_mat(buf, mat, compress=True)
    buf.seek(0)
    host = kio.read_mat(buf)

    # Re-encode to get codes+headers directly.
    blob = ark.compress_matrix(mat)
    gmin, grange, rows, cols = np.frombuffer(blob[3:19], dtype=ark._GLOBAL_HEADER, count=1)[0]
    headers_u16 = np.frombuffer(blob[19 : 19 + cols * 8], dtype="<u2").reshape(cols, 4)
    p = ark._u16_to_float(headers_u16, gmin, grange)  # [D, 4]
    codes = np.frombuffer(blob[19 + cols * 8 :], dtype=np.uint8).reshape(cols, rows).T

    out = cm_dequantize_jnp(
        jnp.asarray(codes[None]), jnp.asarray(p.T[None])  # [1, 4, D]
    )
    np.testing.assert_allclose(np.asarray(out)[0], host, rtol=1e-5, atol=1e-5)


def test_cm_dequantize_interpret_kernel():
    from jax.experimental import pallas as pl
    from tf_kaldi_speaker_tpu.ops import cm_dequant_pallas as cd

    rng = np.random.RandomState(4)
    codes = rng.randint(0, 256, size=(2, 16, 128), dtype=np.uint8)
    headers = np.sort(rng.randn(2, 4, 128).astype(np.float32), axis=1)
    out = pl.pallas_call(
        cd._kernel,
        grid=(2,),
        in_specs=[
            pl.BlockSpec((1, 16, 128), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 4, 128), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 16, 128), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((2, 16, 128), jnp.float32),
        interpret=True,
    )(jnp.asarray(codes), jnp.asarray(headers))
    ref = cm_dequantize_jnp(jnp.asarray(codes), jnp.asarray(headers))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
