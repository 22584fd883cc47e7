"""Attention-pooling config variants: split-key, key network types, post-BN."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_kaldi_speaker_tpu.models import SelfAttentionPooling
from test_models import attention_cfg


def run_attention(cfg, seed=0, B=2, L=24, DV=8, DK=32):
    rng = np.random.RandomState(seed)
    key_in = rng.randn(B, L, DK).astype(np.float32)
    value_in = rng.randn(B, L, DV).astype(np.float32)
    pool = SelfAttentionPooling(config=cfg)
    endpoints = {"tap_key": jnp.asarray(key_in), "tap_value": jnp.asarray(value_in)}
    v = pool.init(jax.random.PRNGKey(1), jnp.asarray(value_in), dict(endpoints))
    ep = dict(endpoints)
    out = pool.apply(v, jnp.asarray(value_in), ep, mutable=["batch_stats"])[0] \
        if cfg.get("att_apply_nonlinear") else pool.apply(v, jnp.asarray(value_in), ep)
    return np.asarray(out), ep, v


def test_split_key_heads():
    cfg = attention_cfg(att_split_key=True, att_key_num_nodes=[16], att_num_heads=2)
    out, ep, v = run_attention(cfg)
    assert out.shape == (2, 16)  # 2 * value dim 8
    w = np.asarray(ep["attention_weights"])
    assert w.shape == (2, 2, 24)
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
    # split-key query has per-head dim 16/2
    assert np.asarray(v["params"]["query"]).shape == (2, 8)


@pytest.mark.parametrize("ktype,expect", [
    (1, "att_key0_relu"), (2, "att_key0_bn"), (3, "att_key0_tanh")])
def test_key_network_types(ktype, expect):
    cfg = attention_cfg(att_key_network_type=ktype)
    rng = np.random.RandomState(0)
    key_in = rng.randn(2, 24, 32).astype(np.float32)
    value_in = rng.randn(2, 24, 8).astype(np.float32)
    pool = SelfAttentionPooling(config=cfg)
    endpoints = {"tap_key": jnp.asarray(key_in), "tap_value": jnp.asarray(value_in)}
    v = pool.init(jax.random.PRNGKey(1), jnp.asarray(value_in), dict(endpoints))
    ep = dict(endpoints)
    pool.apply(v, jnp.asarray(value_in), ep)
    assert expect in ep, sorted(ep)


def test_value_network_and_post_nonlinear():
    cfg = attention_cfg(
        att_value_num_nodes=[12, 8], att_value_network_type=2,
        att_apply_nonlinear=True,
    )
    out, ep, _ = run_attention(cfg)
    assert "att_value0_bn" in ep and "att_post_relu" in ep
    assert np.isfinite(out).all()


def test_multilayer_key_stack():
    cfg = attention_cfg(att_key_num_nodes=[24, 12, 16], att_key_network_type=0)
    out, ep, _ = run_attention(cfg)
    assert "att_key0_bn" in ep and "att_key1_bn" in ep and "att_key2_dense" in ep
