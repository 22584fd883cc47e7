"""Model zoo tests: TDNN structure/endpoints, pooling vs numpy oracles."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracles
from tf_kaldi_speaker_tpu.models import (
    TDNN_TOTAL_CONTEXT,
    EntireNetwork,
    GhostVLAD,
    SelfAttentionPooling,
    StatisticsPooling,
    l2_scaling,
    pairwise_cos_similarity,
    pairwise_euc_distances,
)

BASE_CFG = {
    "pooling_type": "statistics_pooling",
    "batchnorm_momentum": 0.99,
    "weight_l2_regularizer": 1e-2,
}


def init_net(cfg, B=4, L=100, D=24, train=False, seed=0):
    net = EntireNetwork(config=cfg)
    x = jnp.asarray(np.random.RandomState(seed).randn(B, L, D), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train)
    return net, variables, x


def test_tdnn_shapes_and_endpoints():
    net, variables, x = init_net(BASE_CFG)
    out, endpoints = net.apply(variables, x, False)
    assert out.shape == (4, 512)
    # The conv stack consumes 14 frames of context.
    assert endpoints["tdnn3_relu"].shape[1] == 100 - TDNN_TOTAL_CONTEXT
    assert endpoints["tdnn5_relu"].shape[-1] == 1500
    assert endpoints["pooling"].shape == (4, 3000)
    for name in ["tdnn1_conv", "tdnn1_bn", "tdnn1_relu", "tdnn4_dense",
                 "tdnn6_dense", "tdnn7_dense", "tdnn7_bn", "tdnn7_relu", "output"]:
        assert name in endpoints, name


def test_tdnn_config_options():
    cfg = dict(
        BASE_CFG,
        last_layer_linear=True,
        last_layer_no_bn=True,
        num_nodes_pooling_layer=256,
        num_nodes_last_layer=128,
    )
    net, variables, x = init_net(cfg)
    out, endpoints = net.apply(variables, x, False)
    assert out.shape == (4, 128)
    assert "tdnn7_bn" not in endpoints and "tdnn7_relu" not in endpoints
    assert endpoints["pooling"].shape == (4, 512)


def test_feature_norm_scaling():
    cfg = dict(BASE_CFG, feature_norm=True, feature_scaling_factor=5.0)
    net, variables, x = init_net(cfg)
    out, _ = net.apply(variables, x, False)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 5.0, rtol=1e-5)


def test_prelu_network():
    cfg = dict(BASE_CFG, network_relu_type="prelu")
    net, variables, x = init_net(cfg)
    flat = flax.traverse_util.flatten_dict(variables["params"])
    assert any("prelu" in "/".join(k) for k in flat)
    out, _ = net.apply(variables, x, False)
    assert np.isfinite(np.asarray(out)).all()


def test_batchnorm_stats_update_in_train():
    net, variables, x = init_net(BASE_CFG)
    (_, _), updates = net.apply(variables, x, True, mutable=["batch_stats"])
    before = flax.traverse_util.flatten_dict(variables["batch_stats"])
    after = flax.traverse_util.flatten_dict(updates["batch_stats"])
    changed = [k for k in before if not np.allclose(before[k], after[k])]
    assert changed


def test_stats_pooling_oracle():
    x = np.random.RandomState(1).randn(3, 50, 7).astype(np.float32)
    pool = StatisticsPooling()
    v = pool.init(jax.random.PRNGKey(0), jnp.asarray(x), {})
    out = pool.apply(v, jnp.asarray(x), {})
    np.testing.assert_allclose(np.asarray(out), oracles.np_stats_pooling(x), rtol=1e-4, atol=1e-5)


def test_stats_pooling_masked_oracle():
    rng = np.random.RandomState(2)
    x = rng.randn(3, 50, 7).astype(np.float32)
    mask = np.ones((3, 50), np.float32)
    mask[0, 30:] = 0
    mask[1, 10:] = 0
    pool = StatisticsPooling()
    v = pool.init(jax.random.PRNGKey(0), jnp.asarray(x), {})
    out = pool.apply(v, jnp.asarray(x), {}, mask=jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out), oracles.np_stats_pooling(x, mask), rtol=1e-4, atol=1e-5
    )


def test_masked_equals_sliced_stats():
    # Padding + mask must equal computing on the unpadded slice.
    rng = np.random.RandomState(3)
    x = rng.randn(1, 40, 5).astype(np.float32)
    xpad = np.concatenate([x, np.zeros((1, 10, 5), np.float32)], axis=1)
    mask = np.concatenate([np.ones((1, 40)), np.zeros((1, 10))], axis=1)
    pool = StatisticsPooling()
    v = pool.init(jax.random.PRNGKey(0), jnp.asarray(x), {})
    a = pool.apply(v, jnp.asarray(x), {})
    b = pool.apply(v, jnp.asarray(xpad), {}, mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def attention_cfg(**kw):
    cfg = {
        "att_key_input": "tap_key",
        "att_key_num_nodes": [16],
        "att_key_network_type": 0,
        "att_value_input": "tap_value",
        "att_value_num_nodes": [],
        "att_value_network_type": 0,
        "att_num_heads": 2,
        "att_split_key": False,
        "att_use_scale": True,
        "att_apply_nonlinear": False,
        "att_penalty_term": 0.5,
        "batchnorm_momentum": 0.99,
    }
    cfg.update(kw)
    return cfg


def test_self_attention_oracle():
    """Re-compute attention pooling in numpy from the extracted params."""
    rng = np.random.RandomState(4)
    B, L, DK, DV, H = 3, 20, 16, 8, 2
    key_in = rng.randn(B, L, 32).astype(np.float32)
    value_in = rng.randn(B, L, DV).astype(np.float32)
    cfg = attention_cfg()
    pool = SelfAttentionPooling(config=cfg)
    endpoints = {"tap_key": jnp.asarray(key_in), "tap_value": jnp.asarray(value_in)}
    v = pool.init(jax.random.PRNGKey(1), jnp.asarray(value_in), dict(endpoints))
    ep = dict(endpoints)
    out = pool.apply(v, jnp.asarray(value_in), ep)

    p = flax.traverse_util.flatten_dict(v["params"])
    kw = np.asarray(p[("att_key0", "affine", "kernel")])
    kb = np.asarray(p[("att_key0", "affine", "bias")])
    query = np.asarray(p[("query",)])
    key = key_in @ kw + kb  # [B, L, 16]
    logits = np.einsum("bld,hd->blh", key, query) / np.sqrt(DK)
    w = np.exp(logits - logits.max(axis=1, keepdims=True))
    w = (w / w.sum(axis=1, keepdims=True)).transpose(0, 2, 1)  # [B, H, L]
    val = value_in.reshape(B, L, H, DV // H).transpose(0, 2, 1, 3)
    mean = np.einsum("bhld,bhl->bhd", val, w)
    var = np.einsum("bhld,bhl->bhd", (val - mean[:, :, None, :]) ** 2, w)
    var = np.maximum(var, 1e-12)
    expected = np.concatenate(
        [mean.reshape(B, -1), np.sqrt(var).reshape(B, -1)], axis=1
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)
    # penalty: sum ||WW^T - I||^2 / B * term
    gram = np.einsum("bhl,bkl->bhk", w, w) - np.eye(H)
    pen = 0.5 * (gram**2).sum() / B
    np.testing.assert_allclose(float(ep["attention_penalty"]), pen, rtol=1e-4)


def test_self_attention_uniform_weights_equal_stats():
    # With a zero query, attention weights are uniform; weighted stats ==
    # plain statistics pooling on the value tap.
    rng = np.random.RandomState(5)
    B, L, DV = 2, 30, 8
    value_in = rng.randn(B, L, DV).astype(np.float32)
    key_in = rng.randn(B, L, 12).astype(np.float32)
    cfg = attention_cfg(att_num_heads=1, att_penalty_term=0.0)
    pool = SelfAttentionPooling(config=cfg)
    endpoints = {"tap_key": jnp.asarray(key_in), "tap_value": jnp.asarray(value_in)}
    v = pool.init(jax.random.PRNGKey(2), jnp.asarray(value_in), dict(endpoints))
    v = flax.core.unfreeze(v) if hasattr(flax.core, "unfreeze") else v
    v["params"]["query"] = jnp.zeros_like(v["params"]["query"])
    v["params"]["att_key0"]["affine"]["kernel"] = jnp.zeros_like(
        v["params"]["att_key0"]["affine"]["kernel"]
    )
    out = pool.apply(v, jnp.asarray(value_in), dict(endpoints))
    np.testing.assert_allclose(
        np.asarray(out), oracles.np_stats_pooling(value_in), rtol=1e-4, atol=1e-5
    )


def test_ghost_vlad_oracle():
    rng = np.random.RandomState(6)
    B, L, D, C, G = 2, 15, 8, 4, 2
    value_in = rng.randn(B, L, D).astype(np.float32)
    cfg = {
        "vlad_num_centers": C,
        "vlad_num_ghosts": G,
        "vlad_key_input": "tap",
        "vlad_key_num_nodes": [],
        "vlad_value_input": "tap",
        "vlad_value_num_nodes": [],
        "vlad_final_l2_norm": True,
        "batchnorm_momentum": 0.99,
    }
    pool = GhostVLAD(config=cfg)
    endpoints = {"tap": jnp.asarray(value_in)}
    v = pool.init(jax.random.PRNGKey(3), jnp.asarray(value_in), dict(endpoints))
    out = pool.apply(v, jnp.asarray(value_in), dict(endpoints))

    p = flax.traverse_util.flatten_dict(v["params"])
    aw = np.asarray(p[("vlad_weight_affine", "kernel")])
    ab = np.asarray(p[("vlad_weight_affine", "bias")])
    centers = np.asarray(p[("vlad_centers",)])
    logits = value_in @ aw + ab
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    a = e / e.sum(axis=-1, keepdims=True)  # [B, L, C+G]
    res = value_in[:, :, None, :] - centers[None, None, :, :]
    agg = (a[..., None] * res).sum(axis=1)  # [B, C+G, D]
    agg = agg[:, :C, :]
    agg = agg / np.maximum(np.linalg.norm(agg, axis=-1, keepdims=True), 1e-12)
    flat = agg.reshape(B, -1)
    flat = flat / np.maximum(np.linalg.norm(flat, axis=-1, keepdims=True), 1e-12)
    np.testing.assert_allclose(np.asarray(out), flat, rtol=1e-4, atol=1e-5)


def test_pairwise_helpers():
    x = np.random.RandomState(7).randn(6, 5).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(pairwise_euc_distances(jnp.asarray(x))),
        oracles.np_pairwise_euc(x),
        rtol=1e-4,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(pairwise_cos_similarity(jnp.asarray(x))),
        oracles.np_pairwise_cos(x),
        rtol=1e-4,
        atol=1e-5,
    )
    y = l2_scaling(jnp.asarray(x), 3.0)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1), 3.0, rtol=1e-5)


def test_tdnn_with_attention_pooling_end_to_end():
    cfg = dict(
        BASE_CFG,
        pooling_type="self_attention",
        att_key_input="tdnn5_relu",
        att_key_num_nodes=[64, 16],
        att_key_network_type=2,
        att_value_input="tdnn5_relu",
        att_value_num_nodes=[],
        att_value_network_type=0,
        att_num_heads=2,
        att_split_key=False,
        att_use_scale=True,
        att_apply_nonlinear=False,
        att_penalty_term=1.0,
    )
    net, variables, x = init_net(cfg, L=60)
    out, ep = net.apply(variables, x, False)
    assert out.shape == (4, 512)
    assert float(ep["attention_penalty"]) >= 0
    w = np.asarray(ep["attention_weights"])
    np.testing.assert_allclose(w.sum(axis=-1), 1.0, rtol=1e-5)


def test_tdnn_with_vlad_pooling_end_to_end():
    cfg = dict(
        BASE_CFG,
        pooling_type="ghost_vlad",
        vlad_num_centers=8,
        vlad_num_ghosts=1,
        vlad_key_input="tdnn5_relu",
        vlad_key_num_nodes=[],
        vlad_value_input="tdnn5_relu",
        vlad_value_num_nodes=[64],
        vlad_final_l2_norm=False,
    )
    net, variables, x = init_net(cfg, L=60)
    out, ep = net.apply(variables, x, False)
    assert out.shape == (4, 512)
    assert ep["pooling"].shape == (4, 8 * 64)
