"""Padded+masked forward must equal unpadded forward for EVERY pooling type.

This is the property that makes bucketed batched extraction exact
(extract/extractor.py); verified end-to-end through the full TDNN.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_kaldi_speaker_tpu.models import EntireNetwork

BASE = {
    "tdnn_layer_size": 32,
    "num_nodes_pooling_layer": 64,
    "num_nodes_last_layer": 32,
    "batchnorm_momentum": 0.99,
}

CFGS = {
    "statistics_pooling": dict(BASE, pooling_type="statistics_pooling"),
    "fused_statistics": dict(BASE, pooling_type="statistics_pooling", use_fused_pooling=True),
    "self_attention": dict(
        BASE,
        pooling_type="self_attention",
        att_key_input="tdnn5_relu",
        att_key_num_nodes=[16],
        att_key_network_type=0,
        att_value_input="tdnn5_relu",
        att_value_num_nodes=[],
        att_value_network_type=0,
        att_num_heads=2,
        att_split_key=False,
        att_use_scale=True,
        att_apply_nonlinear=False,
        att_penalty_term=0.0,
    ),
    "ghost_vlad": dict(
        BASE,
        pooling_type="ghost_vlad",
        vlad_num_centers=4,
        vlad_num_ghosts=1,
        vlad_key_input="tdnn5_relu",
        vlad_key_num_nodes=[],
        vlad_value_input="tdnn5_relu",
        vlad_value_num_nodes=[],
        vlad_final_l2_norm=False,
    ),
}


@pytest.mark.parametrize("name", sorted(CFGS))
def test_padded_masked_equals_unpadded(name):
    cfg = CFGS[name]
    net = EntireNetwork(config=cfg)
    rng = np.random.RandomState(0)
    x = rng.randn(1, 80, 20).astype(np.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    out_ref, _ = net.apply(variables, jnp.asarray(x), False)

    xpad = np.concatenate([x, rng.randn(1, 40, 20).astype(np.float32)], axis=1)
    mask = np.concatenate([np.ones((1, 80)), np.zeros((1, 40))], axis=1).astype(np.float32)
    out_pad, _ = net.apply(variables, jnp.asarray(xpad), False, mask=jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out_pad), np.asarray(out_ref), rtol=2e-3, atol=2e-4,
        err_msg="padded+masked forward differs for %s" % name,
    )
