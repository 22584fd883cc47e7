"""Every shipped recipe config must load and build its model (full widths)."""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from tf_kaldi_speaker_tpu.utils.params import Params

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "recipes", "*", "*", "nnet_conf", "*.json")))


def test_configs_exist():
    assert len(CONFIGS) >= 5


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_builds(path):
    params = Params(path)
    cfg = params.dict
    feats = jnp.zeros((2, 64, 30), jnp.float32)
    if "phone_kernel_size" in cfg:  # multitask config
        from tf_kaldi_speaker_tpu.multitask.model import MultitaskModel

        lc, rc = cfg["phone_left_context"], cfg["phone_right_context"]
        model = MultitaskModel(config=cfg, num_speakers=50, num_phones=100)
        L = 40
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((2, L + lc + rc, 30), jnp.float32),
            jnp.zeros((2,), jnp.int32),
            jnp.zeros((2, L), jnp.int32),
            jnp.full((2,), L, jnp.int32),
            jnp.zeros((2, cfg.get("num_frames_per_utt", 10)), jnp.int32),
            0,
            False,
        )
        assert "conv1" in variables["params"]
    else:
        from tf_kaldi_speaker_tpu.train.trainer import XVectorModel

        model = XVectorModel(config=cfg, loss_func=cfg["loss_func"], num_outputs=50)
        variables = model.init(
            jax.random.PRNGKey(0), feats, jnp.zeros((2,), jnp.int32), 0, False
        )
        loss, endpoints = model.apply(
            variables, feats, jnp.zeros((2,), jnp.int32), 0, False
        )
        assert cfg["embedding_node"] in endpoints
