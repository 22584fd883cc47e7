"""TF-checkpoint EXPORT: the interop inverse of test_tf_import.

A model trained here must restore into the original tf-kaldi-speaker code
(reference model/trainer.py:142-166 Saver load). These tests pin the
export -> import round trip through the real mapping tables (every exported
name is also verified against map_tf_name inside the exporter itself), the
pointer-file contract, and the CLI.
"""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tf_kaldi_speaker_tpu.kio.tf_bundle import read_tf_checkpoint
from tf_kaldi_speaker_tpu.train.tf_export import (
    export_reference_checkpoint,
    map_flax_leaf,
)
from tf_kaldi_speaker_tpu.train.tf_import import import_reference_checkpoint
from tf_kaldi_speaker_tpu.train.trainer import Trainer
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
from test_trainer import TINY


def _export_import(tmp_path, cfg, loss, dim=20, n_spk=8):
    """Build -> export -> import into a differently-seeded trainer."""
    params = ParamsPlain(**cfg)
    t = Trainer(params, str(tmp_path / "src" / "nnet"), dim=dim, num_speakers=n_spk)
    t.build("train", dim, loss, n_spk)
    t.build("predict", dim)
    x = np.random.RandomState(0).randn(80, dim).astype(np.float32)
    ref_emb = t.predict(x)

    prefix = str(tmp_path / "tf" / "model-7")
    exported, skipped = export_reference_checkpoint(
        jax.device_get(t.state.params), jax.device_get(t.state.batch_stats),
        prefix, step=7)

    t2 = Trainer(ParamsPlain(**dict(cfg, seed=123)),
                 str(tmp_path / "dst" / "nnet"), dim=dim, num_speakers=n_spk)
    t2.build("train", dim, loss, n_spk)
    t2.build("predict", dim)
    assert not np.allclose(t2.predict(x), ref_emb)  # different init
    imported, imp_skipped = import_reference_checkpoint(prefix, t2)
    return exported, skipped, imported, ref_emb, t2.predict(x)


def test_roundtrip_tdnn(tmp_path):
    exported, skipped, imported, ref, got = _export_import(
        tmp_path, TINY, TINY["loss_func"])
    assert skipped == []          # every leaf has a reference name
    assert sorted(imported) == sorted(exported)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-5)
    assert "tdnn/tdnn1_conv/kernel" in exported
    assert "tdnn/tdnn3_bn/moving_variance" in exported


def test_roundtrip_prelu_attention_ring(tmp_path):
    cfg = dict(
        TINY, pooling_type="self_attention", network_relu_type="prelu",
        att_key_input="tdnn3_relu", att_value_input="tdnn3_relu",
        att_key_num_nodes=[16], att_value_num_nodes=[16],
        att_key_network_type=2, att_value_network_type=2,
        att_num_heads=2, att_apply_nonlinear=True,
        loss_func="softmax", aux_loss_func=["ring_loss"],
        ring_loss_init=10.0, ring_loss_lambda=0.01,
    )
    exported, skipped, imported, ref, got = _export_import(tmp_path, cfg, "softmax")
    assert skipped == []
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-5)
    for name in (
        "tdnn/attention/query",
        "tdnn/attention/att_key0/att_key0_dense/kernel",
        "tdnn/attention/att_key0/att_key0_bn/moving_mean",
        "tdnn/attention/att_key0/att_key0_relu/alpha",
        "tdnn/attention/att_post_bn/gamma",
        "tdnn/attention/att_post_relu/alpha",
        "tdnn/tdnn1_relu/alpha",
        "softmax/output/bias",
        "softmax_ringloss/r",
    ):
        assert name in exported, name


def test_roundtrip_vlad(tmp_path):
    cfg = dict(
        TINY, pooling_type="ghost_vlad", vlad_num_centers=4, vlad_num_ghosts=1,
        vlad_key_input="tdnn3_relu", vlad_value_input="tdnn3_relu",
        vlad_key_num_nodes=[16], vlad_value_num_nodes=[16],
    )
    exported, skipped, imported, ref, got = _export_import(
        tmp_path, cfg, "additive_margin_softmax")
    assert skipped == []
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-5)
    for name in (
        "tdnn/vlad/vlad_centers",
        "tdnn/vlad/vlad_weight_affine/kernel",
        "tdnn/vlad/vlad_key0/vlad_key0_dense/bias",
        "tdnn/vlad/vlad_value0/vlad_value0_bn/moving_variance",
    ):
        assert name in exported, name


def test_momentum_slots_and_global_step(tmp_path):
    params = ParamsPlain(**TINY)
    t = Trainer(params, str(tmp_path / "nnet"), dim=20, num_speakers=8)
    t.build("train", 20, params.loss_func, 8)
    prefix = str(tmp_path / "tf" / "model-42")
    export_reference_checkpoint(
        jax.device_get(t.state.params), jax.device_get(t.state.batch_stats),
        prefix, step=42, momentum_slots=True)
    got = read_tf_checkpoint(prefix)
    assert int(got["global_step"]) == 42
    assert got["global_step"].dtype == np.int64
    assert "tdnn/tdnn1_conv/kernel/Momentum" in got
    assert got["tdnn/tdnn1_conv/kernel/Momentum"].shape == got["tdnn/tdnn1_conv/kernel"].shape
    assert not np.any(got["tdnn/tdnn1_conv/kernel/Momentum"])
    # moving stats are not trainable -> no slots
    assert "tdnn/tdnn1_bn/moving_mean/Momentum" not in got
    # pointer file in the reference's proto-text shape
    with open(str(tmp_path / "tf" / "checkpoint")) as f:
        text = f.read()
    assert 'model_checkpoint_path: "model-42"' in text


def test_unmapped_leaves_reported():
    assert map_flax_leaf("params", ("network", "ecapa", "block1", "kernel")) is None
    assert map_flax_leaf("params", ("network", "tdnn", "tdnn1_conv", "oddleaf")) is None


def test_multitask_names():
    # multitask encoders live at the tree root (multitask/model.py)
    name, tr = map_flax_leaf("params", ("conv1", "kernel"))
    assert name == "encoder/conv1/kernel"
    assert tr(np.zeros((5, 3, 4), np.float32)).shape == (1, 5, 3, 4)
    assert map_flax_leaf("params", ("phn_conv1", "kernel"))[0] == "encoder_phone/phn_conv1/kernel"
    assert map_flax_leaf("params", ("zs_dense", "kernel"))[0] == "encoder/zs_dense/kernel"
    assert map_flax_leaf("batch_stats", ("zp_bn", "var"))[0] == "encoder_phone/zp_bn/moving_variance"
    assert map_flax_leaf("params", ("bn3", "scale"))[0] == "encoder/bn3/gamma"


def test_export_cli(tmp_path):
    import json

    from tf_kaldi_speaker_tpu.cli import export_tf_checkpoint as cli

    params = ParamsPlain(**TINY)
    nnet = str(tmp_path / "model" / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=8)
    t.build("train", 20, params.loss_func, 8)
    t.save(0)
    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(TINY, f)
    with open(os.path.join(nnet, "feature_dim"), "w") as f:
        f.write("20")
    out = str(tmp_path / "tf_out")
    rc = cli.main([str(tmp_path / "model"), out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "model-0.index"))
    assert os.path.exists(os.path.join(out, "model-0.data-00000-of-00001"))
    assert os.path.exists(os.path.join(out, "checkpoint"))
    assert os.path.exists(os.path.join(out, "config.json"))
    got = read_tf_checkpoint(os.path.join(out, "model-0"))
    assert "tdnn/tdnn1_conv/kernel" in got

    # Exporting an OLDER step must not repoint the source model dir.
    from tf_kaldi_speaker_tpu.train import checkpoints

    t.save(5)
    assert checkpoints.read_pointer(nnet) == 5
    rc = cli.main(["--checkpoint", "0", str(tmp_path / "model"),
                   str(tmp_path / "tf_out_old")])
    assert rc == 0
    assert checkpoints.read_pointer(nnet) == 5  # untouched
    assert os.path.exists(os.path.join(str(tmp_path / "tf_out_old"),
                                       "model-0.index"))


def test_export_cli_failure_writes_nothing(tmp_path, monkeypatch):
    """A refused export (unmappable variables, no --allow-partial) must not
    leave a complete-looking checkpoint in out_dir."""
    import json

    from tf_kaldi_speaker_tpu.cli import export_tf_checkpoint as cli
    from tf_kaldi_speaker_tpu.train import tf_export

    params = ParamsPlain(**TINY)
    nnet = str(tmp_path / "model" / "nnet")
    t = Trainer(params, nnet, dim=20, num_speakers=8)
    t.build("train", 20, params.loss_func, 8)
    t.save(0)
    with open(os.path.join(nnet, "config.json"), "w") as f:
        json.dump(TINY, f)

    real_map = tf_export.map_flax_leaf

    def partial_map(coll, path):
        # make one real leaf unmappable -> skipped, rc 1 without
        # --allow-partial
        if path and path[-1] == "kernel":
            return None
        return real_map(coll, path)

    monkeypatch.setattr(tf_export, "map_flax_leaf", partial_map)
    out = str(tmp_path / "tf_out")
    rc = cli.main([str(tmp_path / "model"), out])
    assert rc == 1
    assert not os.path.exists(out)  # nothing written at all

    rc = cli.main(["--allow-partial", str(tmp_path / "model"), out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "model-0.index"))


def test_crc32c_native_matches_python():
    """The native tfks_crc32c must agree with the pure-Python table (and the
    published CRC32C check vector) so exported checkpoints are identical
    whichever path computed the checksums."""
    from tf_kaldi_speaker_tpu.kio import native_decode as nd
    from tf_kaldi_speaker_tpu.kio import tf_bundle as tb

    def py_crc(data):
        crc = 0xFFFFFFFF
        for b in data:
            crc = tb._CRC32C_TABLE[(crc ^ b) & 0xFF] ^ (crc >> 8)
        return crc ^ 0xFFFFFFFF

    assert py_crc(b"123456789") == 0xE3069283  # RFC 3720 check value
    if not nd.native_available():
        pytest.skip("native core unavailable")
    rng = np.random.RandomState(0)
    for n in (0, 1, 7, 8, 9, 64, 1000, 4097):
        data = rng.randint(0, 256, n, dtype=np.uint8).tobytes()
        assert nd.crc32c_fast(data) == py_crc(data), n


def test_roundtrip_multitask(tmp_path):
    """Export the multitask encoders (speaker+phone trunks) and re-import;
    only the loss heads (no reference TF name) are skipped."""
    from tf_kaldi_speaker_tpu.multitask.trainer import TrainerMultiTask
    from test_multitask import MT_CFG

    t = TrainerMultiTask(ParamsPlain(**MT_CFG), str(tmp_path / "src" / "nnet"),
                         dim=20, num_speakers=5, num_phones=12)
    t.build("train", 20, num_speakers=5, num_phones=12)
    prefix = str(tmp_path / "tf" / "model-1")
    exported, skipped = export_reference_checkpoint(
        jax.device_get(t.state.params), jax.device_get(t.state.batch_stats),
        prefix, step=1)
    assert sorted(skipped) == [
        "params:phn_softmax/output_bias", "params:phn_softmax/output_kernel",
        "params:spk_softmax/output_bias", "params:spk_softmax/output_kernel",
    ]
    for name in ("encoder/conv1/kernel", "encoder/dense6/bias",
                 "encoder/zs_bn/moving_mean", "encoder_phone/phn_conv3/kernel",
                 "encoder_phone/phn_bn5/moving_variance",
                 "encoder_phone/zp_dense/kernel"):
        assert name in exported, name

    t2 = TrainerMultiTask(ParamsPlain(**dict(MT_CFG, seed=9)),
                          str(tmp_path / "dst" / "nnet"),
                          dim=20, num_speakers=5, num_phones=12)
    t2.build("train", 20, num_speakers=5, num_phones=12)
    imported, _ = import_reference_checkpoint(prefix, t2)
    assert sorted(imported) == sorted(exported)
    src = jax.device_get(t.state.params)
    dst = jax.device_get(t2.state.params)
    np.testing.assert_array_equal(src["conv1"]["kernel"], dst["conv1"]["kernel"])
    np.testing.assert_array_equal(src["phn_conv5"]["kernel"], dst["phn_conv5"]["kernel"])
