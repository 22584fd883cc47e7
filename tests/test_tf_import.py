"""TF-checkpoint import: bundle round trip + name mapping end to end.

Fixtures come from two sources: our own TensorBundle-format writer
(round-trip tests) and a checkpoint written ONCE by real TensorFlow
(tf.compat.v1.train.Saver, TF 2.21) checked into tests/data/tf_fixture/ —
the reader must read actual-TF bytes bit-exactly, not just its own
writer's output.
"""

import os

import jax
import numpy as np

from tf_kaldi_speaker_tpu.kio.tf_bundle import read_tf_checkpoint, write_tf_checkpoint
from tf_kaldi_speaker_tpu.train.tf_import import import_reference_checkpoint, map_tf_name
from tf_kaldi_speaker_tpu.train.trainer import Trainer
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
from test_trainer import TINY


def test_bundle_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    tensors = {
        "a/b/kernel": rng.randn(3, 4).astype(np.float32),
        "a/b/bias": rng.randn(4).astype(np.float32),
        "scalar": np.float32(2.5).reshape(()),
        "ints": np.arange(6, dtype=np.int64).reshape(2, 3),
    }
    prefix = str(tmp_path / "model-100")
    write_tf_checkpoint(prefix, tensors)
    got = read_tf_checkpoint(prefix)
    assert sorted(got) == sorted(tensors)
    for k in tensors:
        np.testing.assert_array_equal(got[k], tensors[k])


def test_read_real_tensorflow_checkpoint():
    """Bit-exact read of a bundle written by actual TF (not our writer).

    tests/data/tf_fixture/ was generated once with
    tf.compat.v1.train.Saver().save(...) over reference-shaped variable
    names (tdnn/*, softmax/output/kernel, global_step) and the expected
    values stored alongside as .npz.
    """
    here = os.path.dirname(os.path.abspath(__file__))
    prefix = os.path.join(here, "data", "tf_fixture", "model-1234")
    expected = np.load(os.path.join(here, "data", "tf_fixture", "expected.npz"))
    got = read_tf_checkpoint(prefix)
    assert sorted(got) == sorted(expected.files)
    for name in expected.files:
        assert got[name].dtype == expected[name].dtype, name
        np.testing.assert_array_equal(got[name], expected[name], err_msg=name)


def test_map_tf_names():
    assert map_tf_name("tdnn/tdnn1_conv/kernel")[1] == ("network", "tdnn", "tdnn1_conv", "kernel")
    assert map_tf_name("tdnn/tdnn4_bn/moving_mean")[0] == "batch_stats"
    assert map_tf_name("tdnn/attention/query")[1][-1] == "query"
    assert map_tf_name("tdnn/attention/att_key0/att_key0_dense/kernel")[1] == (
        "network", "tdnn", "self_attention", "att_key0", "affine", "kernel")
    assert map_tf_name("softmax/output/kernel")[1] == ("softmax", "output_kernel")
    assert map_tf_name("tdnn/tdnn1_conv/kernel/Momentum") is None
    assert map_tf_name("global_step") is None
    assert map_tf_name("tdnn/vlad/vlad_centers")[1][-1] == "vlad_centers"


def test_import_reference_shaped_checkpoint(tmp_path):
    """Round trip: our params -> TF-named bundle -> import -> same predict."""
    params = ParamsPlain(**TINY)
    t = Trainer(params, str(tmp_path / "src" / "nnet"), dim=20, num_speakers=8)
    t.build("train", 20, params.loss_func, 8)
    t.build("predict", 20)
    x = np.random.RandomState(0).randn(80, 20).astype(np.float32)
    ref_emb = t.predict(x)

    # Export our state under the REFERENCE's TF variable names.
    p = jax.device_get(t.state.params)
    bs = jax.device_get(t.state.batch_stats)
    tensors = {}
    tdnn_p = p["network"]["tdnn"]
    tdnn_b = bs["network"]["tdnn"]
    for name, sub in tdnn_p.items():
        if name.endswith("_conv"):
            tensors["tdnn/%s/kernel" % name] = np.asarray(sub["kernel"])[None]  # [1,k,i,o]
            tensors["tdnn/%s/bias" % name] = np.asarray(sub["bias"])
        elif name.endswith("_dense"):
            tensors["tdnn/%s/kernel" % name] = np.asarray(sub["kernel"])
            tensors["tdnn/%s/bias" % name] = np.asarray(sub["bias"])
        elif name.endswith("_bn"):
            tensors["tdnn/%s/gamma" % name] = np.asarray(sub["scale"])
            tensors["tdnn/%s/beta" % name] = np.asarray(sub["bias"])
    for name, sub in tdnn_b.items():
        tensors["tdnn/%s/moving_mean" % name] = np.asarray(sub["mean"])
        tensors["tdnn/%s/moving_variance" % name] = np.asarray(sub["var"])
    tensors["softmax/output/kernel"] = np.asarray(p["softmax"]["output_kernel"])
    tensors["tdnn/tdnn1_conv/kernel/Momentum"] = np.zeros((1, 5, 20, 32), np.float32)

    prefix = str(tmp_path / "tf" / "model-42")
    os.makedirs(os.path.dirname(prefix))
    write_tf_checkpoint(prefix, tensors)

    # Import into a DIFFERENTLY-seeded trainer and compare predictions.
    params2 = ParamsPlain(**dict(TINY, seed=123))
    t2 = Trainer(params2, str(tmp_path / "dst" / "nnet"), dim=20, num_speakers=8)
    t2.build("train", 20, params.loss_func, 8)
    t2.build("predict", 20)
    assert not np.allclose(t2.predict(x), ref_emb)  # different init

    imported, skipped = import_reference_checkpoint(prefix, t2)
    assert len(imported) >= 30
    assert "tdnn/tdnn1_conv/kernel/Momentum" in skipped
    np.testing.assert_allclose(t2.predict(x), ref_emb, rtol=2e-3, atol=2e-5)


def test_import_cli(tmp_path):
    import json

    from tf_kaldi_speaker_tpu.cli import import_tf_checkpoint as cli

    params = ParamsPlain(**TINY)
    t = Trainer(params, str(tmp_path / "src" / "nnet"), dim=20, num_speakers=8)
    t.build("train", 20, params.loss_func, 8)
    p = jax.device_get(t.state.params)
    tensors = {"softmax/output/kernel": np.asarray(p["softmax"]["output_kernel"])}
    prefix = str(tmp_path / "model-7")
    write_tf_checkpoint(prefix, tensors)
    cfg_path = str(tmp_path / "c.json")
    with open(cfg_path, "w") as f:
        json.dump(TINY, f)
    rc = cli.main(["--config", cfg_path, "--feature-dim", "20",
                   "--num-speakers", "8", prefix, str(tmp_path / "out")])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "out" / "nnet" / "model-0.msgpack"))
