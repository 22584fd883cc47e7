"""Decode-on-device input path: raw codes through sampler and train step."""

import numpy as np

from tf_kaldi_speaker_tpu.data import RandomChunkSampler
from tf_kaldi_speaker_tpu.kio import FeatureReader
from tf_kaldi_speaker_tpu.ops.cm_dequant_pallas import cm_dequantize_jnp
from tf_kaldi_speaker_tpu.train.trainer import Trainer
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir
from test_trainer import TINY


def test_read_segment_codes_matches_decode(fake_data):
    r = FeatureReader(fake_data["data"])
    with open(fake_data["feats_scp"]) as f:
        segments = [line.strip() for line in f][:4]
    for seg in segments:
        codes, headers, start = r.read_segment_codes(seg, length=60, start=5)
        dec, _ = r.read_segment(seg, length=60, start=5)
        assert codes.shape == (60, 24) and codes.dtype == np.uint8
        assert headers.shape == (4, 24)
        import jax.numpy as jnp

        out = np.asarray(cm_dequantize_jnp(jnp.asarray(codes[None]), jnp.asarray(headers[None])))[0]
        np.testing.assert_allclose(out, dec, rtol=1e-5, atol=1e-5)
    r.close()


def test_raw_sampler_and_device_decode_train(tmp_path):
    d = make_fake_data_dir(
        str(tmp_path / "dd"), num_speakers=8, utts_per_speaker=4, dim=20,
        min_len=100, max_len=160,
    )
    s = RandomChunkSampler(
        d["data"], d["spklist"], num_speakers=4, min_len=64, max_len=96,
        seed=0, raw_codes=True,
    )
    codes, headers, labels = next(iter(s))
    assert codes.dtype == np.uint8 and headers.shape[1] == 4
    s.close()

    params = ParamsPlain(**dict(TINY, device_decode=True, num_steps_per_epoch=4,
                                save_checkpoints_steps=4))
    t = Trainer(params, str(tmp_path / "m" / "nnet"), dim=20, num_speakers=8)
    t.build("train", 20, params.loss_func, 8)
    t.train(d["data"], d["spklist"], 0.05)
    assert int(t.state.step) == 4
