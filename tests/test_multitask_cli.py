"""Multitask CLI e2e: train_mt → extract_mt → compute_loglike/extract_mt_phone."""

import json
import os

import numpy as np

from tf_kaldi_speaker_tpu.kio import read_mat_ark, read_vec_flt_ark
from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir
from test_multitask import MT_CFG, NUM_PHONES


def test_mt_cli_pipeline(tmp_path):
    from tf_kaldi_speaker_tpu.cli import (
        compute_loglike,
        extract_mt,
        extract_mt_phone,
        train_mt,
    )

    train_d = make_fake_data_dir(
        str(tmp_path / "train"), num_speakers=5, utts_per_speaker=4, dim=20,
        min_len=120, max_len=200, with_vad_ali=True, num_phones=NUM_PHONES, seed=0,
    )
    valid_d = make_fake_data_dir(
        str(tmp_path / "valid"), num_speakers=5, utts_per_speaker=2, dim=20,
        min_len=120, max_len=200, with_vad_ali=True, num_phones=NUM_PHONES, seed=1,
    )
    cfg = dict(
        MT_CFG,
        num_epochs=1,
        reduce_lr_epochs=2,
        early_stop_epochs=4,
        min_learning_rate=1e-6,
    )
    cfg_path = str(tmp_path / "mt.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    model_dir = str(tmp_path / "exp")

    rc = train_mt.main([
        "--config", cfg_path,
        train_d["data"], train_d["ali_dir"], train_d["spklist"],
        valid_d["data"], valid_d["ali_dir"], valid_d["spklist"],
        model_dir,
    ])
    assert rc == 0
    nnet = os.path.join(model_dir, "nnet")
    assert os.path.exists(os.path.join(nnet, "num_phones"))
    assert os.path.exists(os.path.join(model_dir, "speaker_egs"))

    out_ark = str(tmp_path / "xv.ark")
    rc = extract_mt.main([
        "--min-chunk-size", "10", model_dir,
        "ark:" + os.path.join(train_d["data"], "feats.ark"), "ark:" + out_ark,
    ])
    assert rc == 0
    embs = dict(read_vec_flt_ark(out_ark))
    assert len(embs) == 20 and all(v.shape == (32,) for v in embs.values())

    # phone posterior dump
    phn_ark = str(tmp_path / "phn.ark")
    rc = extract_mt_phone.main([
        model_dir, "ark:" + os.path.join(valid_d["data"], "feats.ark"), "ark:" + phn_ark,
    ])
    assert rc == 0
    mats = dict(read_mat_ark(phn_ark))
    assert all(m.shape[1] == NUM_PHONES for m in mats.values())

    # loglike with uniform prior
    prior_path = str(tmp_path / "prior.vec")
    with open(prior_path, "w") as f:
        f.write("[ " + " ".join(["%f" % (1.0 / NUM_PHONES)] * NUM_PHONES) + " ]\n")
    ll_ark = str(tmp_path / "ll.ark")
    rc = compute_loglike.main([
        "--prior", prior_path, model_dir,
        "ark:" + os.path.join(valid_d["data"], "feats.ark"), "ark:" + ll_ark,
    ])
    assert rc == 0
    lls = dict(read_mat_ark(ll_ark))
    key = next(iter(lls))
    # loglike = logpost - logprior; logsumexp(logpost)=0 per frame
    lp = lls[key] + np.log(1.0 / NUM_PHONES)
    np.testing.assert_allclose(np.log(np.sum(np.exp(lp), axis=-1)), 0.0, atol=1e-4)
