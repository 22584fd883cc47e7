"""Golden forward parity against a REAL TensorFlow graph.

tests/data/tf_golden/ holds a checkpoint + input/output arrays produced by
scripts/make_tf_golden.py, which runs the reference architecture
(/root/reference/model/tdnn.py:8-191, pooling.py:9-34, loss.py:172-257)
under actual TF 2.21. Here the checkpoint is imported through the real
importer (train/tf_import.py) and the flax forward must reproduce the TF
endpoints, losses, and BN-momentum update within fp32 tolerance — this
test FAILS if BN epsilon, conv orientation, pooling floor, or the
AM-softmax lambda/margin numerics diverge from real TF (VERDICT r2 #2)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_kaldi_speaker_tpu.train.tf_import import import_reference_checkpoint
from tf_kaldi_speaker_tpu.train.trainer import Trainer
from tf_kaldi_speaker_tpu.utils.params import ParamsPlain

HERE = os.path.dirname(os.path.abspath(__file__))
GOLD = os.path.join(HERE, "data", "tf_golden")

CFG = dict(
    seed=0,
    network_type="tdnn",
    tdnn_layer_size=32,
    num_nodes_pooling_layer=64,
    num_nodes_last_layer=32,
    pooling_type="statistics_pooling",
    embedding_node="tdnn6_dense",
    last_layer_linear=True,
    loss_func="additive_margin_softmax",
    amsoftmax_m=0.2,
    amsoftmax_lambda_min=0.0,
    amsoftmax_lambda_base=1000.0,
    amsoftmax_lambda_gamma=1e-4,
    amsoftmax_lambda_power=5.0,
    batchnorm_momentum=0.95,
    optimizer="sgd",
    weight_l2_regularizer=0.0,
)


@pytest.fixture(scope="module")
def imported(tmp_path_factory):
    gold = np.load(os.path.join(GOLD, "golden.npz"))
    params = ParamsPlain(**CFG)
    t = Trainer(params, str(tmp_path_factory.mktemp("tfgold") / "nnet"),
                dim=20, num_speakers=10)
    t.build("train", 20, CFG["loss_func"], 10)
    imported, skipped = import_reference_checkpoint(
        os.path.join(GOLD, "model-0"), t)
    # every checkpoint variable must land in the flax tree
    assert not skipped, skipped
    assert len(imported) >= 30
    return t, gold


def _apply(t, gold, train=False, step=0):
    variables = {
        "params": jax.device_get(t.state.params),
        "batch_stats": jax.device_get(t.state.batch_stats),
    }
    return t.network_model.apply(
        variables,
        jnp.asarray(gold["features"]), jnp.asarray(gold["labels"]),
        step, train,
        mutable=["batch_stats"] if train else False,
    )


def test_eval_endpoints_match_tf(imported):
    t, gold = imported
    (loss, ep), = [_apply(t, gold)]
    for name in ("tdnn1_conv", "tdnn2_conv", "tdnn3_conv", "tdnn4_dense",
                 "tdnn5_dense", "pooling", "tdnn6_dense", "tdnn6_bn",
                 "tdnn7_dense", "tdnn7_bn"):
        want = np.squeeze(gold[name])
        got = np.squeeze(np.asarray(ep[name]))
        np.testing.assert_allclose(
            got, want, rtol=1e-4, atol=1e-4,
            err_msg="endpoint %s diverges from real TF" % name)
    # BN path sensitivity: tdnn1_bn uses randomized moving stats + eps.
    np.testing.assert_allclose(
        np.squeeze(np.asarray(ep["tdnn1_bn"])), np.squeeze(gold["tdnn1_bn"]),
        rtol=1e-4, atol=1e-4)


def test_eval_loss_and_logits_match_tf(imported):
    t, gold = imported
    loss0, ep = _apply(t, gold, step=0)
    np.testing.assert_allclose(np.asarray(ep["logits"]), gold["logits"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(loss0), float(gold["loss_step0"]),
                               rtol=1e-4, atol=1e-5)
    loss20k, _ = _apply(t, gold, step=20000)
    np.testing.assert_allclose(float(loss20k), float(gold["loss_step20000"]),
                               rtol=1e-4, atol=1e-5)
    # the lambda anneal must actually move the loss between the two steps
    assert abs(float(loss0) - float(loss20k)) > 1e-4


@pytest.fixture(scope="module")
def loss_gold():
    return np.load(os.path.join(GOLD, "golden_losses.npz"))


_LOSS_CASES = []
for _step in (0, 20000):
    for _m in (1, 2, 4):
        _LOSS_CASES.append(("asoftmax_m%d" % _m, _m, _step))
    for _m in (0.5, 1.0):
        _LOSS_CASES.append(("arcsoftmax_m%s" % _m, _m, _step))
    _LOSS_CASES.append(("amsoftmax_m0.2", 0.2, _step))


@pytest.mark.parametrize("name,m,step", _LOSS_CASES)
def test_margin_loss_values_and_grads_match_tf(loss_gold, name, m, step):
    """A/Arc/AM-softmax loss AND gradients vs real TF on adversarial
    embeddings (aligned/anti-aligned/tiny-norm/sign-boundary rows; the
    arc θ+m>π branch and every Chebyshev sign branch are exercised —
    reference loss.py:129-139, 318-323)."""
    from tf_kaldi_speaker_tpu.losses.margin import (
        amsoftmax_loss, arcsoftmax_loss, asoftmax_loss,
        margin_annealing_lambda)

    feats = jnp.asarray(loss_gold["features"])
    labels = jnp.asarray(loss_gold["labels"])
    kernel = jnp.asarray(loss_gold["kernel"])
    lam = margin_annealing_lambda(step, 0.0, 1000.0, 1e-4, 5.0)
    if name.startswith("asoftmax"):
        fn = lambda f, k: asoftmax_loss(f, labels, k, int(m), lam)[0]
    elif name.startswith("arcsoftmax"):
        fn = lambda f, k: arcsoftmax_loss(f, labels, k, float(m), lam)[0]
    else:
        fn = lambda f, k: amsoftmax_loss(f, labels, k, float(m), lam)[0]

    loss, (dfeat, dkernel) = jax.value_and_grad(fn, argnums=(0, 1))(
        feats, kernel)
    suffix = "_step%d" % step
    np.testing.assert_allclose(
        float(loss), float(loss_gold[name + suffix]), rtol=1e-5, atol=1e-6,
        err_msg="%s loss diverges from real TF" % name)
    np.testing.assert_allclose(
        np.asarray(dfeat), loss_gold[name + suffix + "_dfeat"],
        rtol=1e-4, atol=1e-5,
        err_msg="%s d/dfeatures diverges from real TF" % name)
    np.testing.assert_allclose(
        np.asarray(dkernel), loss_gold[name + suffix + "_dkernel"],
        rtol=1e-4, atol=1e-5,
        err_msg="%s d/dkernel diverges from real TF" % name)


_CFG_ATT = dict(
    CFG,
    pooling_type="self_attention",
    att_key_input="tdnn4_relu",
    att_key_num_nodes=[24, 16],
    att_key_network_type=3,
    att_value_input="tdnn5_relu",
    att_value_num_nodes=[],
    att_value_network_type=0,
    att_num_heads=4,
    att_split_key=False,
    att_use_scale=True,
    att_apply_nonlinear=False,
    att_penalty_term=0.5,
)
_CFG_VLAD = dict(
    CFG,
    pooling_type="ghost_vlad",
    vlad_num_centers=6,
    vlad_num_ghosts=2,
    vlad_key_input="tdnn4_relu",
    vlad_key_num_nodes=[16],
    vlad_value_input="tdnn5_relu",
    vlad_value_num_nodes=[20],
    vlad_final_l2_norm=True,
)
_POOL_PARAM = {"att": ("self_attention", "query"),
               "vlad": ("ghost_vlad", "vlad_centers")}


@pytest.fixture(scope="module", params=["att", "vlad"])
def pool_imported(request, tmp_path_factory):
    """Import the attention/vlad TF checkpoint through the real importer."""
    kind = request.param
    gold = np.load(os.path.join(GOLD, "golden_%s.npz" % kind))
    cfg = {"att": _CFG_ATT, "vlad": _CFG_VLAD}[kind]
    t = Trainer(ParamsPlain(**cfg),
                str(tmp_path_factory.mktemp("tfgold_" + kind) / "nnet"),
                dim=20, num_speakers=10)
    t.build("train", 20, cfg["loss_func"], 10)
    imported, skipped = import_reference_checkpoint(
        os.path.join(GOLD, "model-%s-0" % kind), t)
    assert not skipped, skipped
    return kind, t, gold


def test_pooling_endpoints_match_tf(pool_imported):
    """Attention / GhostVLAD pooling graphs vs real TF: frame-stack taps,
    attention weights / vlad assignments, pooled output, downstream
    embedding, logits, and the head-diversity penalty (reference
    pooling.py:37-192, 195-277)."""
    kind, t, gold = pool_imported
    loss0, ep = _apply(t, gold, step=0)
    names = ["tdnn4_relu", "tdnn5_relu", "pooling", "tdnn6_dense",
             "tdnn7_bn", "logits"]
    names.append("attention_weights" if kind == "att" else "vlad_weights")
    for name in names:
        np.testing.assert_allclose(
            np.asarray(ep[name]), gold[name], rtol=1e-4, atol=1e-4,
            err_msg="%s/%s diverges from real TF" % (kind, name))
    if kind == "att":
        np.testing.assert_allclose(
            float(ep["attention_penalty"]), float(gold["attention_penalty"]),
            rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(loss0), float(gold["loss_step0"]),
                               rtol=1e-4, atol=1e-5)
    loss20k, _ = _apply(t, gold, step=20000)
    np.testing.assert_allclose(float(loss20k), float(gold["loss_step20000"]),
                               rtol=1e-4, atol=1e-5)


def test_pooling_train_mode_and_bn_update_match_tf(pool_imported):
    """Train-mode (batch-stat BN inside the pooling stacks) forward + the
    BN momentum update of the pooling-internal BN vs real TF."""
    kind, t, gold = pool_imported
    (loss, ep), updates = _apply(t, gold, train=True)
    np.testing.assert_allclose(float(loss), float(gold["train_loss_step0"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ep["pooling"]),
                               gold["train_pooling"], rtol=1e-4, atol=1e-4)
    pool_name = _POOL_PARAM[kind][0]
    block = "att_key0" if kind == "att" else "vlad_value0"
    bs = updates["batch_stats"]["network"]["tdnn"][pool_name][block]["bn"]
    np.testing.assert_allclose(
        np.asarray(bs["mean"]), gold["updated_pool_moving_mean"],
        rtol=1e-4, atol=1e-5,
        err_msg="%s BN moving-mean momentum diverges from TF" % kind)
    np.testing.assert_allclose(
        np.asarray(bs["var"]), gold["updated_pool_moving_variance"],
        rtol=1e-4, atol=1e-5)


def test_pooling_param_gradients_match_tf(pool_imported):
    """d(CE + penalty)/d{query | vlad_centers} vs real TF gradients —
    backward parity through the attention softmax / VLAD residual path."""
    kind, t, gold = pool_imported
    pool_name, leaf = _POOL_PARAM[kind]
    batch_stats = jax.device_get(t.state.batch_stats)
    feats = jnp.asarray(gold["features"])
    labels = jnp.asarray(gold["labels"])

    def f(params):
        loss, ep = t.network_model.apply(
            {"params": params, "batch_stats": batch_stats},
            feats, labels, 0, False)
        return loss + ep.get("attention_penalty", 0.0)

    grads = jax.grad(f)(jax.device_get(t.state.params))
    got = np.asarray(grads["network"]["tdnn"][pool_name][leaf])
    want = gold["grad_" + leaf]
    np.testing.assert_allclose(
        got, want, rtol=1e-4, atol=1e-5,
        err_msg="%s d/d%s diverges from real TF" % (kind, leaf))


def test_train_mode_and_bn_update_match_tf(imported):
    t, gold = imported
    (loss, ep), updates = _apply(t, gold, train=True)
    np.testing.assert_allclose(float(loss), float(gold["train_loss_step0"]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ep["pooling"]),
                               gold["train_pooling"], rtol=1e-4, atol=1e-4)
    bs = updates["batch_stats"]["network"]["tdnn"]["tdnn1_bn"]
    np.testing.assert_allclose(
        np.asarray(bs["mean"]), gold["updated_tdnn1_moving_mean"],
        rtol=1e-4, atol=1e-5,
        err_msg="BN moving-mean momentum semantics diverge from TF")
    np.testing.assert_allclose(
        np.asarray(bs["var"]), gold["updated_tdnn1_moving_variance"],
        rtol=1e-4, atol=1e-5,
        err_msg="BN moving-variance momentum semantics diverge from TF")


# ---------------------------------------------------------------- multitask
MT_CFG = dict(
    seed=0,
    tdnn_layer_size=32,
    num_nodes_pooling_layer=48,
    speaker_dim=24,
    phone_dim=24,
    pooling_type="statistics_pooling",
    embedding_node="zs_mu_dense",
    spk_loss_type="softmax",
    phn_loss_type="softmax",
    spk_loss_weight=1.0,
    phn_loss_weight=0.5,
    num_shared_layers=2,
    phone_kernel_size=[5, 5, 7, 1, 3],
    phone_layer_size=[32, 32, 32, 32, 32],
    phone_dilation_size=[1, 1, 1, 1, 2],
    phone_left_context=9,
    phone_right_context=9,
    speaker_left_context=7,
    speaker_right_context=7,
    num_frames_per_utt=-1,
    optimizer="sgd",
    weight_l2_regularizer=0.0,
    batchnorm_momentum=0.95,
)
MT_NUM_SPK, MT_NUM_PHN = 6, 8


@pytest.fixture(scope="module")
def mt_imported(tmp_path_factory):
    from tf_kaldi_speaker_tpu.multitask.trainer import TrainerMultiTask

    gold = np.load(os.path.join(GOLD, "golden_mt.npz"))
    t = TrainerMultiTask(
        ParamsPlain(**MT_CFG),
        str(tmp_path_factory.mktemp("tfgold_mt") / "nnet"),
        dim=20, num_speakers=MT_NUM_SPK, num_phones=MT_NUM_PHN,
    )
    t.build("train", 20, num_speakers=MT_NUM_SPK, num_phones=MT_NUM_PHN)
    imported, skipped = import_reference_checkpoint(
        os.path.join(GOLD, "mt-model-0"), t)
    assert not skipped, skipped
    assert len(imported) >= 50, imported
    return t, gold


def _mt_apply(t, gold, train):
    feats = jnp.asarray(gold["features"])
    lengths = jnp.asarray(gold["lengths"])
    B, L = feats.shape[0], int(gold["zp"].shape[1])
    spk = jnp.zeros((B,), jnp.int32)
    phn = jnp.zeros((B, L), jnp.int32)
    variables = {"params": t.state.params, "batch_stats": t.state.batch_stats}
    if train:
        (loss, ep), upd = t.network_model.apply(
            variables, feats, spk, phn, lengths, None, 0, True,
            mutable=["batch_stats"])
        return ep, upd["batch_stats"]
    loss, ep = t.network_model.apply(
        variables, feats, spk, phn, lengths, None, 0, False)
    return ep, None


def test_mt_golden_eval_endpoints(mt_imported):
    """Speaker + phone encoder forwards on imported weights reproduce the
    real-TF multitask graph (model/multitask_v1/tdnn.py re-encoded under
    TF 2.21): shared prefix, context slicing, length-masked pooling with
    the 1e-12 floor, dilated phone convs, both embedding heads."""
    t, gold = mt_imported
    ep, _ = _mt_apply(t, gold, train=False)
    pairs = [
        ("spk_relu1", "shared1"), ("spk_relu2", "shared2"),
        ("spk_relu3", "relu3"), ("spk_relu4", "relu4"),
        ("spk_relu5", "relu5"),
        ("spk_pooling", "pooling"), ("spk_dense6", "dense6"),
        ("spk_relu6", "relu6"),
        ("spk_zs_mu_dense", "zs_mu_dense"), ("spk_zs_mu_bn", "zs_mu_bn"),
        ("spk_zs_mu_relu", "zs_mu_relu"),
        ("phn_phn_conv3", "phn_conv3"), ("phn_phn_relu3", "phn_relu3"),
        ("phn_phn_dense4", "phn_dense4"), ("phn_phn_relu4", "phn_relu4"),
        ("phn_phn_conv5", "phn_conv5"), ("phn_phn_relu5", "phn_relu5"),
        ("phn_zp_mu_dense", "zp_mu_dense"), ("phn_zp_mu_bn", "zp_mu_bn"),
        ("phn_zp_mu_relu", "zp_mu_relu"),
    ]
    for gkey, ekey in pairs:
        want = gold[gkey]
        got = np.asarray(ep[ekey])
        if want.ndim == 4:  # TF keeps the dummy height axis on conv outputs
            want = want[:, 0]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4,
                                   err_msg=ekey)
    np.testing.assert_allclose(np.asarray(ep["mu_zs"]), gold["zs"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ep["mu_zp"]), gold["zp"],
                               rtol=1e-4, atol=1e-4)


def test_mt_golden_train_mode_and_bn_update(mt_imported):
    """Train-mode (batch-moment BN) embeddings match TF, and the BN
    momentum update matches on the UNSHARED BNs. (Shared BNs diverge by
    design: the reference's scope-reuse re-runs the shared prefix so
    those get two EMA assigns per step — multitask/model.py docstring.)"""
    t, gold = mt_imported
    ep, new_bs = _mt_apply(t, gold, train=True)
    np.testing.assert_allclose(np.asarray(ep["zs_mu_relu"]), gold["train_zs"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ep["zp_mu_relu"]), gold["train_zp"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_bs["bn6"]["mean"]),
        gold["updated_encoder_bn6_moving_mean"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_bs["bn6"]["var"]),
        gold["updated_encoder_bn6_moving_variance"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_bs["phn_bn5"]["mean"]),
        gold["updated_encoder_phone_phn_bn5_moving_mean"],
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_bs["phn_bn5"]["var"]),
        gold["updated_encoder_phone_phn_bn5_moving_variance"],
        rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Non-margin loss zoo vs real TF (scripts/make_tf_golden.py triplet):
# semi-hard triplet loss.py:358-498, angular triplet :501-634, GE2E :637-705,
# generalized angular triplet :708-901, ring/MHE auxiliaries :985-1037.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def triplet_gold():
    return np.load(os.path.join(GOLD, "golden_triplet.npz"))


def _check(name, gold, loss, dfeat=None, extra=()):
    np.testing.assert_allclose(
        float(loss), float(gold[name]), rtol=1e-5, atol=1e-6,
        err_msg="%s loss diverges from real TF" % name)
    if dfeat is not None:
        np.testing.assert_allclose(
            np.asarray(dfeat), gold[name + "_dfeat"], rtol=1e-4, atol=1e-5,
            err_msg="%s d/dfeatures diverges from real TF" % name)
    for key, val in extra:
        np.testing.assert_allclose(
            np.asarray(val), gold[key], rtol=1e-4, atol=1e-5, err_msg=key)


@pytest.mark.parametrize("squared", [False, True])
def test_semihard_triplet_matches_tf(triplet_gold, squared):
    """Semi-hard mining incl. the duplicate-row sqrt masking (rows 0/1 are
    identical) and the tiny-norm row."""
    from tf_kaldi_speaker_tpu.losses.triplet import semihard_triplet_loss

    feats = jnp.asarray(triplet_gold["features_semi"])
    labels = jnp.asarray(triplet_gold["labels"])
    fn = lambda f: semihard_triplet_loss(f, labels, 0.5, squared)[0]
    loss, dfeat = jax.value_and_grad(fn)(feats)
    _check("semihard_sq" if squared else "semihard", triplet_gold, loss, dfeat)


@pytest.mark.parametrize("tt", ["all", "hard"])
@pytest.mark.parametrize("lt,m", [
    ("asoftmax", 4),
    ("additive_margin_softmax", 0.25),
    ("additive_angular_margin_softmax", 0.4),
])
def test_angular_triplet_matches_tf(triplet_gold, tt, lt, m):
    from tf_kaldi_speaker_tpu.losses.triplet import angular_triplet_loss

    feats = jnp.asarray(triplet_gold["features_ang"])
    labels = jnp.asarray(triplet_gold["labels"])
    fn = lambda f: angular_triplet_loss(f, labels, float(m), tt, lt)[0]
    loss, dfeat = jax.value_and_grad(fn)(feats)
    _check("angular_%s_%s" % (tt, lt), triplet_gold, loss, dfeat)


def test_e2e_valid_loss_matches_tf(triplet_gold):
    from tf_kaldi_speaker_tpu.losses.triplet import e2e_valid_loss

    feats = jnp.asarray(triplet_gold["features_ang"])
    labels = jnp.asarray(triplet_gold["labels"])
    fn = lambda f: e2e_valid_loss(f, labels, 4, 3)[0]
    loss, dfeat = jax.value_and_grad(fn)(feats)
    _check("e2e", triplet_gold, loss, dfeat)


_GT_CFG = dict(
    margin=0.3, target_margin=1.6, triplet_center="learnable",
    loss_compute="raw", triplet_loss_weight=1.0, center_loss_weight=0.5,
    between_loss_weight=0.3, l2_loss_weight=0.0,
)


@pytest.mark.parametrize("topn", [0, 1, 2])
def test_generalized_triplet_learnable_matches_tf(triplet_gold, topn):
    """Learnable-center generalized angular triplet: total loss, the
    triplet/center/between components, and d/dfeatures + d/dkernel."""
    from tf_kaldi_speaker_tpu.losses.head import LossHead

    head = LossHead(
        loss_func="generalized_angular_triplet_loss", num_outputs=10,
        config=dict(_GT_CFG, triplet_topn=topn))
    feats = jnp.asarray(triplet_gold["features_ang"])
    labels = jnp.asarray(triplet_gold["labels_cls"])
    kernel = jnp.asarray(triplet_gold["kernel"])

    def fn(f, k):
        return head.apply({"params": {"output_kernel": k}}, f, labels)[0]

    loss, (dfeat, dkernel) = jax.value_and_grad(fn, argnums=(0, 1))(
        feats, kernel)
    _, ep = head.apply({"params": {"output_kernel": kernel}}, feats, labels)
    nm = "gtriplet_topn%d" % topn
    _check(nm, triplet_gold, loss, dfeat, extra=[
        (nm + "_triplet", ep["triplet_loss"]),
        (nm + "_center", ep["center_loss"]),
        (nm + "_between", ep["between_loss"]),
        (nm + "_dkernel", dkernel),
    ])


def test_generalized_triplet_average_update_matches_tf(triplet_gold):
    """Moving-average center mode: one train-mode step must reproduce the
    TF loss AND the post-assign centers; the loss gradient must NOT leak
    through the center update into features (tf Assign is
    NotDifferentiable)."""
    from tf_kaldi_speaker_tpu.losses.head import LossHead

    head = LossHead(
        loss_func="generalized_angular_triplet_loss", num_outputs=10,
        config=dict(_GT_CFG, triplet_topn=1, triplet_center="average",
                    triplet_center_momentum=0.95))
    feats = jnp.asarray(triplet_gold["features_ang"])
    labels = jnp.asarray(triplet_gold["labels_cls"])
    kernel = jnp.asarray(triplet_gold["kernel"])
    variables = {"params": {"output_kernel": kernel},
                 "loss_stats": {"triplet_centers": kernel}}

    (loss, ep), mut = head.apply(
        variables, feats, labels, 0, True, mutable=["loss_stats"])
    _check("gtriplet_average", triplet_gold, loss, extra=[
        ("gtriplet_average_triplet", ep["triplet_loss"]),
        ("gtriplet_average_centers", mut["loss_stats"]["triplet_centers"]),
    ])


def test_aux_ring_mhe_matches_tf(triplet_gold):
    """Ring + MHE auxiliaries composed on AM-softmax: total loss and
    gradients w.r.t. features, kernel, and the ring radius r."""
    from tf_kaldi_speaker_tpu.losses.head import LossHead

    head = LossHead(
        loss_func="additive_margin_softmax", num_outputs=10,
        config=dict(
            amsoftmax_m=0.2, amsoftmax_lambda_min=0.0,
            amsoftmax_lambda_base=1000.0, amsoftmax_lambda_gamma=1e-4,
            amsoftmax_lambda_power=5.0,
            aux_loss_func=["ring_loss", "mhe_loss"],
            ring_loss_init=2.5, ring_loss_lambda=0.3, mhe_lambda=0.1,
        ))
    feats = jnp.asarray(triplet_gold["features_ang"])
    labels = jnp.asarray(triplet_gold["labels_cls"])
    kernel = jnp.asarray(triplet_gold["kernel"])

    def fn(f, params):
        loss, ep = head.apply({"params": params}, f, labels, 5000)
        return loss, ep

    params = {"output_kernel": kernel, "ring_r": jnp.float32(2.5)}
    (loss, ep), (dfeat, dparams) = jax.value_and_grad(
        fn, argnums=(0, 1), has_aux=True)(feats, params)
    _check("aux_total", triplet_gold, loss, dfeat, extra=[
        ("aux_ring", ep["ring_loss"]),
        ("aux_mhe", ep["mhe_loss"]),
        ("aux_total_dkernel", dparams["output_kernel"]),
        ("aux_total_dr", dparams["ring_r"]),
    ])


@pytest.mark.parametrize("optimizer", ["momentum", "adam"])
def test_train_steps_match_tf(tmp_path_factory, optimizer):
    """FULL TRAIN-STEP parity: from the imported model-0 checkpoint, a few
    steps of our one jitted train step (grads + optax update + BN EMA
    updates) must reproduce real TF's MomentumOptimizer / AdamOptimizer
    run — per-step losses AND every post-training variable (params + BN
    moving stats) against the model-trained[-adam] checkpoint. Catches
    drift in gradient flow, optimizer slot semantics (incl. TF1 Adam's
    eps-outside-bias-correction form), or BN-update interleaving."""
    from tf_kaldi_speaker_tpu.parallel.mesh import make_mesh

    gold = np.load(os.path.join(GOLD, "golden.npz"))
    if optimizer == "momentum":
        tg = np.load(os.path.join(GOLD, "golden_train.npz"))
        cfg = dict(CFG, optimizer="momentum", momentum=float(tg["momentum"]))
        trained = "model-trained-%d" % len(tg["losses"])
    else:
        tg = np.load(os.path.join(GOLD, "golden_train_adam.npz"))
        cfg = dict(CFG, optimizer="adam",
                   adam_epsilon=float(tg["adam_epsilon"]))
        trained = "model-trained-adam-%d" % len(tg["losses"])
    mesh = make_mesh(devices=jax.devices()[:1])

    def build(name, ckpt):
        t = Trainer(ParamsPlain(**cfg),
                    str(tmp_path_factory.mktemp(name) / "nnet"),
                    dim=20, num_speakers=10, mesh=mesh)
        t.build("train", 20, cfg["loss_func"], 10)
        imported, skipped = import_reference_checkpoint(
            os.path.join(GOLD, ckpt), t)
        assert not skipped, skipped
        return t

    t = build("tfg_train", "model-0")
    state = t.state
    feats = jnp.asarray(gold["features"])
    labels = jnp.asarray(gold["labels"])
    lr = jnp.float32(float(tg["lr"]))
    for i, want in enumerate(tg["losses"]):
        state, metrics = t._train_step(state, feats, labels, lr)
        np.testing.assert_allclose(
            float(metrics["loss"]), float(want), rtol=1e-4, atol=1e-5,
            err_msg="train loss at step %d diverges from real TF" % i)
    assert tg["losses"][0] > tg["losses"][-1]  # it actually learns

    want = build("tfg_trained", trained).state
    got_flat = jax.tree_util.tree_flatten_with_path(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)})[0]
    want_flat = jax.tree_util.tree_flatten_with_path(
        {"params": jax.device_get(want.params),
         "batch_stats": jax.device_get(want.batch_stats)})[0]
    assert len(got_flat) == len(want_flat) and len(got_flat) >= 30
    # Adam's per-element normalization amplifies fp32 backend noise
    # (oneDNN vs XLA gradient ulps) on tiny-|g| weights; a semantic error
    # (eps placement, bias correction) would diverge by orders of
    # magnitude more than this tolerance.
    atol = 1e-4 if optimizer == "adam" else 1e-5
    for (kp, g), (kw, w) in zip(got_flat, want_flat):
        assert kp == kw
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-4, atol=atol,
            err_msg="post-training variable %s diverges from real TF"
            % jax.tree_util.keystr(kp))


# ---------------------------------------------------------------------------
# EXPORT direction: our trained state -> tf_export -> REAL TF Saver restore
# into the reference graph (generator: make_tf_golden.py export). Importing
# the same committed checkpoint here must reproduce the TF outputs — i.e.
# the original tf-kaldi-speaker code computes our exported model exactly.
# ---------------------------------------------------------------------------

_CFG_ATT_PRELU = dict(_CFG_ATT, network_relu_type="prelu",
                      att_apply_nonlinear=True)


@pytest.mark.parametrize("kind", ["stats", "att", "vlad", "att_prelu"])
def test_exported_checkpoint_restores_into_real_tf(tmp_path, kind):
    """One fixture per pooling family: the attention/vlad variants prove the
    exporter's query/center/key-stack name mapping under a real TF Saver;
    att_prelu additionally pins every PReLU alpha name and the
    att_post_bn/att_post_relu tail."""
    suffix = "" if kind == "stats" else "_" + kind
    gold = np.load(os.path.join(GOLD, "golden_export%s.npz" % suffix))
    cfg = {"stats": CFG, "att": _CFG_ATT, "vlad": _CFG_VLAD,
           "att_prelu": _CFG_ATT_PRELU}[kind]
    t = Trainer(ParamsPlain(**cfg), str(tmp_path / "nnet"),
                dim=20, num_speakers=10)
    t.build("train", 20, cfg["loss_func"], 10)
    imported, skipped = import_reference_checkpoint(
        os.path.join(GOLD, "export" + suffix, "model-3"), t)
    assert skipped == ["global_step"]  # counter, not a model variable
    assert len(imported) >= 40
    loss0, ep = _apply(t, gold, step=0)
    np.testing.assert_allclose(np.asarray(ep["tdnn6_dense"]),
                               gold["embedding"], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ep["pooling"]), gold["pooling"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ep["logits"]), gold["logits"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(loss0), float(gold["loss_step0"]),
                               rtol=1e-4, atol=1e-5)
    if kind.startswith("att"):
        np.testing.assert_allclose(
            float(ep["attention_penalty"]),
            float(gold["attention_penalty"]), rtol=1e-4, atol=1e-6)
    loss20k, _ = _apply(t, gold, step=20000)
    np.testing.assert_allclose(float(loss20k), float(gold["loss_step20000"]),
                               rtol=1e-4, atol=1e-5)
