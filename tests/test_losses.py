"""Loss zoo vs independent numpy oracles (adversarial inputs included).

Mirrors the reference's oracle strategy (model/tdnn.py:194-443 self-tests):
embeddings aligned/anti-aligned with weight columns, tiny/huge norms, and
NaN-free gradients for every loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracles
from tf_kaldi_speaker_tpu.losses import LossHead, margin_annealing_lambda

B, D, C = 20, 32, 11


def adversarial_embeddings(rng, w):
    feats = rng.randn(B, D).astype(np.float32)
    feats[0] = w[:, 0]            # aligned with its own class weight
    feats[1] = -w[:, 1]           # anti-aligned
    feats[2] *= 1e-4              # tiny norm
    feats[3] *= 1e4               # huge norm
    return feats


def run_head(loss_func, cfg, feats, labels, step=1000, train=False):
    head = LossHead(loss_func=loss_func, num_outputs=C, config=cfg)
    variables = head.init(jax.random.PRNGKey(0), feats, labels, step, train)
    loss, endpoints = head.apply(variables, feats, labels, step, train)
    return head, variables, float(loss), endpoints


ANNEAL = {
    "lambda_min": 0.0,
    "lambda_base": 1000.0,
    "lambda_gamma": 0.0001,
    "lambda_power": 5.0,
}


def anneal_cfg(prefix):
    return {f"{prefix}_{k}": v for k, v in ANNEAL.items()}


@pytest.mark.parametrize("m", [1, 2, 4])
def test_asoftmax_matches_oracle(m):
    rng = np.random.RandomState(0)
    cfg = {"asoftmax_m": m, **anneal_cfg("asoftmax")}
    feats = rng.randn(B, D).astype(np.float32)
    labels = rng.randint(0, C, B)
    head, variables, loss, _ = run_head("asoftmax", cfg, feats, labels)
    w = np.asarray(variables["params"]["output_kernel"])
    feats_adv = adversarial_embeddings(rng, w)
    loss_adv, _ = head.apply(variables, feats_adv, labels, 1000)
    lam = oracles.np_anneal(1000, 0.0, 1000.0, 0.0001, 5.0)
    np.testing.assert_allclose(loss, oracles.np_asoftmax(feats, labels, w, m, lam), rtol=1e-5)
    np.testing.assert_allclose(
        float(loss_adv), oracles.np_asoftmax(feats_adv, labels, w, m, lam), rtol=1e-4
    )
    # Gradient must be finite even at the adversarial points.
    g = jax.grad(lambda v: head.apply(v, feats_adv, labels, 1000)[0])(variables)
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(g))


@pytest.mark.parametrize("m", [0.1, 0.2, 0.35])
def test_amsoftmax_matches_oracle(m):
    rng = np.random.RandomState(1)
    cfg = {"amsoftmax_m": m, **anneal_cfg("amsoftmax")}
    feats = rng.randn(B, D).astype(np.float32)
    labels = rng.randint(0, C, B)
    head, variables, loss, _ = run_head("additive_margin_softmax", cfg, feats, labels)
    w = np.asarray(variables["params"]["output_kernel"])
    lam = oracles.np_anneal(1000, 0.0, 1000.0, 0.0001, 5.0)
    np.testing.assert_allclose(loss, oracles.np_amsoftmax(feats, labels, w, m, lam), rtol=1e-5)


@pytest.mark.parametrize("m", [0.25, 0.5])
def test_arcsoftmax_matches_oracle(m):
    rng = np.random.RandomState(2)
    cfg = {"arcsoftmax_m": m, **anneal_cfg("arcsoftmax")}
    feats = rng.randn(B, D).astype(np.float32)
    labels = rng.randint(0, C, B)
    head, variables, loss, _ = run_head("additive_angular_margin_softmax", cfg, feats, labels)
    w = np.asarray(variables["params"]["output_kernel"])
    feats_adv = adversarial_embeddings(rng, w)
    loss_adv, _ = head.apply(variables, feats_adv, labels, 1000)
    lam = oracles.np_anneal(1000, 0.0, 1000.0, 0.0001, 5.0)
    np.testing.assert_allclose(loss, oracles.np_arcsoftmax(feats, labels, w, m, lam), rtol=1e-5)
    np.testing.assert_allclose(
        float(loss_adv), oracles.np_arcsoftmax(feats_adv, labels, w, m, lam), rtol=1e-4
    )
    g = jax.grad(lambda v: head.apply(v, feats_adv, labels, 1000)[0])(variables)
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(g))


def test_margin_override_neutralizes():
    # With m neutralized and λ→min=0, AM-softmax == normalized-weight softmax.
    rng = np.random.RandomState(3)
    cfg = {"amsoftmax_m": 0.3, **anneal_cfg("amsoftmax")}
    feats = rng.randn(B, D).astype(np.float32)
    labels = rng.randint(0, C, B)
    head, variables, _, _ = run_head("additive_margin_softmax", cfg, feats, labels)
    loss0, _ = head.apply(variables, feats, labels, 10**9, margin_override=0.0)
    w = np.asarray(variables["params"]["output_kernel"])
    np.testing.assert_allclose(
        float(loss0), oracles.np_amsoftmax(feats, labels, w, 0.0, 0.0), rtol=1e-5
    )


def test_annealing_schedule():
    lam = margin_annealing_lambda(0, 10.0, 1000.0, 1.0, 4.0)
    assert float(lam) == pytest.approx(1000.0)
    lam = margin_annealing_lambda(10**6, 10.0, 1000.0, 1.0, 4.0)
    assert float(lam) == pytest.approx(10.0)


def test_softmax_plain():
    rng = np.random.RandomState(4)
    feats = rng.randn(B, D).astype(np.float32)
    labels = rng.randint(0, C, B)
    head, variables, loss, ep = run_head("softmax", {}, feats, labels)
    w = np.asarray(variables["params"]["output_kernel"])
    b = np.asarray(variables["params"]["output_bias"])
    np.testing.assert_allclose(loss, oracles.np_xent(feats @ w + b, labels), rtol=1e-5)


def test_ring_and_mhe_aux():
    rng = np.random.RandomState(5)
    cfg = {
        "amsoftmax_m": 0.1,
        **anneal_cfg("amsoftmax"),
        "aux_loss_func": ["ring_loss", "mhe_loss"],
        "ring_loss_init": 0.5,
        "ring_loss_lambda": 0.01,
        "mhe_lambda": 0.1,
    }
    feats = rng.randn(B, D).astype(np.float32)
    labels = rng.randint(0, C, B)
    head, variables, loss, ep = run_head("additive_margin_softmax", cfg, feats, labels)
    w = np.asarray(variables["params"]["output_kernel"])
    lam = oracles.np_anneal(1000, 0.0, 1000.0, 0.0001, 5.0)
    expected = (
        oracles.np_amsoftmax(feats, labels, w, 0.1, lam)
        + oracles.np_ring_loss(feats, 0.5, 0.01)
        + oracles.np_mhe_loss(labels, w, 0.1)
    )
    np.testing.assert_allclose(loss, expected, rtol=1e-5)
    # aux disabled (validation mode)
    loss_noaux, _ = head.apply(variables, feats, labels, 1000, aux_enabled=False)
    np.testing.assert_allclose(
        float(loss_noaux), oracles.np_amsoftmax(feats, labels, w, 0.1, lam), rtol=1e-5
    )


def test_semihard_triplet_matches_bruteforce():
    rng = np.random.RandomState(6)
    feats = rng.randn(12, 8).astype(np.float32)
    labels = np.repeat(np.arange(4), 3)
    for squared in (False, True):
        cfg = {"margin": 0.4, "triplet_loss_squared": squared}
        _, _, loss, _ = run_head("semihard_triplet_loss", cfg, feats, labels)
        np.testing.assert_allclose(
            loss, oracles.np_semihard_triplet(feats, labels, 0.4, squared), rtol=1e-4
        )


@pytest.mark.parametrize("loss_type", ["asoftmax", "additive_margin_softmax", "additive_angular_margin_softmax"])
def test_angular_triplet_all_matches_bruteforce(loss_type):
    rng = np.random.RandomState(7)
    feats = rng.randn(12, 8).astype(np.float32)
    labels = np.repeat(np.arange(4), 3)
    margin = 2.0 if loss_type == "asoftmax" else 0.2
    cfg = {"margin": margin, "triplet_type": "all", "loss_type": loss_type}
    _, _, loss, _ = run_head("angular_triplet_loss", cfg, feats, labels)
    np.testing.assert_allclose(
        loss, oracles.np_angular_triplet_all(feats, labels, margin, loss_type), rtol=1e-4
    )


def test_angular_triplet_hard_matches_bruteforce():
    rng = np.random.RandomState(8)
    feats = rng.randn(12, 8).astype(np.float32)
    labels = np.repeat(np.arange(4), 3)
    cfg = {"margin": 0.2, "triplet_type": "hard", "loss_type": "additive_margin_softmax"}
    _, _, loss, _ = run_head("angular_triplet_loss", cfg, feats, labels)
    np.testing.assert_allclose(
        loss,
        oracles.np_angular_triplet_hard(feats, labels, 0.2, "additive_margin_softmax"),
        rtol=1e-4,
    )


def test_e2e_valid_loss_matches_oracle():
    rng = np.random.RandomState(9)
    n_spk, n_seg = 5, 4
    feats = rng.rand(n_spk * n_seg, 16).astype(np.float32)
    labels = np.repeat(np.arange(n_spk), n_seg)
    cfg = {"num_valid_speakers_per_batch": n_spk, "num_valid_segments_per_speaker": n_seg}
    _, _, loss, _ = run_head("e2e_valid_loss", cfg, feats, labels)
    np.testing.assert_allclose(loss, oracles.np_ge2e_softmax(feats, n_spk, n_seg), rtol=1e-4)


def test_generalized_triplet_runs_and_updates_centers():
    rng = np.random.RandomState(10)
    feats = rng.randn(10, 16).astype(np.float32)
    labels = np.arange(10) % C
    cfg = {
        "triplet_center": "average",
        "triplet_center_momentum": 0.9,
        "loss_compute": "raw",
        "margin": 0.1,
        "target_margin": 1.0,
        "triplet_topn": 1,
        "triplet_loss_weight": 1.0,
        "center_loss_weight": 1.0,
        "between_loss_weight": 0.1,
        "l2_loss_weight": 0.0,
    }
    head = LossHead(loss_func="generalized_angular_triplet_loss", num_outputs=C, config=cfg)
    variables = head.init(jax.random.PRNGKey(0), feats, labels, 0, True)
    (loss, ep), updates = head.apply(
        variables, feats, labels, 0, True, mutable=["loss_stats"]
    )
    assert np.isfinite(float(loss))
    before = np.asarray(variables["loss_stats"]["triplet_centers"])
    after = np.asarray(updates["loss_stats"]["triplet_centers"])
    assert not np.allclose(before, after)
    # topn variants run
    for topn in (0, 3):
        cfg2 = dict(cfg, triplet_topn=topn, triplet_center="learnable")
        _, _, l2_, _ = run_head("generalized_angular_triplet_loss", cfg2, feats, labels, train=False)
        assert np.isfinite(l2_)
