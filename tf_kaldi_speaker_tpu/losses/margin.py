"""Margin-softmax family: softmax, A-softmax, AM-softmax, AAM (Arc) softmax.

Behavioral spec: reference model/loss.py:9-355. Exact numerics preserved:
the Chebyshev phi for A-softmax m∈{1,2,4} (loss.py:129-139), the θ+m>π
branch for ArcFace (loss.py:318-323), and the λ annealing blend
``fs·logits + fa·logits_margin`` with
λ = max(λ_min, base·(1+γ·step)^(-power)) (loss.py:144-152).

All functions are pure: (features [B,D], labels [B], kernel [D,C], ...)
-> (loss scalar, endpoints dict). The trainable kernel lives in the LossHead
flax module (losses/head.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

EPS = 1e-12


def sparse_softmax_xent(
    logits: jnp.ndarray, labels: jnp.ndarray, weights: jnp.ndarray = None
) -> jnp.ndarray:
    """Mean sparse softmax cross-entropy (tf.losses semantics).

    ``weights`` [B] (optional) is a row-validity weight: the mean is taken
    over sum(weights) instead of B, so rows padded for device-count
    alignment (weight 0) do not bias the loss (tf.losses weights semantics).
    """
    logz = jax.nn.logsumexp(logits, axis=-1)
    sel = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    per_row = logz - sel
    if weights is None:
        return jnp.mean(per_row)
    weights = weights.astype(per_row.dtype)
    return jnp.sum(per_row * weights) / jnp.maximum(jnp.sum(weights), EPS)


def margin_annealing_lambda(
    step, lambda_min: float, lambda_base: float, lambda_gamma: float, lambda_power: float
):
    """λ(step) schedule shared by all margin losses (loss.py:144-152)."""
    step = jnp.asarray(step, jnp.float32)
    return jnp.maximum(
        jnp.float32(lambda_min),
        lambda_base * (1.0 + lambda_gamma * step) ** (-lambda_power),
    )


def _normalized_logits(features: jnp.ndarray, kernel: jnp.ndarray):
    """logits against column-normalized weights + target cosines."""
    w_norm = kernel / jnp.maximum(
        jnp.linalg.norm(kernel, axis=0, keepdims=True), EPS
    )
    logits = features @ w_norm
    return logits, w_norm


def _target_cos(logits, features, labels):
    sel = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    fnorm = jnp.maximum(jnp.linalg.norm(features, axis=1), EPS)
    cos = jnp.clip(sel / fnorm, -1 + EPS, 1 - EPS)
    return sel, fnorm, cos


def _blend(logits, labels, sel, scaled, lam):
    """fs·logits + fa·(logits with target replaced by `scaled`)."""
    fa = 1.0 / (1.0 + lam)
    fs = 1.0 - fa
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    logits_margin = logits + onehot * (scaled - sel)[:, None]
    return fs * logits + fa * logits_margin


def softmax_loss(
    features, labels, kernel, bias, weights=None
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Vanilla softmax with an affine output layer (loss.py:9-48)."""
    logits = features @ kernel + bias
    return sparse_softmax_xent(logits, labels, weights), {"logits": logits, "labels": labels}


def asoftmax_phi(cos: jnp.ndarray, m: int) -> jnp.ndarray:
    """SphereFace Phi(θ, m) via the Chebyshev sign trick (loss.py:129-139)."""
    if m == 1:
        return cos
    if m == 2:
        return 2.0 * jnp.sign(cos) * jnp.square(cos) - 1.0
    if m == 4:
        cos2 = jnp.square(cos)
        cos4 = cos2 * cos2
        sign0 = jnp.sign(cos)
        sign3 = jnp.sign(2.0 * cos2 - 1.0) * sign0
        sign4 = 2.0 * sign0 + sign3 - 3.0
        return sign3 * (8.0 * cos4 - 8.0 * cos2 + 1.0) + sign4
    raise NotImplementedError("[ERROR] m=%d is not supported." % m)


def asoftmax_loss(features, labels, kernel, m: int, lam, weights=None):
    """Angular (Sphere) softmax (loss.py:51-169)."""
    logits, _ = _normalized_logits(features, kernel)
    if m == 1:
        return sparse_softmax_xent(logits, labels, weights), {"logits": logits, "labels": labels}
    sel, fnorm, cos = _target_cos(logits, features, labels)
    scaled = asoftmax_phi(cos, m) * fnorm
    updated = _blend(logits, labels, sel, scaled, lam)
    return sparse_softmax_xent(updated, labels, weights), {"logits": logits, "labels": labels}


def amsoftmax_loss(features, labels, kernel, m: float, lam, weights=None):
    """Additive-margin softmax: ||x||(cosθ - m) (loss.py:172-257)."""
    logits, _ = _normalized_logits(features, kernel)
    sel, fnorm, cos = _target_cos(logits, features, labels)
    scaled = (cos - m) * fnorm
    updated = _blend(logits, labels, sel, scaled, lam)
    return sparse_softmax_xent(updated, labels, weights), {"logits": logits, "labels": labels}


def arcsoftmax_loss(features, labels, kernel, m: float, lam, weights=None):
    """Additive angular margin (ArcFace): ||x||cos(θ+m) (loss.py:260-355)."""
    logits, _ = _normalized_logits(features, kernel)
    sel, fnorm, cos = _target_cos(logits, features, labels)
    sin = jnp.sqrt(jnp.maximum(1.0 - jnp.square(cos), 1e-12))
    cos_m = cos * jnp.cos(m) - sin * jnp.sin(m)
    # θ+m > π  ⇔  cosθ < cos(π-m): fall back to the monotone extension.
    phi = jnp.where(cos > jnp.cos(jnp.pi - m), cos_m, -cos_m - 2.0)
    scaled = phi * fnorm
    updated = _blend(logits, labels, sel, scaled, lam)
    return sparse_softmax_xent(updated, labels, weights), {"logits": logits, "labels": labels}
