"""Independent numpy oracles for loss/pooling math.

Same role as the reference's model/test_utils.py (884 LoC of numpy
references, SURVEY.md §4): brute-force, loop-based implementations that the
vectorized JAX paths are checked against. Written loop-first on purpose —
maximum independence from the jnp implementations.
"""

import numpy as np


def np_xent(logits, labels):
    logits = logits - logits.max(axis=1, keepdims=True)
    logp = logits - np.log(np.exp(logits).sum(axis=1, keepdims=True))
    return -np.mean([logp[i, labels[i]] for i in range(len(labels))])


def np_anneal(step, lmin, lbase, lgamma, lpower):
    return max(lmin, lbase * (1.0 + lgamma * step) ** (-lpower))


def _np_phi_asoftmax(cos, m):
    if m == 1:
        return cos
    if m == 2:
        return 2 * np.sign(cos) * cos**2 - 1
    if m == 4:
        c2, c4 = cos**2, cos**4
        s0 = np.sign(cos)
        s3 = np.sign(2 * c2 - 1) * s0
        s4 = 2 * s0 + s3 - 3
        return s3 * (8 * c4 - 8 * c2 + 1) + s4
    raise ValueError(m)


def _margin_loss(features, labels, w, phi_fn, lam):
    eps = 1e-12
    w_norm = w / np.maximum(np.linalg.norm(w, axis=0, keepdims=True), eps)
    logits = features @ w_norm
    b = features.shape[0]
    updated = logits.copy()
    fa = 1.0 / (1.0 + lam)
    fs = 1.0 - fa
    out = fs * logits.copy()
    for i in range(b):
        fnorm = max(np.linalg.norm(features[i]), eps)
        cos = np.clip(logits[i, labels[i]] / fnorm, -1 + eps, 1 - eps)
        scaled = phi_fn(cos) * fnorm
        margin_logits = logits[i].copy()
        margin_logits[labels[i]] = scaled
        out[i] += fa * margin_logits
    return np_xent(out, labels)


def np_asoftmax(features, labels, w, m, lam):
    if m == 1:
        eps = 1e-12
        w_norm = w / np.maximum(np.linalg.norm(w, axis=0, keepdims=True), eps)
        return np_xent(features @ w_norm, labels)
    return _margin_loss(features, labels, w, lambda c: _np_phi_asoftmax(c, m), lam)


def np_amsoftmax(features, labels, w, m, lam):
    return _margin_loss(features, labels, w, lambda c: c - m, lam)


def np_arcsoftmax(features, labels, w, m, lam):
    def phi(c):
        s = np.sqrt(max(1 - c * c, 1e-12))
        cm = c * np.cos(m) - s * np.sin(m)
        return cm if c > np.cos(np.pi - m) else -cm - 2

    return _margin_loss(features, labels, w, phi, lam)


def np_ring_loss(features, r, lam):
    return lam * np.mean((np.linalg.norm(features, axis=1) - r) ** 2)


def np_mhe_loss(labels, w, lam):
    w_norm = w / np.maximum(np.linalg.norm(w, axis=0, keepdims=True), 1e-12)
    sel = w_norm.T[labels]
    return lam / (np.mean(2.0 - 2.0 * sel @ w_norm) + 1e-6)


def np_pairwise_euc(features, squared=False):
    b = features.shape[0]
    d = np.zeros((b, b))
    for i in range(b):
        for j in range(b):
            d[i, j] = np.sum((features[i] - features[j]) ** 2)
    if not squared:
        d = np.sqrt(np.maximum(d, 0))
        for i in range(b):
            d[i, i] = 0.0
    return d


def np_semihard_triplet(features, labels, margin, squared=False):
    """Brute-force FaceNet semi-hard loss over all positive pairs."""
    d = np_pairwise_euc(features, squared)
    b = len(labels)
    total, count = 0.0, 0
    for x in range(b):
        for i in range(b):
            if x == i or labels[x] != labels[i]:
                continue
            count += 1
            semi = [d[x, y] for y in range(b) if labels[y] != labels[x] and d[x, y] > d[x, i]]
            if semi:
                neg = min(semi)
            else:
                neg = max(d[x, y] for y in range(b) if labels[y] != labels[x])
            total += max(margin + d[x, i] - neg, 0.0)
    return total / max(count, 1e-16)


def np_pairwise_cos(features):
    b = features.shape[0]
    out = np.zeros((b, b))
    for i in range(b):
        for j in range(b):
            ni = max(np.linalg.norm(features[i]), 1e-6)
            nj = max(np.linalg.norm(features[j]), 1e-6)
            out[i, j] = np.clip(features[i] @ features[j] / (ni * nj), -1, 1)
    return out


def _np_pos_transform(c, loss_type, margin):
    if loss_type == "asoftmax":
        return _np_phi_asoftmax(c, int(margin))
    if loss_type == "additive_margin_softmax":
        return c - margin
    s = np.sqrt(max(1 - c * c, 0.0))
    cm = c * np.cos(margin) - s * np.sin(margin)
    return cm if c > np.cos(np.pi - margin) else -cm - 2


def np_angular_triplet_all(features, labels, margin, loss_type):
    cos = np_pairwise_cos(features)
    b = len(labels)
    eps = 1e-12
    total, n_pos = 0.0, 0
    for a in range(b):
        for p in range(b):
            for n in range(b):
                if a == p or a == n or p == n:
                    continue
                if labels[a] != labels[p] or labels[a] == labels[n]:
                    continue
                val = max(cos[a, n] - _np_pos_transform(cos[a, p], loss_type, margin), 0.0)
                if val > eps:
                    n_pos += 1
                total += val
    return total / (n_pos + 1e-16)


def np_angular_triplet_hard(features, labels, margin, loss_type):
    cos = np_pairwise_cos(features)
    b = len(labels)
    d_p = np.vectorize(lambda c: _np_pos_transform(c, loss_type, margin))(cos)
    total = 0.0
    for a in range(b):
        pos = [d_p[a, j] for j in range(b) if j != a and labels[j] == labels[a]]
        hardest_pos = min(pos) if pos else d_p[a].max()
        neg = [cos[a, j] for j in range(b) if labels[j] != labels[a]]
        hardest_neg = max(neg) if neg else d_p[a].min()
        total += max(hardest_neg - hardest_pos, 0.0)
    return total / b


def np_ge2e_softmax(features, n_spk, n_seg, scale=20.0):
    def l2(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-6)

    f = l2(features)
    n, dim = f.shape
    grouped = f.reshape(n_spk, n_seg, dim)
    center = l2(grouped.mean(axis=1))
    sim = np.zeros((n, n_spk))
    for i in range(n):
        s, k = divmod(i, n_seg)
        for j in range(n_spk):
            if j == s:
                ex = l2((grouped[s].sum(axis=0) - grouped[s, k])[None, :])[0]
                sim[i, j] = f[i] @ ex
            else:
                sim[i, j] = f[i] @ center[j]
    labels = np.repeat(np.arange(n_spk), n_seg)
    return np_xent(scale * sim, labels)


def np_stats_pooling(x, mask=None):
    """Loop-based masked statistics pooling, [B, L, D] -> [B, 2D]."""
    b, l, d = x.shape
    out = np.zeros((b, 2 * d), dtype=np.float64)
    for i in range(b):
        rows = x[i] if mask is None else x[i][mask[i] > 0]
        mean = rows.mean(axis=0)
        var = ((rows - mean) ** 2).mean(axis=0)
        var = np.where(var <= 1e-12, 1e-12, var)
        out[i] = np.concatenate([mean, np.sqrt(var)])
    return out
