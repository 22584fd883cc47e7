"""Phone-frame sampling for the multitask phone loss.

Behavioral spec: reference model/multitask_v1/common.py (make_phone_masks):
random frame indices per utterance, sampled without replacement within each
utterance's valid length. TPU difference: the result is a rectangular
[B, K] index array (static shape for gather inside jit) instead of the
reference's ragged [n, 2] gather_nd list; K = num_frames_per_utt. With
num_frames_per_utt == -1 callers use all frames with a validity mask
instead of explicit indices.
"""

from __future__ import annotations

import numpy as np


def make_phone_masks(
    length: np.ndarray, resample: np.ndarray, num_frames_per_utt: int,
    rng: np.random.RandomState | None = None,
) -> np.ndarray:
    """[B, K] frame indices, each row sampled without replacement in
    [0, length[i]). ``resample`` is accepted for parity but unused — the
    reference's active branch always samples randomly (common.py:43-55)."""
    assert num_frames_per_utt > 0, "use a validity mask for -1 (all frames)"
    rng = rng or np.random
    b = length.shape[0]
    out = np.zeros((b, num_frames_per_utt), dtype=np.int32)
    for i in range(b):
        n = int(length[i])
        if n >= num_frames_per_utt:
            out[i] = rng.choice(n, size=num_frames_per_utt, replace=False)
        else:
            out[i] = rng.choice(max(n, 1), size=num_frames_per_utt, replace=True)
    return out
