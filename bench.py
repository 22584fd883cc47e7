"""Benchmark: training throughput of the flagship x-vector config on TPU.

Prints ONE JSON line:
    {"metric": "train_chunks_per_sec_per_chip", "value": N,
     "unit": "utterance-chunks/sec/chip", "vs_baseline": R}

The flagship config runs with bfloat16 activations (compute_dtype, the
TPU-native format; params/optimizer/BN stats stay f32).

Baseline derivation (BASELINE.md): the reference trains VoxCeleb on one
P100 in ~2.5 days with 30 000 steps/epoch × 64 chunks/batch
(tdnn_amsoftmax_m0.20…json). RESULTS-quality runs use O(16) epochs of that
schedule, implying ≈ 64·30000·16 / 216000 s ≈ 142 chunks/s on the P100.
vs_baseline = ours / 142.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CHUNKS_PER_SEC = 142.0


def main() -> None:
    from __graft_entry__ import FLAGSHIP
    from tf_kaldi_speaker_tpu.train.trainer import Trainer
    from tf_kaldi_speaker_tpu.utils.params import ParamsPlain

    dim = 30
    num_speakers = 7323          # VoxCeleb1-dev + VoxCeleb2 speaker count
    batch = 64
    length = 296                 # ~mean of the 200-400 frame chunk range
    steps = 30
    cfg = dict(FLAGSHIP)

    trainer = Trainer(
        ParamsPlain(**cfg), "/tmp/tfks_bench/nnet", dim=dim, num_speakers=num_speakers
    )
    trainer.build("train", dim, cfg["loss_func"], num_speakers)

    rng = np.random.RandomState(0)
    feats = rng.randn(batch, length, dim).astype(np.float32)
    labels = rng.randint(0, num_speakers, batch).astype(np.int32)
    f, l = trainer._shard_batch(feats, labels)
    lr = jnp.float32(0.01)

    # Warmup (compile). NOTE: through the axon tunnel block_until_ready does
    # not actually wait for remote execution, so timing uses the slope method
    # with a forced scalar readback: t(N+K steps) - t(N steps) over K.
    state = trainer.state
    for _ in range(3):
        state, metrics = trainer._train_step(state, f, l, lr)
    _ = float(metrics["loss"])

    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = trainer._train_step(state, f, l, lr)
        _ = float(m["loss"])  # forces the whole chain to finish
        return time.perf_counter() - t0

    t_short = run(5)
    t_long = run(5 + steps)
    dt = t_long - t_short

    n_chips = len(jax.devices())
    chunks_per_sec_per_chip = batch * steps / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "train_chunks_per_sec_per_chip",
                "value": round(chunks_per_sec_per_chip, 2),
                "unit": "utterance-chunks/sec/chip",
                "vs_baseline": round(chunks_per_sec_per_chip / BASELINE_CHUNKS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    # The axon tunnel occasionally throws transient TPU backend errors;
    # retry so a single hiccup doesn't lose the round's benchmark.
    for attempt in range(3):
        try:
            main()
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(20)
