"""Probe the e2e pool-path dispatch overhead on the real chip.

Measures the loader-fed rate of the device-pool training loop at several
``steps_per_dispatch`` values and with the three [K, B] index arrays
shipped as ONE stacked [3, K, B] transfer instead of three puts, to
locate where the gap between the device-step rate and the loader-fed
rate (BENCH_r03: 18,753 vs 17,469 chunks/s/chip, ~7%) actually lives:
per-put tunnel RPCs, per-group Python, or dispatch serialization.

Usage: python scripts/e2e_dispatch_probe.py [--groups 24]
"""

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _bench_egs  # noqa: E402
from __graft_entry__ import FLAGSHIP  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups", type=int, default=24)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    from tf_kaldi_speaker_tpu.data import bucket_lengths
    from tf_kaldi_speaker_tpu.data.device_pool import DevicePool
    from tf_kaldi_speaker_tpu.train.trainer import Trainer
    from tf_kaldi_speaker_tpu.utils.params import ParamsPlain

    cfg = dict(FLAGSHIP)
    dim, num_speakers = 30, 7323  # match bench.py's flagship setup
    egs = _bench_egs(dim)
    trainer = Trainer(
        ParamsPlain(**dict(cfg, device_pool=True)),
        "/tmp/tfks_probe_pool/nnet", dim=dim, num_speakers=num_speakers,
    )
    trainer.build("train", dim, cfg["loss_func"], num_speakers)
    pool = DevicePool(egs, os.path.join(egs, "spklist"), sharding=trainer.rep)
    pool.stage()
    B = int(cfg["num_speakers_per_batch"]) * int(
        cfg.get("num_segments_per_speaker", 1))
    buckets = bucket_lengths(int(cfg["min_segment_len"]),
                             int(cfg["max_segment_len"]), 8)
    lr = jnp.float32(0.01)
    nspk = int(cfg["num_speakers_per_batch"])
    nseg = int(cfg.get("num_segments_per_speaker", 1))

    def run(K, stacked, groups, windows):
        rng, lrng = random.Random(0), random.Random(0)
        state = trainer.state

        if stacked:
            # one [3,K,B] put, split inside jit
            base_for = trainer._train_step_pool_multi

            cache = {}

            def step_for(L):
                fn = cache.get(L)
                if fn is None:
                    inner = base_for(L)

                    def outer(state, frames, headers, idx, lr, _inner=inner):
                        return _inner(state, frames, headers,
                                      idx[0], idx[1], idx[2], lr)

                    fn = cache[L] = jax.jit(
                        outer,
                        in_shardings=(None, trainer.rep, trainer.rep,
                                      trainer.gsh, trainer.rep),
                        donate_argnums=(0,),
                    )
                return fn

            def one_group(state, L):
                s, u, l = pool.sample_group(rng, K, nspk, nseg, L)
                idx = np.stack([s, u, l.astype(s.dtype)])
                return step_for(L)(state, pool.frames, pool.headers,
                                   jax.device_put(idx, trainer.gsh), lr)
        else:
            def one_group(state, L):
                s, u, l = pool.sample_group(rng, K, nspk, nseg, L)
                step = trainer._train_step_pool_multi(L)
                return step(state, pool.frames, pool.headers,
                            jax.device_put(s, trainer.gsh),
                            jax.device_put(u, trainer.gsh),
                            jax.device_put(l, trainer.gsh), lr)

        for L in buckets:  # precompile
            state, m = one_group(state, L)
        _ = float(m["loss"])
        rates = []
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(groups):
                state, m = one_group(state, lrng.choice(buckets))
            _ = float(m["loss"])
            rates.append(groups * K * B / (time.perf_counter() - t0))
        rates.sort()
        return rates[len(rates) // 2]

    results = {}
    for K in (8, 16, 32):
        g = max(4, args.groups * 8 // K)
        r = run(K, stacked=False, groups=g, windows=args.windows)
        results["K%d_3put" % K] = round(r, 1)
        print("K=%d 3-put: %.1f chunks/s" % (K, r), flush=True)
    r = run(8, stacked=True, groups=args.groups, windows=args.windows)
    results["K8_stacked"] = round(r, 1)
    print("K=8 stacked: %.1f chunks/s" % r, flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
