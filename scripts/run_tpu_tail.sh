#!/bin/bash
# Round-5 serialized TPU tail queue: everything that still needs the single
# tunneled chip, one client at a time, each item retried once (a tunnel
# outage leaves a JAX client futex-wedged forever; the timeout is the only
# way out — see docs/ROUND5.md infrastructure lessons).
set -u
root=/root/h2h
cd "$(dirname "$0")/.."
export TFKS_COMPILE_CACHE=/root/jaxcache

item() {
  echo "=== $(date +%H:%M:%S) tail: $* ===" >&2
  timeout "$1" "${@:2}" >&2 \
    || { echo "=== retry: ${*:2} ===" >&2; timeout "$1" "${@:2}" >&2; }
}

# 1. bf16-vs-f32 flagship quality matrix (VERDICT r4 item 1)
item 7200 python scripts/quality_matrix.py --paths --only pool,pool_bf16 \
    --seeds 3 --root /root/qmx_bf16
# 2. the lost multitask seed (band needs >= 3 f32 seeds)
item 2400 python scripts/reference_convergence.py run --root "$root" \
    --arm tpu --loss mt_softmax --seed 3
# 3. extra a-softmax seeds: the 3v3 comparison rank-separated (all refs
#    below all tpu seeds, p~0.05); widen to 5 seeds to firm up or dissolve
item 2400 python scripts/reference_convergence.py run --root "$root" \
    --arm tpu --loss asoftmax_m4 --seed 4
item 2400 python scripts/reference_convergence.py run --root "$root" \
    --arm tpu --loss asoftmax_m4 --seed 5
# 4. benchmark with the round-5 stream breakdown probes
item 3600 python bench.py
echo "=== $(date +%H:%M:%S) tpu tail ALL DONE ===" >&2
