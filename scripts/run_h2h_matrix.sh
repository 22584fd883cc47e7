#!/bin/bash
# Head-to-head convergence matrix driver (VERDICT r4 items 1+2).
#
# Two sequential queues over the scripts/reference_convergence.py protocol:
#   ref — the unmodified reference trainer (TF via scripts/tf1_ref_shim.py),
#         single-core CPU, ~30-50 min/run: 3 repeats per NEW loss family
#         (arc-softmax m=0.25, a-softmax m=4, attention pooling) then extra
#         repeats of the round-4 families, interleaved so partial progress
#         still covers every family.
#   tpu — this framework, real TPU, ~5-10 min/run: 3 seeds per family f32
#         plus 3 bfloat16 seeds on the flagship loss (am-softmax).
#
# Usage: bash scripts/run_h2h_matrix.sh {ref|tpu} ROOT
set -u
mode=$1
root=$2
cd "$(dirname "$0")/.."

run() {
  echo "=== $(date +%H:%M:%S) $* ===" >&2
  # The dev tunnel to the TPU has transient multi-minute outages: bound
  # each run and retry once before giving up on it.
  timeout 3900 python scripts/reference_convergence.py run --root "$root" "$@" >&2 \
    || { echo "=== retry $* ===" >&2;
         timeout 3900 python scripts/reference_convergence.py run --root "$root" "$@" >&2; }
}

if [ "$mode" = ref ]; then
  for rep in 0 1 2; do
    for loss in arcsoftmax_m0.25 asoftmax_m4 att_amsoftmax; do
      run --arm ref --loss $loss --rep $rep
    done
  done
  for rep in 0 1; do
    for loss in softmax amsoftmax; do
      run --arm ref --loss $loss --rep $rep
    done
  done
else
  for seed in 1 2 3; do
    for loss in arcsoftmax_m0.25 asoftmax_m4 att_amsoftmax softmax amsoftmax; do
      run --arm tpu --loss $loss --seed $seed
    done
  done
  for seed in 1 2 3; do
    run --arm tpu --loss amsoftmax --seed $seed --compute-dtype bfloat16
  done
fi
echo "=== $(date +%H:%M:%S) $mode queue done ===" >&2
