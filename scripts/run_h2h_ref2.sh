#!/bin/bash
# Revised ref-arm head-to-head queue (round 5).
#
# Supersedes the ref half of run_h2h_matrix.sh mid-round: same runs, but
# (a) skips any (loss, rep) whose result JSON already exists, so it can
#     take over from a killed queue without redoing work;
# (b) optionally waits for an orphaned in-flight run (pid $2) first;
# (c) interleaves the multitask reference arms (run_ref_mt — the
#     unmodified BaseMT) between single-task repeats so every family gets
#     at least rep 0 before any family gets rep 2.
#
# Usage: bash scripts/run_h2h_ref2.sh ROOT [orphan_pid]
set -u
root=$1
orphan=${2:-0}
cd "$(dirname "$0")/.."

if [ "$orphan" != 0 ]; then
  echo "=== waiting for in-flight run pid $orphan ===" >&2
  while ps -p "$orphan" > /dev/null 2>&1; do sleep 30; done
fi

run() {
  loss=$1; rep=$2
  out="$root/results/ref_${loss}_r${rep}.json"
  if [ -f "$out" ]; then
    echo "=== skip $loss rep $rep (result exists) ===" >&2
    return 0
  fi
  echo "=== $(date +%H:%M:%S) ref $loss rep $rep ===" >&2
  timeout 3900 python scripts/reference_convergence.py run \
      --root "$root" --arm ref --loss "$loss" --rep "$rep" >&2 \
    || { echo "=== retry $loss rep $rep ===" >&2;
         timeout 3900 python scripts/reference_convergence.py run \
             --root "$root" --arm ref --loss "$loss" --rep "$rep" >&2; }
}

run arcsoftmax_m0.25 1
run asoftmax_m4 1
run att_amsoftmax 1
run mt_softmax 0
run arcsoftmax_m0.25 2
run asoftmax_m4 2
run att_amsoftmax 2
run mt_softmax 1
run softmax 0
run amsoftmax 0
run mt_softmax 2
run softmax 1
run amsoftmax 1
echo "=== $(date +%H:%M:%S) ref2 queue done ===" >&2
