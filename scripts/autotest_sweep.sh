#!/bin/bash
# Long-running randomized autotest sweep on the real TPU (reference protocol:
# Integral/main.cpp:154-237 autoTestDemo, run toward the 3000-line res.log
# record). Two phases:
#   A: unbucketed runs for every op — covers off-lattice shapes, each run
#      pays a fresh XLA+Mosaic compile (~4-45 s/shape on this runtime).
#   B: bucketed grind — shapes quantized to a lattice (and static float
#      params laddered) so the persistent compile cache serves repeat runs;
#      the integral additionally proves the zero-embed slice identity.
# Appends to /root/repo/res.log via the CLI. Stop: touch /tmp/autotest_stop
cd /root/repo || exit 1
export TPUIMG_CACHE_DIR=/root/repo/.jax_cache
seed_base=${1:-100}
log=${AUTOTEST_LOG:-/tmp/autotest_sweep.log}

run() {
  echo "=== $* $(date +%H:%M:%S) ===" >> "$log"
  timeout 7200 python -m tpuimg "$@" >> "$log" 2>&1
  echo "exit=$?" >> "$log"
  [ -f /tmp/autotest_stop ] && { echo STOPPED >> "$log"; exit 0; }
}

# Phase 0 — regenerate the tracked sweep artifacts (docs/sweep_morphology.*;
# the round-2 run left the JSON in cwd and it was lost)
echo "=== morph_sweep $(date +%H:%M:%S) ===" >> "$log"
timeout 3600 python scripts/morph_sweep.py >> "$log" 2>&1
echo "exit=$?" >> "$log"

# Phase A — off-lattice coverage for every op
for sub in clahe-autotest gaussian-autotest guided-autotest he-autotest \
           morph-autotest; do
  run $sub --runs 5 --seed "$seed_base"
done

# Phase B — bucketed grind: integral toward the reference's 3000-run record,
# interleaved with bucketed runs of the other five ops
for cycle in $(seq 0 400); do
  seed=$((seed_base + 1 + cycle))
  run integral-autotest --bucket 512 --runs 40 --seed "$seed"
  case $((cycle % 5)) in
    0) run he-autotest --bucket 512 --runs 6 --seed "$seed" ;;
    1) run morph-autotest --bucket 512 --runs 6 --seed "$seed" ;;
    2) run gaussian-autotest --bucket 512 --runs 4 --seed "$seed" ;;
    3) run guided-autotest --bucket 512 --runs 4 --seed "$seed" ;;
    4) run clahe-autotest --bucket 512 --runs 4 --seed "$seed" ;;
  esac
done
