#!/bin/bash
# Round-3 session-B randomized-autotest sweep: grows res.log toward the
# reference's 3000-run standing evidence (Integral/res.log). Sequential —
# one process holds the single TPU chip at a time. Bucketed mode (see
# cli.py cmd_integral_autotest docstring) keeps the compiled-program count
# bounded so the persistent cache serves repeat geometries.
set -u
cd /root/repo
run() {
  echo "=== $(date -u +%H:%M:%S) $* ===" >> /tmp/sweep_r3b.log
  python -m tpuimg "$@" >> /tmp/sweep_r3b.log 2>&1
  echo "=== exit $? ===" >> /tmp/sweep_r3b.log
}
run integral-autotest --runs 1400 --bucket 512 --seed 42
run he-autotest       --runs 400  --bucket 512 --seed 42
run morph-autotest    --runs 300  --bucket 512 --seed 42
run clahe-autotest    --runs 200  --bucket 512 --seed 42
run gaussian-autotest --runs 200  --bucket 512 --seed 42
run guided-autotest   --runs 150  --bucket 512 --seed 42
echo "=== sweep complete $(date -u) ===" >> /tmp/sweep_r3b.log
