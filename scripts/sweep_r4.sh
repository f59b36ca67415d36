#!/bin/bash
# Round-4 evidence grind: bring every non-integral op family to >= 500
# cumulative randomized runs (VERDICT r3 item 3; reference bar:
# Integral/res.log's 3000-run record, protocol Integral/main.cpp:154-237).
# Integral itself is already at 3,498 runs and is deliberately NOT ground
# further (VERDICT item 9).
#
# Chip sharing (single TPU):
#   - touch /tmp/autotest_pause  -> idle between chunks (chip free)
#   - touch /tmp/autotest_stop   -> exit after current chunk
#   - DEADLINE (epoch seconds)   -> cooperative stop, also passed INTO the
#     python driver (--deadline), so runs end cleanly between iterations.
#     No `timeout` wrapper: signal-killing a TPU process wedges the device
#     lease ~10 min (ADVICE r3 finding on sweep_r3c.sh).
#
# Static args are laddered in bucket mode (cli.py) so the compiled-program
# space per family is O(100) and the persistent cache serves repeats.
set -u
cd /root/repo
export TPUIMG_CACHE_DIR=/root/repo/.jax_cache
log=${SWEEP_LOG:-/tmp/sweep_r4.log}
deadline=${DEADLINE:-$(( $(date +%s) + 30600 ))}   # default: 8.5 h
targets_he=${TARGET:-520}
base=$(wc -l < res.log 2>/dev/null || echo 0)      # docs/res.log holds all
                                                   # lines up to this point

# cumulative per-family count = historical (docs/res.log) + new tail
# (grep -c prints 0 itself on no match; only guard the missing-file case)
count() {  # $1 = grep tag
  local hist new
  hist=$(grep -c -- "$1" docs/res.log 2>/dev/null); hist=${hist:-0}
  new=$(tail -n +$((base + 1)) res.log 2>/dev/null | grep -c -- "$1"); new=${new:-0}
  echo $((hist + new))
}

gate() {
  while [ -f /tmp/autotest_pause ]; do sleep 20; done
  [ -f /tmp/autotest_stop ] && { echo "STOPPED $(date -u)" >> "$log"; exit 0; }
  [ "$(date +%s)" -ge "$deadline" ] && { echo "DEADLINE $(date -u)" >> "$log"; exit 0; }
  return 0
}

run() {
  gate
  # per-chunk ceiling: 75 min or global deadline, whichever first;
  # enforced cooperatively inside the driver between runs
  local dl=$(( $(date +%s) + 4500 ))
  [ "$dl" -gt "$deadline" ] && dl=$deadline
  echo "=== $(date -u +%H:%M:%S) $* ===" >> "$log"
  python -m tpuimg "$@" --deadline "$dl" >> "$log" 2>&1
  echo "=== exit $? lines=$(wc -l < res.log 2>/dev/null || echo 0) ===" >> "$log"
}

echo "START r4 $(date -u) deadline=$deadline base=$base" >> "$log"
for cycle in $(seq 0 60); do
  seed=$(( ${SEED_BASE:-9000} + cycle ))
  n_cl=$(count 'tpuimg-clahe'); n_ga=$(count 'tpuimg-gauss')
  n_gu=$(count 'tpuimg-guided'); n_he=$(count 'tpuimg-he')
  n_mo=$(( $(count 'tpuimg-erode') + $(count 'tpuimg-dilate') ))
  echo "--- cycle $cycle counts clahe=$n_cl gauss=$n_ga guided=$n_gu he=$n_he morph=$n_mo ---" >> "$log"
  done_all=1
  [ "$n_cl" -lt "$targets_he" ] && { done_all=0; run clahe-autotest    --bucket 1536 --max-size 3072 --runs 14 --seed "$seed"; }
  [ "$n_ga" -lt "$targets_he" ] && { done_all=0; run gaussian-autotest --bucket 1024 --runs 14 --seed "$seed"; }
  [ "$n_gu" -lt "$targets_he" ] && { done_all=0; run guided-autotest   --bucket 1024 --runs 14 --seed "$seed"; }
  [ "$n_he" -lt "$targets_he" ] && { done_all=0; run he-autotest       --bucket 512  --runs 10 --seed "$seed"; }
  [ "$n_mo" -lt "$targets_he" ] && { done_all=0; run morph-autotest    --bucket 1024 --runs 10 --seed "$seed"; }
  [ "$done_all" = 1 ] && { echo "ALL TARGETS MET $(date -u)" >> "$log"; break; }
done
echo "COMPLETE $(date -u)" >> "$log"
