#!/bin/bash
# Round-4 evidence grind, continuation (session 2): same protocol, buckets,
# and static-arg ladders as sweep_r4.sh (so the persistent compile cache
# from session 1 serves everything), but with larger --runs per invocation
# to amortize the ~25 s process startup — session 1 measured warm cycles at
# ~10 s/run and cold ladder compiles dominating only the first two cycles.
#
# Adds the enhance-autotest family (new this round, 0 recorded runs) with a
# small program space (bucket 1024, max-size 2048 -> <=4 compiled shapes of
# the full fused pipeline).
#
# Chip sharing / stop protocol identical to sweep_r4.sh:
#   /tmp/autotest_pause, /tmp/autotest_stop, DEADLINE (cooperative, passed
#   into the python driver as --deadline; never signal-kill a TPU process).
set -u
cd /root/repo
export TPUIMG_CACHE_DIR=/root/repo/.jax_cache
log=${SWEEP_LOG:-/tmp/sweep_r4b.log}
deadline=${DEADLINE:?set DEADLINE (epoch seconds)}
target=${TARGET:-520}
target_enh=${TARGET_ENH:-60}
# session 1's tail was merged into docs/res.log; root res.log restarts empty
base=$(wc -l < res.log 2>/dev/null || echo 0)

count() {  # $1 = grep tag; cumulative = tracked record + this session's tail
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
  # per-chunk ceiling: 50 min or global deadline, whichever first
  local dl=$(( $(date +%s) + 3000 ))
  [ "$dl" -gt "$deadline" ] && dl=$deadline
  echo "=== $(date -u +%H:%M:%S) $* ===" >> "$log"
  python -m tpuimg "$@" --deadline "$dl" >> "$log" 2>&1
  echo "=== exit $? lines=$(wc -l < res.log 2>/dev/null || echo 0) ===" >> "$log"
}

echo "START r4b $(date -u) deadline=$deadline base=$base" >> "$log"
for cycle in $(seq 0 60); do
  seed=$(( ${SEED_BASE:-9500} + cycle ))
  n_cl=$(count 'tpuimg-clahe'); n_ga=$(count 'tpuimg-gauss')
  n_gu=$(count 'tpuimg-guided'); n_he=$(count 'tpuimg-he')
  n_mo=$(( $(count 'tpuimg-erode') + $(count 'tpuimg-dilate') ))
  n_en=$(count 'tpuimg-enhance')
  echo "--- cycle $cycle counts clahe=$n_cl gauss=$n_ga guided=$n_gu he=$n_he morph=$n_mo enhance=$n_en ---" >> "$log"
  done_all=1
  [ "$n_cl" -lt "$target" ] && { done_all=0; run clahe-autotest    --bucket 1536 --max-size 3072 --runs 40 --seed "$seed"; }
  [ "$n_ga" -lt "$target" ] && { done_all=0; run gaussian-autotest --bucket 1024 --runs 40 --seed "$seed"; }
  [ "$n_gu" -lt "$target" ] && { done_all=0; run guided-autotest   --bucket 1024 --runs 40 --seed "$seed"; }
  [ "$n_he" -lt "$target" ] && { done_all=0; run he-autotest       --bucket 512  --runs 30 --seed "$seed"; }
  [ "$n_mo" -lt "$target" ] && { done_all=0; run morph-autotest    --bucket 1024 --runs 30 --seed "$seed"; }
  [ "$n_en" -lt "$target_enh" ] && { done_all=0; run enhance-autotest --bucket 1024 --max-size 2048 --runs 20 --seed "$seed"; }
  [ "$done_all" = 1 ] && { echo "ALL TARGETS MET $(date -u)" >> "$log"; break; }
done
echo "COMPLETE $(date -u)" >> "$log"
