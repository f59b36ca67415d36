#!/bin/bash
# Round-3 session-C evidence grind: grow res.log to the reference's
# standing 3000-run record (Integral/res.log, Integral/readme.md:30-31).
# Chunked so the single TPU chip can be borrowed interactively:
#   - touch /tmp/autotest_pause  -> script idles between chunks (chip free)
#   - touch /tmp/autotest_stop   -> script exits after the current chunk
#   - DEADLINE (epoch seconds)   -> hard stop so the round driver's bench
#     never finds the chip held
# Integral is the workhorse (zero-diff contract, smallest program space:
# ~(6000/512)^2 bucketed shapes, warm runs ~1-2 s); the float/quantized ops
# are interleaved in small chunks since their static-arg ladders mean more
# cold compiles per line.
set -u
cd /root/repo
export TPUIMG_CACHE_DIR=/root/repo/.jax_cache
log=${SWEEP_LOG:-/tmp/sweep_r3c.log}
deadline=${DEADLINE:-$(( $(date +%s) + 32400 ))}   # default: 9 h

gate() {
  while [ -f /tmp/autotest_pause ]; do sleep 20; done
  [ -f /tmp/autotest_stop ] && { echo "STOPPED $(date -u)" >> "$log"; exit 0; }
  [ "$(date +%s)" -ge "$deadline" ] && { echo "DEADLINE $(date -u)" >> "$log"; exit 0; }
  return 0
}

run() {
  gate
  echo "=== $(date -u +%H:%M:%S) $* ===" >> "$log"
  timeout 3600 python -m tpuimg "$@" >> "$log" 2>&1
  echo "=== exit $? lines=$(wc -l < res.log 2>/dev/null || echo 0) ===" >> "$log"
}

echo "START $(date -u) deadline=$deadline" >> "$log"
for cycle in $(seq 0 80); do
  seed=$(( ${SEED_BASE:-5000} + cycle ))
  run integral-autotest --bucket 512 --runs 30 --seed "$seed"
  case $((cycle % 6)) in
    0) run he-autotest       --bucket 512 --runs 6 --seed "$seed" ;;
    1) run morph-autotest    --bucket 512 --runs 6 --seed "$seed" ;;
    2) run gaussian-autotest --bucket 512 --runs 4 --seed "$seed" ;;
    3) run guided-autotest   --bucket 512 --runs 3 --seed "$seed" ;;
    4) run clahe-autotest    --bucket 512 --runs 3 --seed "$seed" ;;
    5) run integral-autotest --runs 2 --seed "$seed" ;;  # off-lattice
  esac
done
echo "COMPLETE $(date -u)" >> "$log"
