#!/bin/bash
# 2v8 steady-state pair at 60k docs: short reps (~100 s on the 8-leg,
# ~400 s on the 2-leg) are stationary within this box's weather oscillation
# (the 200k window showed 5x swings WITHIN single reps, drowning the
# measurand). Both legs loop for the same ~35-min window; per-rep times +
# wall offsets let overlapping reps be paired by weather pocket.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_pair28_60k.log
: > "$LOG"
control() {
  local tag=$1
  for pair in "2 0" "8 16"; do
    set -- $pair; local n=$1 base=$2
    local t0=$(date +%s%N)
    for i in $(seq 0 $((n-1))); do
      taskset -c $((base+i)) sh -c 'head -c 1500000000 /dev/zero | md5sum > /dev/null' &
    done
    wait
    local t1=$(date +%s%N)
    python3 -c "print(f'[control $tag] ${n}c: {1.5/((${t1}-${t0})/1e9):.3f} GB/s/core')" >> "$LOG"
  done
}
control pre
echo "=== 2v8 steady-state pair, 60k docs, start $(date +%s) $(date +%T) ===" >> "$LOG"
: > /tmp/r4_leg2b.log; : > /tmp/r4_leg8b.log
./BENCH/scalebench2.sh 2 0-1 60000 8 2000 /tmp/r4_leg2b.log &
P2=$!
./BENCH/scalebench2.sh 8 16-23 60000 24 2000 /tmp/r4_leg8b.log &
wait $P2 2>/dev/null; wait 2>/dev/null
control post
echo "=== done $(date +%s) $(date +%T) ===" >> "$LOG"
cat /tmp/r4_leg2b.log /tmp/r4_leg8b.log >> "$LOG"
