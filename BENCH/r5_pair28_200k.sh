#!/bin/bash
# Round-5 2v8 steady-state pair at 200k docs — the stage-amortization test.
# At 60k docs an 8-core rep is ~26-30 s wall and task-run utilization drops
# to ~68% (vs 82% at 2 cores): the loss is fixed per-stage latency, not
# work. If that explanation is right, the same pair at 200k (reps ~4x
# longer) must read HIGHER wall efficiency in comparable weather — the
# 100-TB-relevant regime is the amortized one.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_pair200k.log
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
echo "=== r5 2v8 steady-state pair, 200k docs, start $(date +%s) $(date +%T) ===" >> "$LOG"
: > /tmp/r5_200k_leg2.log; : > /tmp/r5_200k_leg8.log
./BENCH/scalebench2.sh 2 0-1 200000 6 2400 /tmp/r5_200k_leg2.log &
P2=$!
./BENCH/scalebench2.sh 8 16-23 200000 18 2400 /tmp/r5_200k_leg8.log &
wait $P2 2>/dev/null; wait 2>/dev/null
control post
echo "=== done $(date +%s) $(date +%T) ===" >> "$LOG"
cat /tmp/r5_200k_leg2.log /tmp/r5_200k_leg8.log >> "$LOG"
