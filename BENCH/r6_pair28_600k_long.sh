#!/bin/bash
# Round-6 2v8 steady-state pair at 600k docs — the deepest amortization
# point this box can hold. Pair #6 (200k) confirmed the fixed-per-stage-idle
# hypothesis: 8-core task-run utilization rose 76% -> 88% going 60k -> 200k.
# At 600k (3x the per-rep work again) the idle term should fall to ~4-8%,
# putting the wall ratio within reach of the 0.8 gate in any window whose
# controls hold. k is small (3 and 9) so both legs K-cap near each other.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r6c_pair600k.log
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
echo "=== r6 2v8 steady-state pair, 600k docs, start $(date +%s) $(date +%T) ===" >> "$LOG"
: > /tmp/r6c_600k_leg2.log; : > /tmp/r6c_600k_leg8.log
./BENCH/scalebench2.sh 2 0-1 600000 5 3400 /tmp/r6c_600k_leg2.log &
P2=$!
./BENCH/scalebench2.sh 8 16-23 600000 15 3400 /tmp/r6c_600k_leg8.log &
wait $P2 2>/dev/null; wait 2>/dev/null
control post
echo "=== done $(date +%s) $(date +%T) ===" >> "$LOG"
cat /tmp/r6c_600k_leg2.log /tmp/r6c_600k_leg8.log >> "$LOG"
