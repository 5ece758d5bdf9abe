#!/bin/bash
# N=2 vs 4N=8 steady-state same-weather pair (north rule: "two cluster
# sizes, N and 4N"). Chosen because (a) the machine's raw-CPU control is in
# its best band at 2->8 (0.84-0.91; it cannot scale 8->32 even for
# independent processes), and (b) a 10-core pair leaves 22 cores of bus
# headroom, minimizing self-interference — the estimator measures the JOB,
# not the box's saturation point. Both legs loop best-of-k reps inside one
# JVM for the whole window (scalebench2), so neither tail runs unopposed.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_pair28.log
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
echo "=== steady-state 2v8 pair start (200k docs, ~70 min window) $(date +%T) ===" >> "$LOG"
: > /tmp/r4_leg2.log; : > /tmp/r4_leg8.log
./BENCH/scalebench2.sh 2 0-1 200000 3 4200 /tmp/r4_leg2.log &
P2=$!
./BENCH/scalebench2.sh 8 16-23 200000 10 4200 /tmp/r4_leg8.log &
wait $P2 2>/dev/null; wait 2>/dev/null
control post
T2=$(grep -o '"e2e_sec":[0-9.]*' /tmp/r4_leg2.log | cut -d: -f2)
T8=$(grep -o '"e2e_sec":[0-9.]*' /tmp/r4_leg8.log | cut -d: -f2)
EFF=$(python3 -c "print(f'{$T2/(4*$T8):.3f}')" 2>/dev/null || echo NA)
echo "[pair result] bestT2=${T2}s bestT8=${T8}s eff=$EFF" >> "$LOG"
cat /tmp/r4_leg2.log /tmp/r4_leg8.log >> "$LOG"
echo "=== done $(date +%T) ===" >> "$LOG"
