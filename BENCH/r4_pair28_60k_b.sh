#!/bin/bash
# Second 60k 2v8 steady-state window (the first ended inside a 0.17 GB/s
# storm collapse that ate the 2-leg's second rep). Logs land in BENCH/ so
# the round keeps them regardless of when the driver snapshots.
set -u
cd "$(dirname "$0")/.."
LOG=BENCH/logs_r4_pair28_60k_b.log
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
echo "=== 2v8 steady-state pair B, 60k docs, start $(date +%s) $(date +%T) ===" >> "$LOG"
: > /tmp/r4_leg2c.log; : > /tmp/r4_leg8c.log
./BENCH/scalebench2.sh 2 0-1 60000 6 1400 /tmp/r4_leg2c.log &
P2=$!
./BENCH/scalebench2.sh 8 16-23 60000 18 1400 /tmp/r4_leg8c.log &
wait $P2 2>/dev/null; wait 2>/dev/null
control post
echo "=== done $(date +%s) $(date +%T) ===" >> "$LOG"
cat /tmp/r4_leg2c.log /tmp/r4_leg8c.log >> "$LOG"
