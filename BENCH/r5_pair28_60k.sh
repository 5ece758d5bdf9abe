#!/bin/bash
# Round-5 2v8 steady-state pair at 60k docs — identical protocol to
# r4_pair28_60k.sh (same-weather concurrent legs, best-of-k inside one JVM
# per cpuset, sustained-throughput estimator), re-run after the url->long
# dictionary encoding landed in the candidate/cluster shuffles (round-4
# verdict #1: the byte diet was the one untried code lever against the
# memory-bandwidth ceiling that kept sustained eff at 0.70-0.76 vs the 0.8
# gate with the machine control at 0.88).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_pair28_60k.log
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
echo "=== r5 2v8 steady-state pair, 60k docs, start $(date +%s) $(date +%T) ===" >> "$LOG"
: > /tmp/r5_leg2.log; : > /tmp/r5_leg8.log
./BENCH/scalebench2.sh 2 0-1 60000 8 2000 /tmp/r5_leg2.log &
P2=$!
./BENCH/scalebench2.sh 8 16-23 60000 24 2000 /tmp/r5_leg8.log &
wait $P2 2>/dev/null; wait 2>/dev/null
control post
echo "=== done $(date +%s) $(date +%T) ===" >> "$LOG"
cat /tmp/r5_leg2.log /tmp/r5_leg8.log >> "$LOG"
