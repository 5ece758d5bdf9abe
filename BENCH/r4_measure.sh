#!/bin/bash
# Round-4 measurement sequence (run detached; Bash-tool timeout is 600 s):
#   1. full query sweep + best-of-3 e2e at sf0.1 on local[32] (bare java so
#      the JSON line is raw; Bench itself refuses to clobber a faster
#      same-config BENCH_LOCAL.json)
#   2. raw-CPU 4v16 control (pinned md5 processes, same cpusets as the legs)
#   3. ONE concurrent same-weather scaling pair: 4-core leg on 0-3 and
#      16-core leg on 16-31 launched simultaneously, 200k docs each —
#      the storm-robust estimator from BENCH/BASELINE.md; also evidences
#      matched_pairs partition-invariance at the 200k scale
#   4. control again (weather bracket)
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_measure.log
: > "$LOG"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

control() {
  local tag=$1
  for pair in "4 0" "16 16"; do
    set -- $pair; local n=$1 base=$2
    local t0=$(date +%s%N)
    for i in $(seq 0 $((n-1))); do
      taskset -c $((base+i)) sh -c 'head -c 1500000000 /dev/zero | md5sum > /dev/null' &
    done
    wait
    local t1=$(date +%s%N)
    python3 -c "print(f'[control $tag] ${n}c: {(${t1}-${t0})/1e9:.2f} s -> {1.5/((${t1}-${t0})/1e9):.3f} GB/s/core')" >> "$LOG"
  done
}

echo "=== full sweep sf0.1 local[32] start $(date +%T) ===" >> "$LOG"
rm -rf /dev/shm/graft-spark/* 2>/dev/null || true
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_E2E_K=3 \
  java $AO -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" graft.Bench 2>&1 | grep -E '"metric"|\[bench\]' >> "$LOG"
echo "=== full sweep done $(date +%T) ===" >> "$LOG"

control pre
echo "=== concurrent pair start (4c on 0-3, 16c on 16-31, 200k) $(date +%T) ===" >> "$LOG"
: > /tmp/r4_leg4.log; : > /tmp/r4_leg16.log
T0=$(date +%s)
./BENCH/scalebench.sh 4 0-3 200000 /tmp/r4_leg4.log &
P4=$!
./BENCH/scalebench.sh 16 16-31 200000 /tmp/r4_leg16.log &
P16=$!
wait $P16; T16=$(( $(date +%s) - T0 ))
wait $P4;  T4=$(( $(date +%s) - T0 ))
echo "[pair] wall T4=${T4}s T16=${T16}s (leg-internal e2e_sec in leg logs)" >> "$LOG"
echo "=== concurrent pair done $(date +%T) ===" >> "$LOG"
control post
cat /tmp/r4_leg4.log /tmp/r4_leg16.log >> "$LOG"
echo "=== all done $(date +%T) ===" >> "$LOG"
