#!/bin/bash
# Round-5 confirmation hunter: fire ONE 600k-doc 2v8 steady-state pair
# (BENCH/r5_pair28_600k.sh) when a quiet window opens — pair #8 cleared the
# 0.8 gate at sustained 0.841 in a 0.99-control window; this hunts a second
# window to confirm repeatability. Quiet = 4-core pinned md5 probe >= QUIET
# twice in a row AND the 2c/8c control pair within 10% of each other.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_watch600k.log
: >> "$LOG"
DEADLINE=$(( $(date +%s) + ${WATCH_HOURS:-3}*3600 ))
QUIET=${WATCH_QUIET:-0.45}

probe() {
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
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  W=$(probe)
  echo "[watch600k $(date +%T)] per-core $W GB/s (streak $streak)" >> "$LOG"
  if python3 -c "exit(0 if $W >= $QUIET else 1)"; then
    streak=$((streak+1))
  else
    streak=0
  fi
  if [ "$streak" -ge 2 ]; then
    C2=$(ctl 2 0); C8=$(ctl 8 16)
    echo "[watch600k] controls 2c=$C2 8c=$C8" >> "$LOG"
    if python3 -c "exit(0 if $C8/$C2 >= 0.90 and $C8 >= $QUIET else 1)"; then
      echo "=== firing 600k pair $(date +%T) ===" >> "$LOG"
      ./BENCH/r5_pair28_600k.sh
      echo "=== pair done $(date +%T) ===" >> "$LOG"
      break
    fi
    streak=0
  fi
  sleep 360
done
echo "=== watcher exit $(date +%T) ===" >> "$LOG"
