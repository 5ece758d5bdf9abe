#!/bin/bash
# Round-5 quiet-window hunter (run detached). Every ~7 min, probe with a
# 4-process pinned md5 control; at 2 consecutive quiet probes:
#   1. if genuinely quiet, re-record the sf0.1 full-sweep headline (Bench
#      only advances BENCH_LOCAL for a faster same-config run);
#   2. run ONE steady-state 2v8 pair at 60k docs (the post-byte-diet gate
#      measurement) and report the SUSTAINED efficiency — completed-rep
#      throughput over the shared window, not best-rep (best-rep pairs a
#      2-leg lucky pocket against an 8-leg average and can read >1).
# Stop on sustained eff >= 0.8 with quiet controls, or after 3 pairs, or at
# the deadline.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_watch.log
: >> "$LOG"
DEADLINE=$(( $(date +%s) + ${WATCH_HOURS:-4}*3600 ))
QUIET=${WATCH_QUIET:-0.49}
SWEEPQ=${WATCH_SWEEPQ:-0.55}
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
CP="target/scala-2.13/classes:/opt/spark/jars/*"

probe() {
  local t0=$(date +%s%N)
  for i in 0 1 2 3; do
    taskset -c $i sh -c 'head -c 1200000000 /dev/zero | md5sum > /dev/null' &
  done
  wait
  local t1=$(date +%s%N)
  python3 -c "print(f'{1.2/((${t1}-${t0})/1e9):.3f}')"
}

control() { # 2v8 machine-ceiling control, tagged
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

sustained() { # <legfile> -> docs/s over completed reps (sum of samples)
  python3 - "$1" <<'EOF'
import re, sys
txt = open(sys.argv[1]).read()
m = re.search(r'"e2e_samples":\[([0-9.,]*)\]', txt)
n = re.search(r'"e2e_docs":(\d+)', txt)
if not m or not n or not m.group(1): print("NA"); raise SystemExit
xs = [float(x) for x in m.group(1).split(",")]
print(f"{len(xs)*int(n.group(1))/sum(xs):.2f}")
EOF
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
    echo "=== 2v8 steady-state pair, 60k, start $(date +%T) ===" >> "$LOG"
    : > /tmp/r5w_leg2.log; : > /tmp/r5w_leg8.log
    ./BENCH/scalebench2.sh 2 0-1 60000 8 2000 /tmp/r5w_leg2.log &
    P2=$!
    ./BENCH/scalebench2.sh 8 16-23 60000 24 2000 /tmp/r5w_leg8.log &
    wait $P2 2>/dev/null; wait 2>/dev/null
    control post
    S2=$(sustained /tmp/r5w_leg2.log)
    S8=$(sustained /tmp/r5w_leg8.log)
    EFF=$(python3 -c "print(f'{$S8/(4*$S2):.3f}')" 2>/dev/null || echo NA)
    echo "[pair result] sustained2=${S2} docs/s sustained8=${S8} docs/s eff=$EFF" >> "$LOG"
    cat /tmp/r5w_leg2.log /tmp/r5w_leg8.log >> "$LOG"
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
