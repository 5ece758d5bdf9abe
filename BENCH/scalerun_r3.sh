#!/bin/bash
# Round-3 scaling evidence: interleaved 4-core / 16-core legs (the north
# rule's N and 4N), 200k docs each, K pairs, best-of-k estimator.
# Usage: ./scalerun_r3.sh [pairs] [ndocs]
cd "$(dirname "$0")"
PAIRS=${1:-5}
N=${2:-200000}
LOG=/tmp/scale_r3.log
: > "$LOG"
for i in $(seq 1 "$PAIRS"); do
  echo "=== pair $i leg local[4] cpuset 0-3 $(date +%T) ===" >> "$LOG"
  ./scalebench.sh 4 0-3 "$N" "$LOG"
  echo "=== pair $i leg local[16] cpuset 0-15 $(date +%T) ===" >> "$LOG"
  ./scalebench.sh 16 0-15 "$N" "$LOG"
done
echo "=== done $(date +%T) ===" >> "$LOG"
