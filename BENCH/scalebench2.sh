#!/bin/bash
# Steady-state scaling leg: ./scalebench2.sh <cores> <cpuset> <ndocs> <k> <budget_sec> [out]
#
# Like scalebench.sh but runs best-of-k e2e reps INSIDE one JVM (no restart
# gaps): launched simultaneously with its partner leg on a disjoint cpuset,
# both legs stay busy for the whole window, so neither leg's tail runs
# unopposed — the steady-state variant of the same-weather concurrent pair
# (the single-rep protocol deflates T4 by letting its tail run solo after
# the 16-core leg finishes). Efficiency = bestT4 / (4 * bestT16).
set -e
cd "$(dirname "$0")/.."
CORES=$1; CPUSET=$2; N=$3; K=${4:-3}; BUDGET=${5:-1500}; OUT=${6:-/dev/stdout}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
rm -rf /dev/shm/graft-spark/* 2>/dev/null || true
SPARK_GRAFT_CPUS=$CORES SPARK_GRAFT_E2E_N=$N SPARK_GRAFT_E2E_K=$K \
  SPARK_GRAFT_E2E_BUDGET_SEC=$BUDGET \
  SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  taskset -c $CPUSET java $AO -Xmx48g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench 2>&1 |
  grep -E "\"metric\"|\[bench\]" >> "$OUT"
