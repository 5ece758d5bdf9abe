#!/bin/bash
# Pinned scaling-protocol leg: ./scalebench.sh <cores> <cpuset> <ndocs> [out]
#
# Runs the graft.Bench e2e (queries skipped, ONE rep — interleaving happens
# at the process level) under bare `java` (never sbt), whole JVM pinned with
# taskset. See BENCH/BASELINE.md for the protocol: interleave N / 4N legs
# >= 5 pairs, report best-of-k + all raw samples, document the raw-CPU
# machine control alongside (this VM cannot scale 8->32 even for
# embarrassingly-parallel independent processes).
set -e
cd "$(dirname "$0")/.."
CORES=$1; CPUSET=$2; N=$3; OUT=${4:-/dev/stdout}
CP="target/scala-2.13/classes:/opt/spark/jars/*"
AO="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
rm -rf /dev/shm/graft-spark/* 2>/dev/null || true
SPARK_GRAFT_CPUS=$CORES SPARK_GRAFT_E2E_N=$N SPARK_GRAFT_E2E_K=1 \
  SPARK_GRAFT_SKIP_QUERIES=1 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  taskset -c $CPUSET java $AO -Xmx48g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench 2>&1 |
  grep -E "\"metric\"|\[bench\]" >> "$OUT"
