#!/usr/bin/env bash
# A/B for the r7->r8 d08/d10/q59 bench drift (VERDICT r8 item 1):
# runs the chain d08 -> d10 -> q59 with 4 warm reps per query through
# graft.tools.RunQuery, alternating the r7 jar (c365d09) and the
# current jar in an A/B/A/B interleave so an environmental shift
# between measurement windows shows up as BOTH jars moving together.
# Usage: tools/ab_drift.sh <r7_jar> <cur_jar> [sfDir]
set -euo pipefail
R7_JAR=$1
CUR_JAR=$2
SF=${3:-/root/testdata/sf0.1}
QUERIES="d08_jaccard_exact_pairs d10_dup_clusters q59_cluster_split"
run_chain() {
  local tag=$1 jar=$2
  for q in $QUERIES; do
    SPARK_GRAFT_REPS=4 SPARK_GRAFT_CPUS=32 \
      java -cp "/opt/spark/jars/*:$jar" \
      -Xmx8g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
      --add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
      graft.tools.RunQuery "$q" "$SF" 2>/dev/null \
      | grep runquery | sed "s/^/[$tag] /"
  done
}
for round in 1 2; do
  run_chain "r7-round$round" "$R7_JAR"
  run_chain "cur-round$round" "$CUR_JAR"
done
