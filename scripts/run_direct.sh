#!/usr/bin/env bash
# Run a compiled main (graft.Verify / graft.Bench / graft.tools.Probe)
# directly on the JVM, bypassing sbt — so long measurement runs don't
# hold the sbt project lock and block compilation.  Requires a prior
# `sbt compile`.  Usage:
#   scripts/run_direct.sh graft.tools.Probe /root/testdata/sf0.1 q 16 q_an_mad
# Env: SPARK_DRIVER_MEM (default 8g), SPARK_EXTRA_OPTS (extra -D flags).
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  ${SPARK_EXTRA_OPTS:-} \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
