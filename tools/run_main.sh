#!/bin/bash
# Run a graft main against the compiled classes without sbt overhead.
# Usage: tools/run_main.sh <MainClass> [args...]
# Env: JVM_MEM (default 8g), SPARK_GRAFT_CPUS
MAIN=$1; shift
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS -Xmx${JVM_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp /root/repo/target/scala-2.13/classes:'/opt/spark/jars/*' "$MAIN" "$@"
