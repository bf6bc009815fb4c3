#!/bin/bash
# Run a graft main class outside sbt against the compiled classes —
# same JVM flags build.sbt forks with. Usage:
#   tools/run_main.sh [-t] <mainClass> [args...]
#     -t  include the Test classpath (test classes + scalatest jars)
# Env: SPARK_DRIVER_MEM (default 8g) and the SPARK_GRAFT_* vars the
# mains themselves read.
cd "$(dirname "$0")/.." || exit 1
CP="target/scala-2.13/classes:/opt/spark/jars/*"
if [ "$1" = "-t" ]; then
  shift
  TESTJARS=$(find "$HOME/.cache/coursier" -name 'scalatest*.jar' -o -name 'scalactic*.jar' 2>/dev/null | tr '\n' ':')
  CP="target/scala-2.13/test-classes:$TESTJARS$CP"
fi
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $OPENS "-Xmx${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
