#!/bin/bash
# Launch a graft main class directly against the compiled classes +
# the image's Spark jars (same JVM flags build.sbt uses for `run`),
# without holding an sbt server per process — the band campaign runs
# several measurement JVMs side by side.
# Usage: band_run.sh <mainClass> [args...]
set -u
# GRAFT_CLASSES: point long-running JVMs at a snapshot of the compiled
# classes so a recompile mid-measurement can't serve a torn class mix.
CP="${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# Aggressive periodic GC: a long-lived measurement JVM only deletes its
# shuffle files when the driver GC collects the shuffle references
# (ContextCleaner); at the default 30min interval, a dozen concurrent
# streams accumulate tens of GB of blockmgr spill and fill the disk.
# SPARK_GRAFT_LOCAL_DIR: per-stream spill root (mkdir'd here). Keying
# the blockmgr/temp_shuffle dirs by stream lets the disk guard attribute
# a runaway spill to its owning JVM instead of guessing via lsof.
if [ -n "${SPARK_GRAFT_LOCAL_DIR:-}" ]; then
  mkdir -p "$SPARK_GRAFT_LOCAL_DIR"
  LOCALDIR_FLAG="-Dspark.local.dir=$SPARK_GRAFT_LOCAL_DIR"
else
  LOCALDIR_FLAG=""
fi
exec java $OPENS \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Dspark.cleaner.periodicGC.interval="${SPARK_PERIODIC_GC:-5min}" \
  $LOCALDIR_FLAG \
  -cp "$CP" "$@"
