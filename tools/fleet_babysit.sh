#!/bin/bash
# Keep the round-12 tail-stream fleet at full strength: a stream that
# dies (heap OOM on a monster query, disk-guard SIGTERM, ENOSPC
# collateral) is relaunched from its incremental /tmp checkpoint after
# a short cooldown. Relaunches use 8g for the 32-256 s band (the 7g
# originals are what OOM'd) and 10g for the wide bands. A stream that
# exits via the 5-consecutive-all-failure abort is still safe to
# relaunch: the persistent negative cache keeps it from re-paying the
# queries that killed it.
set -u
cd /root/repo
LOGD=data/r12logs
mkdir -p "$LOGD"
running() { pgrep -f "graft.lab.TailCampaign .* $1 $2 $3\$" > /dev/null; }
launch() { # seed mem lo hi extra_env...
  local seed=$1 mem=$2 lo=$3 hi=$4; shift 4
  env "$@" GRAFT_CLASSES=/tmp/graft_classes_r12 SPARK_DRIVER_MEM="$mem" \
    SPARK_GRAFT_CPUS=2 SPARK_PERIODIC_GC=2min \
    nohup tools/band_run.sh graft.lab.TailCampaign /root/testdata/sf0.1 160 \
      2147483647 /tmp/graft_band "$seed" "$lo" "$hi" \
      >> "$LOGD/tail_s$seed.log" 2>&1 &
  echo "$(date -Is) relaunched s$seed band [$lo,$hi] mem=$mem pid=$!" \
    >> "$LOGD/babysit.log"
}
while true; do
  # leave headroom: never relaunch into <6 GB available memory
  avail=$(awk '/MemAvailable/ {print int($2/1048576)}' /proc/meminfo)
  if [ "$avail" -ge 10 ]; then
    for s in 65 66 67 68 69 70 71 72 73; do
      running "$s" 32 256 || launch "$s" 8g 32 256
    done
    running 74 96 280 || launch 74 10g 96 280
    running 75 96 280 || launch 75 10g 96 280
    running 76 150 362 || launch 76 10g 150 362 \
      GRAFT_TAIL_TIMEOUT=400 GRAFT_TAIL_EPISODE_CAP=16
    running 77 150 362 || launch 77 10g 150 362 \
      GRAFT_TAIL_TIMEOUT=400 GRAFT_TAIL_EPISODE_CAP=16
  else
    echo "$(date -Is) skip pass: only ${avail}G available" >> "$LOGD/babysit.log"
  fi
  sleep 60
done
