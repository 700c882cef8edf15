#!/bin/bash
# Round-13 fleet: launcher AND babysitter in one (a babysit pass with
# nothing running IS the initial launch, so the layout lives in exactly
# one file). A stream that dies (heap OOM on a monster query, disk-guard
# SIGTERM, ENOSPC collateral) is relaunched from its incremental /tmp
# checkpoint; the persistent negative cache keeps a relaunched stream
# from re-paying the queries that killed it.
#
# Layout (125 GB box, ~114 GB Xmx nominal):
#   s65-s72  32-256 s band, 8g, 300 s timeout (resume r12 checkpoints)
#   s74-s75  96-280 s band, 10g, 620 s timeout — two runs of a 280 s
#            query now FIT (run-twice protocol halves the old 300 s
#            ceiling), opening the 150-280 s label range
#   s76-s77  150-362 s band, 10g, 800 s timeout — same logic for 362 s
#   retry_a  FailedRetry over every stream's timeout-censored pool at
#            800 s, surrogate-ranked — the direct class-8 path
#   (s73 retired this round; its RAM funds retry_a)
#
# Memory gate (round-12 advice): the comment and the threshold agree,
# and the check runs PER LAUNCH — a mass die-off relaunches at most as
# many JVMs as current MemAvailable covers, not 13 against one reading.
set -u
cd /root/repo
LOGD=data/r13logs
mkdir -p "$LOGD"
CLASSES=${GRAFT_CLASSES_SNAPSHOT:-/tmp/graft_classes_r13c}

# launch only into (launch Xmx + 6) GB of available memory
can_launch() { # mem_gb
  local avail
  avail=$(awk '/MemAvailable/ {print int($2/1048576)}' /proc/meminfo)
  [ "$avail" -ge $(( $1 + 6 )) ] && return 0
  echo "$(date -Is) skip launch (${1}g needed + 6g headroom, ${avail}g available)" \
    >> "$LOGD/babysit.log"
  return 1
}

stream_running() { # seed lo hi
  ps -eo args | awk -v s="$1" -v l="$2" -v h="$3" \
    '/graft\.lab\.TailCampaign/ {
       for (i = 1; i <= NF; i++)
         if ($i == "graft.lab.TailCampaign" && $(i+5) == s && $(i+6) == l && $(i+7) == h) found = 1
     } END { exit !found }'
}

retry_running() { # name
  ps -eo args | awk -v n="$1" \
    '/graft\.lab\.FailedRetry/ {
       for (i = 1; i <= NF; i++)
         if ($i == "graft.lab.FailedRetry" && $(i+4) == n) found = 1
     } END { exit !found }'
}

launch_stream() { # seed mem_gb lo hi extra_env...
  local seed=$1 memg=$2 lo=$3 hi=$4; shift 4
  can_launch "$memg" || return 0
  env "$@" GRAFT_CLASSES="$CLASSES" SPARK_DRIVER_MEM="${memg}g" \
    SPARK_GRAFT_CPUS=2 SPARK_PERIODIC_GC=2min \
    SPARK_GRAFT_LOCAL_DIR="/tmp/graft_spill/s$seed" \
    nohup tools/band_run.sh graft.lab.TailCampaign /root/testdata/sf0.1 160 \
      2147483647 /tmp/graft_band "$seed" "$lo" "$hi" \
      >> "$LOGD/tail_s$seed.log" 2>&1 &
  echo "$(date -Is) launched s$seed band [$lo,$hi] mem=${memg}g pid=$!" \
    >> "$LOGD/babysit.log"
}

launch_retry() { # name mem_gb timeout part nparts
  local name=$1 memg=$2 to=$3 part=$4 nparts=$5
  # .done marker = pool drained; refill /tmp/graft_retry_pool and delete
  # the marker to re-arm
  [ -f "/tmp/graft_band/retry_x160_c2_$name.cp.done" ] && return 0
  can_launch "$memg" || return 0
  env GRAFT_CLASSES="$CLASSES" SPARK_DRIVER_MEM="${memg}g" \
    SPARK_GRAFT_CPUS=2 SPARK_PERIODIC_GC=2min \
    SPARK_GRAFT_LOCAL_DIR="/tmp/graft_spill/retry_$name" \
    nohup tools/band_run.sh graft.lab.FailedRetry /root/testdata/sf0.1 160 \
      /tmp/graft_band "$name" "$to" "$part" "$nparts" \
      /root/repo/data/band/models/gru4.json \
      /root/repo/data/band/campaign_x160_c2.cp /tmp/graft_retry_pool \
      >> "$LOGD/retry_$name.log" 2>&1 &
  echo "$(date -Is) launched retry_$name timeout=$to part=$part/$nparts mem=${memg}g pid=$!" \
    >> "$LOGD/babysit.log"
}

while true; do
  # s78/s79: fresh seeds added ~50 min in — the 6.2 records/min fleet
  # pace was set to miss the n≈15.7k re-score checkpoint by ~300
  for s in 65 66 69 70 71 72 73; do
    stream_running "$s" 32 256 || launch_stream "$s" 8 32 256
  done
  for s in 74 75; do
    stream_running "$s" 96 280 || launch_stream "$s" 10 96 280 \
      GRAFT_TAIL_TIMEOUT=620
  done
  for s in 76 77; do
    stream_running "$s" 150 362 || launch_stream "$s" 10 150 362 \
      GRAFT_TAIL_TIMEOUT=800 GRAFT_TAIL_EPISODE_CAP=16
  done
  # 12g: the retry pool is ALL monster queries — the first 10g JVM lost
  # its SparkContext to a driver-side OOM five attempts in
  retry_running a || launch_retry a 12 800 0 1
  sleep 60
done
