#!/bin/bash
# Round-15 fleet: launcher AND babysitter in one (a babysit pass with
# nothing running IS the initial launch, so the layout lives in exactly
# one file — round-13 advice: the seed list below IS the layout; keep
# this header and the loop in sync when editing either). A stream that
# dies (heap OOM on a monster query, disk-guard SIGTERM, ENOSPC
# collateral) is relaunched from its incremental /tmp checkpoint; the
# persistent negative cache keeps a relaunched stream from re-paying
# the queries that killed it.
#
# Layout (125 GB box, ~138 GB Xmx nominal: 6x8g + 4x10g + 2x12g + 12g
# + 14g — round-14 verdict #8 retired s65 after four kernel OOM kills
# on the 16-JVM layout; round-15 verdict #9 retires s72 too (kill count
# ROSE to six at 15 JVMs while retry_b was resident — the relaunch
# churn costs more wall-clock than the eighth 32-256 s seat returns on
# a band that already holds 3000+ labels). The per-launch memory gate
# staggers real usage; RSS runs well under Xmx):
#   s66-s71  32-256 s band, 8g, 300 s timeout (resume r15 checkpoints).
#            s70 runs GRAFT_TAIL_EPS=0.08 (4x the default 2%%) — the
#            round-13 verdict's floor-side ε knob: keep the global
#            floor region sampled so the blind-spot rate stays
#            measurable as the ledger grows.
#   s74-s75  96-280 s band, 10g, 620 s timeout (resume)
#   s76-s77  150-362 s band, 10g, 800 s timeout (resume)
#   s80-s81  362-724 s band, 12g, 1500 s timeout — reference class 9
#            (362-724 s rounded). Protocol-identical
#            run-twice-keep-2nd; 1500 s admits labels to ~724 s
#            single-run. Resume r14 checkpoints.
#   retry_a  FailedRetry over the streams' timeout-censored pool at
#            800 s (pool snapshot dir /tmp/graft_retry_pool_r15_a =
#            32-256 .cp.failed + 32-256/96-280 eps; the DIR NAME is
#            stable across rounds — re-arm by refilling it from fresh
#            sidecars and deleting the .cp.done marker) — class 8
#   retry_b  FailedRetry at 1500 s over the DEEP-censored pool
#            (/tmp/graft_retry_pool_r15_b: s74-s77 .cp.failed +
#            150-362 eps + retry_a's re-censored list COPIED to a
#            non-retry_-prefixed name; same refill re-arm) —
#            already-paid class-9 candidates, single-run >~ 310-400 s.
#            (s80/s81 sidecars stay OUT of both pools: censored at
#            1500 s already, a 1500 s retry is a guaranteed re-censor.)
#   (s73 retired r13, funds retry_a; s78/s79 retired r14, fund
#    s80/s81; s65 retired r15, funds retry_b headroom; s72 retired
#    r16, funds the kill-trend goal — retired streams' checkpoints
#    were merged and stay merged)
#
# Memory gate (round-12 advice): the comment and the threshold agree,
# and the check runs PER LAUNCH — a mass die-off relaunches at most as
# many JVMs as current MemAvailable covers, not 16 against one reading.
set -u
cd /root/repo
LOGD=data/r16logs
mkdir -p "$LOGD"
CLASSES=${GRAFT_CLASSES_SNAPSHOT:-/tmp/graft_classes_r16}

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

launch_retry() { # name mem_gb timeout part nparts pooldir
  local name=$1 memg=$2 to=$3 part=$4 nparts=$5 pooldir=$6
  # .done marker = pool drained; refill the pool dir and delete the
  # marker to re-arm
  [ -f "/tmp/graft_band/retry_x160_c2_$name.cp.done" ] && return 0
  can_launch "$memg" || return 0
  # retry_b drains a deep pool at a much larger timeout than censored
  # it — smallest-estimate-first mints completable class-9 labels
  # before the true monsters burn 1500 s each
  local rank=desc
  [ "$name" = b ] && rank=asc
  env GRAFT_CLASSES="$CLASSES" SPARK_DRIVER_MEM="${memg}g" \
    GRAFT_RETRY_RANK="$rank" \
    SPARK_GRAFT_CPUS=2 SPARK_PERIODIC_GC=2min \
    SPARK_GRAFT_LOCAL_DIR="/tmp/graft_spill/retry_$name" \
    nohup tools/band_run.sh graft.lab.FailedRetry /root/testdata/sf0.1 160 \
      /tmp/graft_band "$name" "$to" "$part" "$nparts" \
      /root/repo/data/band/models/gru4.json \
      /root/repo/data/band/campaign_x160_c2.cp "$pooldir" \
      >> "$LOGD/retry_$name.log" 2>&1 &
  echo "$(date -Is) launched retry_$name timeout=$to part=$part/$nparts mem=${memg}g pid=$!" \
    >> "$LOGD/babysit.log"
}

while true; do
  for s in 66 67 68 69 71; do
    stream_running "$s" 32 256 || launch_stream "$s" 8 32 256
  done
  # s70: the ε floor-sampling stream (see header)
  stream_running 70 32 256 || launch_stream 70 8 32 256 GRAFT_TAIL_EPS=0.08
  for s in 74 75; do
    stream_running "$s" 96 280 || launch_stream "$s" 10 96 280 \
      GRAFT_TAIL_TIMEOUT=620
  done
  for s in 76 77; do
    stream_running "$s" 150 362 || launch_stream "$s" 10 150 362 \
      GRAFT_TAIL_TIMEOUT=800 GRAFT_TAIL_EPISODE_CAP=16
  done
  for s in 80 81; do
    stream_running "$s" 362 724 || launch_stream "$s" 12 362 724 \
      GRAFT_TAIL_TIMEOUT=1500 GRAFT_TAIL_EPISODE_CAP=16
  done
  # 12g: the retry pool is ALL monster queries — the first 10g JVM lost
  # its SparkContext to a driver-side OOM five attempts in (r13)
  retry_running a || launch_retry a 12 800 0 1 /tmp/graft_retry_pool_r15_a
  # 14g: the deep pool is the worst of the worst (800 s-censored)
  retry_running b || launch_retry b 14 1500 0 1 /tmp/graft_retry_pool_r15_b
  sleep 60
done
