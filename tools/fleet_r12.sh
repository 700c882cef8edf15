#!/bin/bash
# Round-12 tail-stream fleet: 13 streams, fresh seeds 65-77 (disjoint
# generator sequences from rounds 10/11's 50-64 — per-seed /tmp
# checkpoints did not survive the round boundary, and replaying an old
# seed would walk paths whose in-band finds are already in `known`).
# Sizing is the round-11 lesson: 7g for the 32-256 s band, 10g for the
# wide bands, 2-core measurement budget each (SPARK_GRAFT_CPUS=2).
# Streams s76/s77 open reference class 8: band 150-362 s, timeout 400 s
# (a 300 s ceiling cannot label the 256-362 s half), episode cap 16
# (walking up into that band needs more paid intermediate steps).
set -u
cd /root/repo
LOGD=data/r12logs
mkdir -p "$LOGD"
launch() { # seed mem lo hi extra_env...
  local seed=$1 mem=$2 lo=$3 hi=$4; shift 4
  env "$@" GRAFT_CLASSES=/tmp/graft_classes_r12 SPARK_DRIVER_MEM="$mem" \
    SPARK_GRAFT_CPUS=2 \
    nohup tools/band_run.sh graft.lab.TailCampaign /root/testdata/sf0.1 160 \
      2147483647 /tmp/graft_band "$seed" "$lo" "$hi" \
      > "$LOGD/tail_s$seed.log" 2>&1 &
  echo "launched s$seed band [$lo,$hi] mem=$mem pid=$!"
}
for s in 65 66 67 68 69 70 71 72 73; do launch "$s" 7g 32 256; done
launch 74 10g 96 280
launch 75 10g 96 280
launch 76 10g 150 362 GRAFT_TAIL_TIMEOUT=400 GRAFT_TAIL_EPISODE_CAP=16
launch 77 10g 150 362 GRAFT_TAIL_TIMEOUT=400 GRAFT_TAIL_EPISODE_CAP=16
