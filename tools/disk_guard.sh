#!/bin/bash
# Emergency disk guard for the tail-stream fleet: /tmp shares one disk
# with everything else, and a single 150-362 s-band query can spill
# tens of GB of temp_shuffle before its 400 s timeout cancels it
# (observed round 12: one stream's blockmgr at 36 GB with 11 GB free —
# an ENOSPC there corrupts every live stream's checkpoint write).
# Above the threshold, SIGTERM the JVM owning the LARGEST blockmgr dir
# over 15 GB (clean Spark shutdown deletes the dir; the stream's
# incremental checkpoint loses only the in-flight query) and log the
# kill so the operator relaunches the seed. Never touches anything
# below the threshold.
set -u
THRESH=${1:-85}
LOG=${2:-/root/repo/data/r12logs/disk_guard.log}
while true; do
  use=$(df /tmp | awk 'NR==2 {gsub("%",""); print $5}')
  if [ "$use" -ge "$THRESH" ]; then
    big=$(du -sb /tmp/blockmgr-* 2>/dev/null | sort -rn | head -1)
    sz=$(echo "$big" | awk '{print $1}')
    dir=$(echo "$big" | awk '{print $2}')
    if [ -n "$dir" ] && [ "$sz" -gt $((15 * 1024 * 1024 * 1024)) ]; then
      pid=$(lsof +D "$dir" 2>/dev/null | awk 'NR==2 {print $2}')
      echo "$(date -Is) use=${use}% dir=$dir size=$sz pid=${pid:-none}" >> "$LOG"
      if [ -n "${pid:-}" ]; then
        kill "$pid" && echo "$(date -Is) SIGTERM $pid" >> "$LOG"
        sleep 30
        ps -p "$pid" --no-headers > /dev/null && kill -9 "$pid" \
          && echo "$(date -Is) SIGKILL $pid" >> "$LOG"
        sleep 5
      fi
      rm -rf "$dir"
      echo "$(date -Is) removed $dir" >> "$LOG"
    fi
  fi
  sleep 60
done
