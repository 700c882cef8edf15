#!/bin/bash
# Emergency disk guard for the tail-stream fleet: /tmp shares one disk
# with everything else, and a single deep-band query can spill tens of
# GB of temp_shuffle before its timeout cancels it (observed round 12:
# one stream's blockmgr at 36 GB with 11 GB free — an ENOSPC there
# corrupts every live stream's checkpoint write).
#
# Round-13 hardening (round-12 advice): deletion requires ATTRIBUTION.
# Streams now spill under per-stream roots (/tmp/graft_spill/s<seed>,
# band_run.sh's SPARK_GRAFT_LOCAL_DIR), so the owner of the largest
# spill is identified from the TailCampaign cmdline (the seed is argv),
# not from lsof — a live Spark JVM does NOT hold its shuffle files open
# continuously, so "no open files" never justified "owner is dead".
#   * owner running  -> SIGTERM it (clean shutdown deletes its spill),
#                       escalate to SIGKILL, then clear its spill root;
#                       the babysitter relaunches from the incremental
#                       checkpoint.
#   * owner gone     -> the per-seed root is orphaned by construction;
#                       remove it.
#   * legacy /tmp/blockmgr-* (no per-seed attribution): removed ONLY
#     when zero TailCampaign/FailedRetry JVMs are running; otherwise
#     logged for the operator and left alone.
set -u
THRESH=${1:-85}
LOG=${2:-/root/repo/data/r13logs/disk_guard.log}
SPILL_ROOT=/tmp/graft_spill

# PID of the JVM owning spill dir $1, or empty: band_run.sh passes the
# per-stream root as -Dspark.local.dir=<dir>, so ownership is an EXACT
# argv token match on the dir itself — works for any campaign main
# class, and never pgrep -f (which would match this script's own shell).
owner_pid() {
  ps -eo pid,args | awk -v d="-Dspark.local.dir=$1" \
    '{ for (i = 2; i <= NF; i++) if ($i == d) { print $1; exit } }'
}

campaign_jvms() {
  ps -eo args | grep -c "graft\.lab\.\(TailCampaign\|FailedRetry\) " || true
}

while true; do
  use=$(df /tmp | awk 'NR==2 {gsub("%",""); print $5}')
  if [ "$use" -ge "$THRESH" ]; then
    # largest spill consumer: per-seed roots first, legacy dirs second
    big=$( (du -sb "$SPILL_ROOT"/* /tmp/blockmgr-* 2>/dev/null || true) \
          | sort -rn | head -1)
    sz=$(echo "$big" | awk '{print $1}')
    dir=$(echo "$big" | awk '{print $2}')
    # normally only a >15 GB runaway justifies killing a stream, but at
    # >=90% use the SUM of mid-size spills is the danger (observed: 94%
    # with the largest dir at 14 GB) — act on the largest regardless
    floor=$((15 * 1024 * 1024 * 1024))
    [ "$use" -ge 90 ] && floor=$((2 * 1024 * 1024 * 1024))
    if [ -n "$dir" ] && [ "${sz:-0}" -gt "$floor" ]; then
      echo "$(date -Is) use=${use}% dir=$dir size=$sz" >> "$LOG"
      case "$dir" in
        "$SPILL_ROOT"/*)
          name=${dir##*/}
          pid=$(owner_pid "$dir")
          if [ -n "${pid:-}" ]; then
            kill "$pid" && echo "$(date -Is) SIGTERM $name pid=$pid" >> "$LOG"
            for _ in $(seq 1 12); do
              ps -p "$pid" --no-headers > /dev/null || break
              sleep 5
            done
            ps -p "$pid" --no-headers > /dev/null && kill -9 "$pid" \
              && echo "$(date -Is) SIGKILL $name pid=$pid" >> "$LOG" && sleep 5
          fi
          # owner confirmed gone (killed above, or never running): the
          # per-stream root belongs to that stream alone — safe to clear
          if [ -z "${pid:-}" ] || ! ps -p "$pid" --no-headers > /dev/null; then
            rm -rf "$dir"
            echo "$(date -Is) removed $dir (owner $name gone)" >> "$LOG"
          else
            echo "$(date -Is) owner $name pid=$pid survived SIGKILL?! left $dir" >> "$LOG"
          fi
          ;;
        *)
          if [ "$(campaign_jvms)" -eq 0 ]; then
            rm -rf "$dir"
            echo "$(date -Is) removed legacy $dir (no campaign JVMs running)" >> "$LOG"
          else
            echo "$(date -Is) SKIP legacy $dir: unattributable while campaign JVMs run — operator action needed" >> "$LOG"
          fi
          ;;
      esac
    fi
  fi
  sleep 60
done
