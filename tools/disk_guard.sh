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
            # kill-source attribution for the victim's shutdown hook
            # (round-15 advice): this guard only ever kills the OWNER of
            # the spill — i.e. the JVM whose own in-flight query caused
            # the pressure. FailedRetry's hook must KEEP its provisional
            # poison strike in that case (withdrawing would re-rank the
            # same spill monster to the top and loop kill/relaunch
            # forever), while a routine fleet_drain SIGTERM withdraws
            # it. The marker is the discriminator: touched before
            # SIGTERM, consumed by the hook; the gone-branch below (and
            # FailedRetry at startup) clears it if nothing consumed it.
            touch "${dir}.guardkill"
            kill "$pid" && echo "$(date -Is) SIGTERM $name pid=$pid" >> "$LOG"
            for _ in $(seq 1 12); do
              ps -p "$pid" --no-headers > /dev/null || break
              sleep 5
            done
            ps -p "$pid" --no-headers > /dev/null && kill -9 "$pid" \
              && echo "$(date -Is) SIGKILL $name pid=$pid" >> "$LOG" && sleep 5
          fi
          # post-kill verification (round-15 verdict #7): a SIGKILL'd
          # pid can linger in ps as a zombie (pending reap by the
          # launcher shell) or briefly in D-state while in-flight I/O
          # completes — r15 logged "survived SIGKILL?!" for exactly
          # that and orphaned the spill dir at 94%% disk. A zombie
          # holds no files, so state Z counts as GONE; a D/R state
          # gets a grace re-check before we concede.
          gone=0
          if [ -z "${pid:-}" ]; then
            gone=1
          else
            for _ in 1 2 3; do
              st=$(ps -p "$pid" -o stat= 2>/dev/null | tr -d ' ')
              case "$st" in
                "") gone=1; break ;;  # reaped: truly gone
                Z*) gone=1; break ;;  # zombie: dead, holds no fds
                *)  sleep 5 ;;        # D/R grace: SIGKILL lands late
              esac
            done
          fi
          if [ "$gone" -eq 1 ]; then
            rm -rf "$dir"
            # unconsumed marker (SIGKILL path: hooks never ran) must
            # not bias the relaunched worker's NEXT shutdown decision
            rm -f "${dir}.guardkill"
            echo "$(date -Is) removed $dir (owner $name gone)" >> "$LOG"
          else
            echo "$(date -Is) owner $name pid=$pid state=$st survived SIGKILL?! left $dir" >> "$LOG"
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
