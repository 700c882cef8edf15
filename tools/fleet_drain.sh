#!/bin/bash
# Drain the measurement fleet BEFORE cutting the end-of-round snapshot
# (round-13 verdict #6: the driver's post-snapshot bench must inherit
# an idle box, or BENCH_rN records fleet contamination — five rounds
# of that pattern now). Kills the babysitter first so nothing
# relaunches, then every campaign JVM (SIGTERM -> grace -> SIGKILL),
# then the guard, then clears spill roots and waits for load to settle.
#
# Kill mechanics: never pkill -f / pgrep -f — the pattern matches the
# calling shell's own cmdline and the shell kills itself (round-12
# gotcha). PIDs come from exact argv-token matches via ps+awk.
set -u
LOG=${1:-/root/repo/data/r16logs/drain.log}
note() { echo "$(date -Is) $*" | tee -a "$LOG"; }

campaign_pids() {
  ps -eo pid,args | awk '
    { for (i = 2; i <= NF; i++)
        if ($i == "graft.lab.TailCampaign" || $i == "graft.lab.FailedRetry")
          { print $1; next } }'
}
script_pids() { # basename
  ps -eo pid,args | awk -v b="$1" '
    { for (i = 2; i <= NF; i++) if ($i ~ ("(^|/)" b "$")) { print $1; next } }' \
    | grep -vw "$$" || true
}

note "drain: stopping babysitter + disk guard"
# babysit_*.sh also catches renamed one-off variants (e.g. a
# sweep-window copy under /tmp) — anything left alive here would
# relaunch the fleet right after the drain
for s in fleet_babysit.sh babysit_sweepwindow.sh disk_guard.sh; do
  for p in $(script_pids "$s"); do kill "$p" 2>/dev/null && note "  killed $s pid $p"; done
done

note "drain: SIGTERM campaign JVMs"
pids=$(campaign_pids)
[ -n "$pids" ] && kill $pids 2>/dev/null
for i in $(seq 1 30); do
  [ -z "$(campaign_pids)" ] && break
  sleep 2
done
left=$(campaign_pids)
if [ -n "$left" ]; then
  note "drain: SIGKILL stragglers: $left"
  kill -9 $left 2>/dev/null
  sleep 2
fi

note "drain: clearing spill roots"
rm -rf /tmp/graft_spill/* /tmp/blockmgr-* /tmp/spark-* 2>/dev/null
sync

note "drain: waiting for 1-min load < 2 (max 10 min)"
for i in $(seq 1 60); do
  load=$(awk '{print $1}' /proc/loadavg)
  awk -v l="$load" 'BEGIN { exit !(l < 2.0) }' && break
  sleep 10
done
note "drain complete: load $(cat /proc/loadavg | cut -d' ' -f1-3), $(df -h /tmp | awk 'NR==2 {print $5}') /tmp used, java procs: $(ps -C java --no-headers | wc -l)"
