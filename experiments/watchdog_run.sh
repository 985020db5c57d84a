#!/bin/bash
# watchdog_run.sh DEADLINE_S FREEZE_S -- command [args...]
#
# Runs a (resumable) TPU workload under a freeze watchdog.  The axon relay's
# execution channel wedges unpredictably (measured r5: in-flight device calls
# hang forever while the client process sits at 0% CPU; fresh probe processes
# hang too; recovery is external, ~25-45 min).  A plain `timeout` wastes its
# whole budget on a frozen process; this wrapper instead:
#
#   * samples the cumulative CPU jiffies of the workload's process GROUP
#     every 30 s (scoped by setsid pgid — never pattern-matched);
#   * if the jiffy count hasn't advanced for FREEZE_S, kills the process
#     group (kill -TERM -PGID), waits for a fresh device probe to succeed,
#     and relaunches the command — workloads are resumable (sweep resumes
#     from results.json, training from orbax checkpoints) or idempotent;
#   * exits 0 the first time the command exits 0; exits 1 past DEADLINE_S.
set -uo pipefail
DEADLINE=$1; FREEZE=$2; shift 2
[ "$1" = "--" ] && shift
START=$(date +%s)

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; print(jax.devices(), float(jnp.ones(4).sum()))" 1>&2
}

group_jiffies() {  # cumulative utime+stime over the process group
  local pgid=$1 total=0 j
  for p in $(pgrep -g "$pgid" 2>/dev/null); do
    j=$(awk '{print $14 + $15}' "/proc/$p/stat" 2>/dev/null) || continue
    total=$((total + j))
  done
  echo "$total"
}

attempt=0
while true; do
  now=$(date +%s)
  if (( now - START > DEADLINE )); then
    echo "watchdog: deadline ${DEADLINE}s exceeded" >&2; exit 1
  fi
  attempt=$((attempt + 1))
  echo >&2 "watchdog: attempt $attempt: $* ($(date -u +%H:%M:%S))"
  setsid "$@" &
  child=$!
  pgid=$child
  last_j=-1; frozen_s=0; rc=""
  while true; do
    if ! kill -0 "$child" 2>/dev/null; then
      wait "$child"; rc=$?
      break
    fi
    sleep 30
    j=$(group_jiffies "$pgid")
    # Rate threshold, not equality: a process hung on an in-flight device
    # call still ticks a few jiffies/min in heartbeat threads (measured:
    # +1s CPU over 25 min).  Real work (training, eval, even a remote-
    # compile's host-side tracing) burns orders of magnitude more than
    # 5 jiffies (=50ms CPU) per 30s.
    if (( last_j >= 0 && j - last_j < 5 )); then
      frozen_s=$((frozen_s + 30))
    else
      frozen_s=0
    fi
    last_j=$j
    if (( frozen_s >= FREEZE )); then
      echo >&2 "watchdog: frozen ${frozen_s}s (jiffies $j); killing pgroup $pgid ($(date -u +%H:%M:%S))"
      kill -TERM -- "-$pgid" 2>/dev/null; sleep 10
      kill -KILL -- "-$pgid" 2>/dev/null
      wait "$child" 2>/dev/null
      rc="frozen"
      break
    fi
    now=$(date +%s)
    if (( now - START > DEADLINE )); then
      echo "watchdog: deadline during run; killing pgroup $pgid" >&2
      kill -TERM -- "-$pgid" 2>/dev/null; sleep 10
      kill -KILL -- "-$pgid" 2>/dev/null
      exit 1
    fi
  done
  if [ "$rc" = "0" ]; then
    echo >&2 "watchdog: command succeeded on attempt $attempt"
    exit 0
  fi
  echo >&2 "watchdog: rc=$rc; waiting for live tunnel before retry ($(date -u +%H:%M:%S))"
  until probe; do
    now=$(date +%s)
    if (( now - START > DEADLINE )); then
      echo "watchdog: deadline while waiting for tunnel" >&2; exit 1
    fi
    sleep 120
  done
done
