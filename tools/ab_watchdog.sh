#!/bin/bash
# Supervise tools/run_algo_ab.py against axon-tunnel RPC wedges.
#
# Failure mode (observed 3x on 2026-08-20): a tunnel hiccup or client
# collision leaves the trainer sleeping on a futex forever — process
# alive, 0 CPU, log_trainer.jsonl mtime frozen. The run is resumable
# (checkpoints every 500 steps), so the correct response is: kill the
# whole process group, let the chip-side session expire, re-probe the
# tunnel, restart. This loop automates that.
#
# Usage: nohup tools/ab_watchdog.sh > /tmp/ab_watchdog.log 2>&1 &
#        echo $! > /tmp/ab_watchdog.pid
# Liveness files it watches: results/r5/ab_*_s0/log_trainer.jsonl
# Done condition: results/r5/algo_ab_s0.json exists.
cd "$(dirname "$0")/.."
OUT=results/r5
STALE_SECS=${STALE_SECS:-270}
STEPS=${STEPS:-5000}
VALID_INTERVAL=${VALID_INTERVAL:-250}
DONE="$OUT/algo_ab_s0.json"

# A restart <60 s after killing a wedged client wedges again on its
# first RPC (chip-side session still held); give the first start the
# same courtesy as the inter-restart backoff when requested.
[ -n "$INITIAL_SLEEP" ] && { echo "[watchdog] initial sleep $INITIAL_SLEEP"; sleep "$INITIAL_SLEEP"; }

newest_mtime() {
  local t=0 f
  # /tmp/jaxcache entries count as liveness: a cold compile is silent in
  # the logs for minutes but lands cache files as sub-programs finish.
  for f in "$OUT"/ab_*_s0/log_trainer.jsonl /tmp/ab.log /tmp/jaxcache/*; do
    [ -f "$f" ] || continue
    local m
    m=$(stat -c %Y "$f")
    [ "$m" -gt "$t" ] && t=$m
  done
  echo "$t"
}

while [ ! -s "$DONE" ]; do
  echo "[watchdog $(date +%T)] starting run_algo_ab"
  setsid python tools/run_algo_ab.py --steps "$STEPS" \
    --valid-interval "$VALID_INTERVAL" \
    --save-interval "${SAVE_INTERVAL:-500}" --out "$OUT" \
    > /tmp/ab.log 2>&1 &
  AB=$!
  echo "$AB" > /tmp/ab.pid
  # monitor: finish, or freeze -> kill group and loop
  while kill -0 "$AB" 2>/dev/null; do
    sleep 60
    now=$(date +%s); last=$(newest_mtime)
    if [ $((now - last)) -gt "$STALE_SECS" ]; then
      echo "[watchdog $(date +%T)] FROZEN $((now - last))s — killing pg $AB"
      kill -- -"$AB" 2>/dev/null; sleep 5
      kill -9 -- -"$AB" 2>/dev/null
      break
    fi
  done
  wait "$AB" 2>/dev/null
  [ -s "$DONE" ] && break
  # Observed 2026-08-20: restarts ~30-60 s after killing a wedged client
  # wedge again on their first device RPC; a restart after a ~30 min gap
  # succeeded. The chip-side session of the dead client apparently holds
  # the single-client tunnel until it expires. No probe here either — a
  # probe is itself a client and can steal/extend the session.
  # Adaptive backoff: consecutive first-RPC parks mean the chip-side
  # session outlives our wait — double it (cap 15 min). Any run that
  # made step progress (log grew) resets to the base backoff.
  total_log=$(stat -c %s "$OUT"/ab_*_s0/log_trainer.jsonl 2>/dev/null | awk '{s+=$1} END {print s+0}')
  if [ "$total_log" -gt "${LAST_LOG_SIZE:-0}" ]; then
    CUR_BACKOFF=${BACKOFF_SECS:-300}
  else
    CUR_BACKOFF=$(( ${CUR_BACKOFF:-${BACKOFF_SECS:-300}} * 2 ))
    [ "$CUR_BACKOFF" -gt 900 ] && CUR_BACKOFF=900
  fi
  LAST_LOG_SIZE=$total_log
  echo "[watchdog $(date +%T)] backoff ${CUR_BACKOFF}s for chip-side session expiry"
  sleep "$CUR_BACKOFF"
done
echo "[watchdog $(date +%T)] DONE — $DONE exists"
