#!/bin/bash
# Append a host-ceiling probe JSON line every INTERVAL seconds until DEADLINE.
# Evidence series for BASELINE.md: shows what 8->32 compute speedup the host
# allowed over the session (the scaling gate's physical ceiling). NOTE: probes
# taken while the dev session itself runs pytest/benches read low — the series
# bounds the ceiling from below; quiet-window bench attempts are the artifact.
set -u
cd /root/repo
DEADLINE=$(( $(date +%s) + ${1:-18000} ))
INTERVAL=${2:-240}
LOG=${3:-BENCH_PROBELOG_r3.jsonl}
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  P=$(timeout 120 python3 tools/host_probe.py 2>/dev/null)
  [ -n "$P" ] && echo "{\"t\": \"$(date -u +%FT%TZ)\", \"probe\": $P}" >> "$LOG"
  sleep "$INTERVAL"
done
