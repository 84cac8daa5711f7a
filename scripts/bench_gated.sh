#!/bin/bash
# Gated bench runner: poll host health (scripts/host_health.py replicates
# bench.py's membw probe) and launch the full bench only inside a healthy
# window; afterwards validate the run's OWN in-run membw record so a
# mid-run host degradation re-arms the loop. Writes one status line per
# attempt to bench_gate.log. Stops on the first run whose in-run probe is
# healthy, or after MAX_ATTEMPTS.
set -u
cd /root/repo
MAX_ATTEMPTS=${MAX_ATTEMPTS:-20}
MIN_GBPS=${MIN_GBPS:-95}
POLL_SECS=${POLL_SECS:-480}
for i in $(seq 1 "$MAX_ATTEMPTS"); do
  if python scripts/host_health.py --min-gbps "$MIN_GBPS" >> bench_gate.log 2>&1; then
    echo "attempt $i: healthy window, launching bench $(date -u +%H:%M:%S)" >> bench_gate.log
    python bench.py > bench_r5_stdout.json 2> bench_r5_stderr.log
    ok=$(python - <<'EOF'
import json
try:
    m = json.load(open("BENCH/QUERIES_r05.json"))["membw"]["gbps"]
    print("yes" if m["32"] >= m["8"] and m["32"] >= 95 else "no")
except Exception:
    print("no")
EOF
)
    echo "attempt $i: bench done, in-run membw healthy=$ok" >> bench_gate.log
    if [ "$ok" = "yes" ]; then
      echo "RUN_OF_RECORD_CAPTURED" >> bench_gate.log
      exit 0
    fi
  else
    echo "attempt $i: degraded, sleeping $(date -u +%H:%M:%S)" >> bench_gate.log
  fi
  sleep "$POLL_SECS"
done
echo "GATE_EXHAUSTED" >> bench_gate.log
exit 1
