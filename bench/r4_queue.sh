#!/bin/bash
# Canary-gated hardware-evidence queue (round 4).
#
# The tunnel has multi-hour outage windows (BASELINE.md r2/r3 operational
# notes); this runner gates every expensive job on bench.py's cheap canary
# child and sleeps through dead windows, so evidence lands unattended the
# moment the tunnel recovers. Each job logs to /tmp/r4_<name>.log and its
# artifact is written by the job itself (SERVE_TPU_r4.json, SOAK_r4.json,
# TRACE_r4_dist_4096.json, FAMILY_r4.jsonl).
cd "$(dirname "$0")/.." || exit 1

wait_tunnel() {
  local n=0
  while true; do
    if timeout 300 python bench.py --child canary 2>/dev/null | grep -q '"ok": true'; then
      echo "# $(date +%T) canary ok" >&2
      return 0
    fi
    n=$((n + 1))
    echo "# $(date +%T) tunnel dead (probe $n); sleeping 180" >&2
    sleep 180
  done
}

run_job() {
  local name=$1 to=$2
  shift 2
  wait_tunnel
  echo "# $(date +%T) starting $name: $*" >&2
  timeout "$to" "$@" >"/tmp/r4_${name}.log" 2>&1
  echo "# $(date +%T) $name rc=$?" >&2
}

run_job serve 2400 python bench/serve_tpu.py --res 1024 --steps 150
run_job soak 4500 python bench/soak.py --orchestrate
run_job trace4096 2400 python bench/trace_capture.py --dist --res 4096
run_job family 10800 python bench/family.py
echo "# $(date +%T) queue complete" >&2
