#!/bin/bash
# Canary-gated hardware-evidence queue (round 4, phase 1).
#
# The tunnel has multi-hour outage windows (BASELINE.md r2/r3 operational
# notes); run_job gates every expensive job on bench.py's cheap canary
# child and sleeps through dead windows, so evidence lands unattended the
# moment the tunnel recovers. Each job logs to /tmp/r4_<name>.log and its
# artifact is written by the job itself (SERVE_TPU_r4.json, SOAK_r4.json,
# TRACE_r4_dist_4096.json, FAMILY_r4.jsonl).
cd "$(dirname "$0")/.." || exit 1
. bench/queue_lib.sh

run_job serve 2400 python bench/serve_tpu.py --res 1024 --steps 150
run_job soak 4500 python bench/soak.py --orchestrate
run_job trace4096 2400 python bench/trace_capture.py --dist --res 4096
run_job family 10800 python bench/family.py
echo "# $(date +%T) queue complete" >&2
