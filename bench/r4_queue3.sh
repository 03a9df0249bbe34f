#!/bin/bash
# Phase-3 hardware-evidence queue (round 4) — the r4_queue2 jobs died at
# startup to the missing benchlib.enable_compile_cache (fixed a92b90f);
# re-run them plus the new sharded-half evidence:
#   * 8192² family lines (packed + the never-measured packed+half)
#   * full auto sweep at 1024² (now incl. pallas_fused+packed+half)
#   * per-kernel device trace of the half-spectrum headline
#   * dist_onechip --half at 1024²/4096² (D=1 shard_map of the mirror-
#     balanced C2R — the half route's program-structure overhead)
#   * labeled bfloat16 fast-mode capture (non-parity, docs/parity.md)
cd "$(dirname "$0")/.." || exit 1
. bench/queue_lib.sh

run_job family8192 7200 python bench/family.py --res 8192
run_job autosweep 2400 python bench.py --res 1024 --budget-s 2000
run_job tracehalf 1800 python bench/trace_capture.py --half
run_job dist1half 1200 python bench/dist_onechip.py --half
run_job dist1half4096 2400 python bench/dist_onechip.py --half --res 4096
run_job trace4096b 2400 python bench/trace_capture.py --dist --res 4096
run_job bf16 1200 python bench.py --res 1024 --backend pallas \
  --pallas-fields --pack-channels --half-spectrum --precision bfloat16
echo "# $(date +%T) queue3 complete" >&2
