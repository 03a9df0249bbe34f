#!/bin/bash
# Phase-2 hardware-evidence queue (round 4) — run after r4_queue.sh:
#   * full auto sweep at 1024² (ranks the new pallas_fused+packed variant
#     against the packed/half pipelines on hardware, refreshes the ledger)
#   * per-kernel trace of the half-spectrum headline (where do its 0.397 ms
#     go — is the half channel's extra kernel launch the residual?)
#   * labeled bfloat16 fast-mode capture (non-parity variant, docs/parity.md)
cd "$(dirname "$0")/.." || exit 1
. bench/queue_lib.sh

run_job autosweep 2400 python bench.py --res 1024 --budget-s 2000
# re-capture with the outer-program-event fix (the first r4 capture pooled
# sub-fragments into the median)
run_job trace4096b 2400 python bench/trace_capture.py --dist --res 4096
run_job tracehalf 1800 python bench/trace_capture.py --half
run_job bf16 1200 python bench.py --res 1024 --backend pallas \
  --pallas-fields --pack-channels --half-spectrum --precision bfloat16
# retry the 8192² lines that died to the 560 s child cap (family skips
# banked successes; bench.py's large-N child cap is now 1200 s)
run_job family8192 7200 python bench/family.py --res 8192
echo "# $(date +%T) queue2 complete" >&2
