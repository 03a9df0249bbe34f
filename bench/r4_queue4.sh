#!/bin/bash
# Phase-4 hardware-evidence queue (round 4, session 3) — the jobs this
# session ran (most already banked; re-running is safe, everything is
# resumable/tagged):
#   * 8192² device-trace pair: packed vs packed+half (the deferral-window-
#     proof methodology; TRACE_r4_{flagship,half}_8192.json)
#   * cascade C2R hardware pairs at 3×512² incl. LOD
#     (BENCH_evidence_r4_cascade_half.json)
#   * 100k-step soak of the EXACT headline switch set (SOAK_r4_half.json)
#   * fused-vs-jnp fields probe at 8192² (PROBE_r4_fields_large_8192.json)
#   * 8192² K-ladder family retry — only lands in a healthy (non-deferring)
#     window; the family sweep skips already-banked lines and nulls
#     correctly otherwise, so retries are free to spam
cd "$(dirname "$0")/.." || exit 1
. bench/queue_lib.sh

run_job trace8192half 1800 python bench/trace_capture.py --res 8192 --half --steps 6
run_job trace8192pack 1800 python bench/trace_capture.py --res 8192 --steps 6
run_job cascadehalf 1500 python bench/cascade_tpu.py --res 512 --bands 3 \
  --steps 64 --pack --half --fields
run_job cascadepack 1500 python bench/cascade_tpu.py --res 512 --bands 3 \
  --steps 64 --pack --fields
run_job cascadelodhalf 1500 python bench/cascade_tpu.py --res 512 --bands 3 \
  --steps 64 --pack --half --fields --lod
run_job soakhalf 1800 python bench/soak.py --steps 100000 --half \
  --out-dir /tmp/tpu_ocean_soak_half --orchestrate
run_job fieldsprobe 1800 python bench/probe_fields_large.py --res 8192 --k 8
run_job family8192retry 3600 python bench/family.py --res 8192
# session-3 additions: the tiny-K ladder cracked the deferral window —
# sustained 8192² pair landed (70.00 half / 73.64 packed) and the family
# now banks both lines via its --smallk third attempt (see above retry)
run_job smallk8192half 1800 python bench/probe_8192_smallk.py --half
run_job smallk8192pack 1800 python bench/probe_8192_smallk.py
run_job natcolprobe 2400 python bench/probe_half_nat_column.py --res 4096
run_job radix2probe 3600 python bench/probe_column_radix2.py --res 4096
run_job trace4096half 1800 python bench/trace_capture.py --res 4096 --half --steps 8
echo "# $(date +%T) queue4 complete" >&2
