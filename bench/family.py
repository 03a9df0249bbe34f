"""Resolution-family sweep → bench/FAMILY_<tag>.jsonl (VERDICT r3 #9).

Runs bench.py once per (resolution, variant) with the KNOWN-GOOD backend per
resolution (VERDICT r3 #2: the r3 family walked the non-fused pallas pipeline
into the 8192² worker crash; the solver now auto-routes N ≥
PALLAS_PLAIN_ROUTE_N to the fused pipeline, and this sweep additionally never
asks for a config outside the measured-safe envelope).

Per resolution the sweep measures the production variant
(pallas + fused stencil fields + Hermitian packing) and, where the C2R
route applies (N % 16 == 0, ≥ 64 — all family members), the packed+half
variant that is the r4 flagship headline.

Resumable: lines already present in the output (matching res+backend label)
are skipped, so a mid-sweep tunnel outage costs only the unfinished tail —
the same policy as bench.py's own retry loop.

Run:  timeout 7200 python bench/family.py            # full family
      python bench/family.py --res 1024,4096         # subset
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)

#: per-resolution child wall budget (s): Mosaic compile + ladder execution
#: (≈ 1.2k steps × per-step) + tunnel startup; sized from the r3/r4 captures
#: (8192² ladder ≈ 90 s device time, compiles dominate below that).
_BUDGETS = {256: 600, 512: 600, 1024: 700, 2048: 800, 4096: 1000, 8192: 1400}


def _variants(res: int):
    """(label-suffix, extra bench.py flags) per resolution — known-good only."""
    out = [("pallas+fields+packed",
            ["--backend", "pallas", "--pallas-fields", "--pack-channels"])]
    if res % 16 == 0 and res >= 64:
        out.append(("pallas+fields+packed+half",
                    ["--backend", "pallas", "--pallas-fields",
                     "--pack-channels", "--half-spectrum"]))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=str, default="256,512,1024,2048,4096,8192")
    ap.add_argument("--tag", type=str, default="r4")
    ap.add_argument("--skip-half", action="store_true",
                    help="production variant only (halves the sweep time)")
    args = ap.parse_args()
    resolutions = [int(r) for r in args.res.split(",")]
    path = os.path.join(HERE, f"FAMILY_{args.tag}.jsonl")

    done = set()
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                if line.startswith("{"):
                    try:
                        r = json.loads(line)
                        if r.get("value") is not None:
                            done.add((r.get("res"), r.get("requested")))
                    except ValueError:
                        pass

    rc_all = 0
    for res in resolutions:
        for label, flags in _variants(res):
            if args.skip_half and label.endswith("+half"):
                continue
            if (res, label) in done:
                print(f"# skip {res}^2 {label}: already banked", flush=True)
                continue
            budget = _BUDGETS.get(res, 1200)
            base = [sys.executable, os.path.join(ROOT, "bench.py"),
                    "--res", str(res), "--budget-s", str(budget)] + flags
            # 8192² forcing (two probed failure modes on this tunnel, r4):
            # large-K tinypull can HANG with the GIL held (uncatchable
            # in-process — but the subprocess timeout below bounds it), and
            # block can be silently DEFERRED (flat walls → the gates null
            # the run). The tiny-K ladder under tinypull (bench.py
            # --smallk: ks=(2,8,32), every queued burst ≤ ~2.4 s) is the
            # one regime measured to execute in BOTH window types — it
            # landed every sustained 8192² number of record (70.00 half /
            # 73.64 packed) while block-first burned two nulled attempts
            # per variant in r4. smallk+tinypull is therefore the FIRST
            # attempt (VERDICT r4 #8); block is the fallback.
            attempts = ([base + ["--forcing", "tinypull", "--smallk"],
                         base + ["--forcing", "block"]]
                        if res >= 8192 else [base])
            t0 = time.time()
            rec = {"value": None, "error": "no attempt ran"}
            for cmd in attempts:
                print(f"# running: {' '.join(cmd[2:])}", flush=True)
                try:
                    p = subprocess.run(cmd, capture_output=True, text=True,
                                       timeout=budget + 300, cwd=ROOT)
                    lines = [l for l in p.stdout.splitlines()
                             if l.startswith("{")]
                    rec = json.loads(lines[-1]) if lines else {
                        "value": None,
                        "error": f"no output (rc={p.returncode})"}
                    if rec.get("value") is None:
                        # keep the per-backend failure lines for the
                        # post-mortem (lost in r4's first 8192² failure)
                        rec["stderr_tail"] = [
                            l for l in p.stderr.splitlines()[-12:]
                            if not l.startswith("WARNING")]
                except subprocess.TimeoutExpired:
                    rec = {"value": None, "error": "family child timeout"}
                if rec.get("value") is not None:
                    break
            rec["res"] = res
            rec["requested"] = label
            rec["wall_s"] = round(time.time() - t0, 1)
            with open(path, "a") as f:
                f.write(f"# running: --res {res} {label}\n")
                f.write(json.dumps(rec) + "\n")
            ok = rec.get("value") is not None
            print(f"# {res}^2 {label}: "
                  f"{'ok ' + str(rec.get('ms_per_step')) + ' ms' if ok else 'FAILED: ' + str(rec.get('error'))[:200]}",
                  flush=True)
            rc_all |= 0 if ok else 1
    return rc_all


if __name__ == "__main__":
    raise SystemExit(main())
