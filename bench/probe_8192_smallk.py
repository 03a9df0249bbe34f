"""Probe: tiny-K ladder at 8192² — threading between the window's two traps.

In deferral windows, block forcing executes nothing (flat walls, gated
null) and the tinypull after a LARGE queued loop (the standard ladders top
out at K=512-1024 ≈ 39-78 s of queued work) hangs with the GIL held. But
the r4 traces proved that a tinypull after ~0.5 s of queued work executes
reliably in the SAME windows. This probe runs the K-ladder at ks=(2,8,32)
— max 2.4 s queued before any pull — with escalation OFF. Validity still
holds: intercept ≈ 27 ms ≪ 2×step, top/bottom wall ratio ≈ 14.

If valid, this is the sustained 8192² number the family sweep could not
capture in these windows (expected ≈ 70 ms for half from the trace pair +
the 9% standalone/sustained overlap gap).

Run: timeout 1800 python bench/probe_8192_smallk.py [--half]
Writes bench/PROBE_r4_8192_smallk[_half].json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax

    from tpu_ocean.benchlib import enable_compile_cache, time_steps_ladder
    enable_compile_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--half", action="store_true")
    ap.add_argument("--res", type=int, default=8192)
    ap.add_argument("--tag", type=str, default="r4")
    args = ap.parse_args()

    from tpu_ocean.config import OCEAN_DEMO
    from tpu_ocean.solver import OceanSolver

    cfg = OCEAN_DEMO.replace(resolution=args.res, length=float(args.res))
    solver = OceanSolver(cfg, fft_backend="pallas", real_state=True,
                         pallas_fields=True, pack_channels=True,
                         half_spectrum=args.half)
    state = solver.init(jax.random.PRNGKey(0))
    lad = time_steps_ladder(solver._step_impl, state, 1.0 / 60.0,
                            ks=(2, 8, 32), extra=solver._consts,
                            escalate=False, forcing="tinypull")
    rec = {
        "what": f"tiny-K ladder at {args.res}^2 "
                f"({'packed+half' if args.half else 'packed'}): ks=(2,8,32) "
                "keeps every queued burst <= ~2.4 s — the regime the r4 "
                "traces proved executes under tinypull even in windows "
                "where block defers and large-K pulls hang",
        "ms_per_step": round(lad.per_step_s * 1e3, 4),
        "suspect": bool(lad.suspect), "forcing": lad.forcing,
        "ladder_ks": list(lad.ks),
        "ladder_walls_s": [round(w, 5) for w in lad.walls_s],
        "fit_max_rel_resid": round(lad.max_rel_resid, 6),
        "intercept_ms": round(lad.intercept_s * 1e3, 2),
        "routed_backend": solver.fft_backend,
    }
    suffix = "_half" if args.half else ""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"PROBE_{args.tag}_8192_smallk{suffix}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    return 1 if lad.suspect else 0


if __name__ == "__main__":
    sys.exit(main())
