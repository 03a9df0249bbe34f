"""Probe: radix-2 DIT for the 8192² HALF-channel column vs the einsum chain.

At N = 8192 the C2R-folded column length M = 4096 exceeds the kernel
envelope (MAX_PALLAS_N = 2048) and rides the einsum chain. A radix-2 DIT
over two M/2 = 2048 kernel columns fits (pallas_fft.HALF_COLUMN_RADIX2) —
a DIFFERENT trade than the r4 full-channel probe (there DIT competed with a
DIRECT kernel column and lost, bench/PROBE_r4_column_radix2.json; here the
alternative is the einsum intermediates' HBM traffic).

Same-process A/B of the full production step (pallas+fields+packed+half,
real_state), tiny-K ladders (the 8192² regime that executes reliably).

Run: timeout 1800 python bench/probe_half_radix2.py [--res 8192]
Writes bench/PROBE_r5_half_radix2_<res>.json.
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
    ap.add_argument("--res", type=int, default=8192)
    ap.add_argument("--tag", type=str, default="r5")
    args = ap.parse_args()
    n = args.res

    from tpu_ocean.config import OCEAN_DEMO
    from tpu_ocean.solver import OceanSolver
    from tpu_ocean.fft import pallas_fft as pf

    cfg = OCEAN_DEMO.replace(resolution=n, length=float(n))
    results = {}
    for name, flag in (("einsum_column", False), ("radix2_column", True)):
        pf.HALF_COLUMN_RADIX2 = flag
        solver = OceanSolver(cfg, fft_backend="pallas", real_state=True,
                             pallas_fields=True, pack_channels=True,
                             half_spectrum=True)
        state = solver.init(jax.random.PRNGKey(0))
        lad = time_steps_ladder(solver._step_impl, state, 1.0 / 60.0,
                                ks=(2, 8, 32), extra=solver._consts,
                                escalate=False, forcing="tinypull")
        results[name] = {
            "ms_per_step": round(lad.per_step_s * 1e3, 4),
            "suspect": bool(lad.suspect),
            "fit_max_rel_resid": round(lad.max_rel_resid, 5),
            "ladder_walls_s": [round(w, 4) for w in lad.walls_s],
        }
        print(f"# {name}: {results[name]}", file=sys.stderr, flush=True)
    pf.HALF_COLUMN_RADIX2 = False

    rec = {"what": f"radix-2 DIT half-channel column (2x{n // 4} kernel "
                   f"columns) vs einsum chain at {n}^2, full production "
                   f"step, same-process A/B tiny-K ladders",
           "res": n, "results": results}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"PROBE_{args.tag}_half_radix2_{n}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: v["ms_per_step"] for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
