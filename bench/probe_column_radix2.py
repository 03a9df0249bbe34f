"""Probe: radix-2 DIT column engine for the FULL channels at large N.

COLUMN_RADIX2_KERNEL splits the length-N column DFT into two length-N/2
transposed-store kernel calls + one twiddle butterfly (pallas_fft.
_ifft1d_axis2_radix2) — the packed channels' version of the engine swap
that won 2.6% on the half channel (PROBE_r4_half_nat_column).

A/B in one process at the production 4096² switch sets:
  * packed (two full channels — the engine's whole surface), and
  * packed+half (two full + one half channel — the shipping config).

Run: timeout 3600 python bench/probe_column_radix2.py [--res 4096]
Writes bench/PROBE_r4_column_radix2.json.
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
    ap.add_argument("--res", type=int, default=4096)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--tag", type=str, default="r4")
    args = ap.parse_args()

    from tpu_ocean.config import OCEAN_DEMO
    from tpu_ocean.solver import OceanSolver
    from tpu_ocean.fft import pallas_fft

    cfg = OCEAN_DEMO.replace(resolution=args.res, length=float(args.res))
    results = {}
    for half in (False, True):
        for toggle in (True, False):
            pallas_fft.COLUMN_RADIX2_KERNEL = toggle
            solver = OceanSolver(cfg, fft_backend="pallas", real_state=True,
                                 pallas_fields=True, pack_channels=True,
                                 half_spectrum=half)
            state = solver.init(jax.random.PRNGKey(0))
            k = args.k
            lad = time_steps_ladder(solver._step_impl, state, 1.0 / 60.0,
                                    ks=(max(2, k // 8), max(4, k // 2), k),
                                    extra=solver._consts, forcing="tinypull")
            name = (("half+" if half else "packed+")
                    + ("radix2" if toggle else "einsum"))
            results[name] = {
                "ms_per_step": round(lad.per_step_s * 1e3, 4),
                "suspect": lad.suspect, "forcing": lad.forcing,
                "ladder_ks": list(lad.ks),
                "ladder_walls_s": [round(w, 5) for w in lad.walls_s],
                "fit_max_rel_resid": round(lad.max_rel_resid, 6),
            }
            print(f"# {name}: {results[name]['ms_per_step']} ms/step "
                  f"(suspect={lad.suspect})", file=sys.stderr)

    rec = {
        "what": f"radix-2 DIT column engine A/B at {args.res}^2 "
                "(full packed step and packed+half, same process)",
        "res": args.res,
        "results": results,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"PROBE_{args.tag}_column_radix2.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: v["ms_per_step"] for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
