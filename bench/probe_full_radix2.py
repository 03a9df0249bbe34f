"""Probe: RECURSIVE radix-2 DIT for the 8192² FULL packed channels' columns.

The half channel's radix-2 column (2×2048 kernel columns vs the einsum
chain) won −8.2% of the whole step at 8192² (PROBE_r5_half_radix2_8192).
The two packed FULL channels ride length-8192 einsum columns — twice the
length, twice the channels. The recursive DIT (pallas_fft.
_ifft1d_axis2_radix2: 8192 → 2×4096 → 4×2048 kernel columns, two butterfly
levels) may replace them. NOTE the r4 probe at 4096² (PROBE_r4_
column_radix2) compared DIT against the einsum at HALF this plane size and
lost +4.1% — this probe asks whether the trade flips at 8192² the way the
half channel's did.

Same-process A/B of the full production step, tiny-K ladders.

Run: timeout 1800 python bench/probe_full_radix2.py [--res 8192]
Writes bench/PROBE_r5_full_radix2_<res>.json.
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
    for name, flag in (("einsum_full_columns", False),
                       ("radix2_full_columns", True)):
        pf.COLUMN_RADIX2_KERNEL = flag
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
    pf.COLUMN_RADIX2_KERNEL = False

    rec = {"what": f"recursive radix-2 DIT for the FULL packed channels' "
                   f"length-{n} columns (4 kernel columns + 2 butterfly "
                   f"levels) vs einsum chain at {n}^2, full production "
                   f"step (half channel on its own radix-2 in both arms)",
           "res": n, "results": results}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"PROBE_{args.tag}_full_radix2_{n}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: v["ms_per_step"] for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
