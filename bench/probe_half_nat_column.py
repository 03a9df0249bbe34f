"""Probe: einsum vs fused-kernel COLUMN pass in the natural-regime half route.

The C2R fold halves the column length, so at 4096² the half channel's
column pass (M = 2048) fits the transposed-store kernel's VMEM envelope
while the full path's column (4096) cannot — the one place the fused
kernel gets back into the large-N game (pallas_fft.HALF_NAT_COLUMN_KERNEL).

A/B on the SAME process via the module toggle: ladder the full 4096²
packed+half step each way (benchlib fori + tinypull; consts as jit
ARGUMENTS). Banked reference: 13.8504 ms (einsum column, FAMILY_r4).

Run: timeout 2400 python bench/probe_half_nat_column.py [--res 4096]
Writes bench/PROBE_r4_half_nat_column.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

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
    for toggle in (True, False):
        pallas_fft.HALF_NAT_COLUMN_KERNEL = toggle
        solver = OceanSolver(cfg, fft_backend="pallas", real_state=True,
                             pallas_fields=True, pack_channels=True,
                             half_spectrum=True)
        state = solver.init(jax.random.PRNGKey(0))
        consts = solver._consts
        k = args.k
        lad = time_steps_ladder(solver._step_impl, state, 1.0 / 60.0,
                                ks=(max(2, k // 8), max(4, k // 2), k),
                                extra=consts, forcing="tinypull")
        name = "kernel_column" if toggle else "einsum_column"
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
        "what": f"natural-regime half-route column engine A/B at "
                f"{args.res}^2 (full packed+half step, same process)",
        "res": args.res,
        "results": results,
        "banked_einsum_reference_ms": 13.8504 if args.res == 4096 else None,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"PROBE_{args.tag}_half_nat_column.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: v["ms_per_step"] for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
