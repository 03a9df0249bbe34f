"""Time the DISTRIBUTED (shard_map) real-state program on ONE real chip.

What this proves (VERDICT r3 #3's payoff, extended to config-5 scale in r4):
the multi-chip program family — shard_map step, plane-based a2a
decomposition, real-state pytree — is TIMEABLE on complex-hostile runtimes
with the same rigor as the single-chip flagship (benchlib K-ladder +
tinypull forcing + validity gates). At D=1 every collective is elided by
XLA (axis size 1), so

    per_step(distributed, D=1) − per_step(single-chip flagship)

measures pure program-structure overhead of the sharded formulation: the
number config-5 projections must add to the compute column before any ICI
term. At 1024² the local step rides the transposed-store Pallas regime; at
4096² (config 5's size) it rides a DIFFERENT code path — the natural-store
row kernel + einsum column — whose sharded overhead r3 left unmeasured.

Run on the session TPU:
    timeout 900  python bench/dist_onechip.py                # 1024² (r3)
    timeout 1800 python bench/dist_onechip.py --res 4096     # config-5 size
Writes bench/BENCH_evidence_r4_dist1[_<res>].json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable from anywhere (sys.path[0] is the script's dir, not the repo root)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: single-chip flagship-switch-set references to difference against
#: (bench/BENCH_latest_validated*.json; BASELINE.md r3/r4 family tables)
_FLAGSHIP_PACKED_MS = {1024: 0.4176, 2048: 2.093, 4096: 16.42}
_FLAGSHIP_HALF_MS = {1024: 0.3999, 2048: 1.7812, 4096: 13.8504}
#: ladder trip counts sized so the top rung stays ~10-20 s of device time
_KS = {1024: (16, 128, 1024), 2048: (8, 64, 512), 4096: (8, 64, 512),
       8192: (2, 8, 64)}


def main() -> int:
    import numpy as np
    import jax
    from jax.sharding import Mesh

    from tpu_ocean.config import OCEAN_DEMO
    from tpu_ocean.solver_dist import DistributedOceanSolver
    from tpu_ocean.benchlib import time_steps_ladder

    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--tag", type=str, default="r4")
    ap.add_argument("--half", action="store_true",
                    help="half-spectrum C2R route (mirror-balanced sharded "
                         "twin at D>1; at D=1 it reduces to the single-chip "
                         "route) — difference against the packed+half "
                         "flagship instead")
    args = ap.parse_args()
    res = args.res

    cfg = OCEAN_DEMO.replace(resolution=res, length=float(res))
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("shard",))
    # same switch set as the flagship headline (pallas + fused stencil +
    # packed + real_state) so the delta isolates the shard_map structure
    solver = DistributedOceanSolver(cfg, mesh, fft_backend="pallas",
                                    real_state=True, pack_channels=True,
                                    pallas_fields=True,
                                    half_spectrum=args.half)
    state = solver.init(jax.random.PRNGKey(0))

    extra = (solver._omega, solver._coeffs,
             solver._pre_re, solver._pre_im,
             solver._post_re, solver._post_im,
             solver._x0, solver._z0)

    def step_impl(st, dt, ex):
        return solver._sharded_step(st, dt, *ex)

    ks = _KS.get(res, (8, 64, 512))
    t0 = time.time()
    lad = time_steps_ladder(step_impl, state, 1.0 / 60.0, ks=ks,
                            extra=extra, escalate=True, forcing="tinypull")
    regime = ("transposed-store pallas" if res <= 2048
              else "natural-store row kernel + einsum column")
    out = {
        "what": "DistributedOceanSolver shard_map step on ONE chip (D=1, "
                "collectives elided): real_state + pallas + packed at "
                f"{res}^2 (local regime: {regime}) — program-structure "
                "overhead vs the single-chip flagship switch set",
        "res": res,
        "ms_per_step": round(lad.per_step_s * 1e3, 4),
        "updates_per_s": round(1.0 / lad.per_step_s, 1),
        "forcing": lad.forcing,
        "suspect": bool(lad.suspect),
        "ladder_ks": list(lad.ks),
        "ladder_walls_s": [round(w, 5) for w in lad.walls_s],
        "fit_max_rel_resid": round(lad.max_rel_resid, 4),
        "intercept_ms": round(lad.intercept_s * 1e3, 2),
        "wall_total_s": round(time.time() - t0, 1),
    }
    flag = (_FLAGSHIP_HALF_MS if args.half
            else _FLAGSHIP_PACKED_MS).get(res)
    out["variant"] = "packed+half" if args.half else "packed"
    if flag is not None:
        out["flagship_packed_ms"] = flag
        out["overhead_ms_vs_flagship"] = round(out["ms_per_step"] - flag, 4)
        out["overhead_pct"] = round(
            100.0 * (out["ms_per_step"] / flag - 1.0), 2)
    suffix = ("" if res == 1024 else f"_{res}") + (
        "_half" if args.half else "")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"BENCH_evidence_{args.tag}_dist1{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if not lad.suspect else 1


if __name__ == "__main__":
    raise SystemExit(main())
