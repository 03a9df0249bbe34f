"""Time the DISTRIBUTED (shard_map) real-state program on ONE real chip.

What this proves (VERDICT r3 #3's payoff): the multi-chip program family —
shard_map step, plane-based a2a decomposition, real-state pytree — is
TIMEABLE on complex-hostile runtimes with the same rigor as the single-chip
flagship (benchlib K-ladder + tinypull forcing + validity gates). At D=1
every collective is elided by XLA (axis size 1), so

    per_step(distributed, D=1) − per_step(single-chip flagship)

measures pure program-structure overhead of the sharded formulation: the
number config-5 projections must add to the compute column before any ICI
term. Writes bench/BENCH_evidence_r3_dist1.json.

Run on the session TPU:  timeout 900 python bench/dist_onechip.py
"""

from __future__ import annotations

import json
import os
import sys
import time

# runnable from anywhere (sys.path[0] is the script's dir, not the repo root)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import numpy as np
    import jax
    from jax.sharding import Mesh

    from tpu_ocean.config import OCEAN_DEMO
    from tpu_ocean.solver_dist import DistributedOceanSolver
    from tpu_ocean.benchlib import time_steps_ladder

    res = 1024
    cfg = OCEAN_DEMO.replace(resolution=res, length=float(res))
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("shard",))
    # same switch set as the flagship headline (pallas + fused stencil +
    # packed + real_state) so the delta isolates the shard_map structure
    solver = DistributedOceanSolver(cfg, mesh, fft_backend="pallas",
                                    real_state=True, pack_channels=True,
                                    pallas_fields=True)
    state = solver.init(jax.random.PRNGKey(0))

    extra = (solver._omega, solver._coeffs,
             solver._pre_re, solver._pre_im,
             solver._post_re, solver._post_im,
             solver._x0, solver._z0)

    def step_impl(st, dt, ex):
        return solver._sharded_step(st, dt, *ex)

    t0 = time.time()
    lad = time_steps_ladder(step_impl, state, 1.0 / 60.0, ks=(16, 128, 1024),
                            extra=extra, escalate=True, forcing="tinypull")
    out = {
        "what": "DistributedOceanSolver shard_map step on ONE chip (D=1, "
                "collectives elided): real_state + pallas + packed at "
                f"{res}^2 — program-structure overhead vs the single-chip "
                "flagship headline",
        "ms_per_step": round(lad.per_step_s * 1e3, 4),
        "updates_per_s": round(1.0 / lad.per_step_s, 1),
        "forcing": lad.forcing,
        "suspect": bool(lad.suspect),
        "ladder_ks": list(lad.ks),
        "ladder_walls_s": [round(w, 5) for w in lad.walls_s],
        "fit_max_rel_resid": round(lad.max_rel_resid, 4),
        "intercept_ms": round(lad.intercept_s * 1e3, 2),
        "wall_total_s": round(time.time() - t0, 1),
        "flagship_packed_ms_r3": 0.4176,    # bench/BENCH_latest_validated
    }
    out["overhead_ms_vs_flagship"] = round(
        out["ms_per_step"] - out["flagship_packed_ms_r3"], 4)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_evidence_r3_dist1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0 if not lad.suspect else 1


if __name__ == "__main__":
    raise SystemExit(main())
