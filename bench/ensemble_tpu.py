"""Hardware throughput of the DP (ensemble) axis on one chip (D2).

tests/test_ensemble.py proves correctness (member-exact vs independent
solvers, DP×SP composition); this measures what batching BUYS: stepping B
independent patches in one jitted call amortizes per-pass fixed costs
(kernel launches, twiddle loads) across the batch, so per-member cost
falls below the single-patch step — the single-chip half of the DP story
(the cross-chip half is sharding the member axis, structurally free like
every other axis per the D=1 evidence).

Run: timeout 1500 python bench/ensemble_tpu.py [--res 512]
Writes bench/ENSEMBLE_TPU_<tag>.json.
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
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--sizes", type=str, default="1,2,4,8")
    ap.add_argument("--tag", type=str, default="r5")
    args = ap.parse_args()
    n = args.res

    from tpu_ocean.config import OCEAN_DEMO
    from tpu_ocean.ensemble import EnsembleOceanSolver
    from tpu_ocean.parallel import make_mesh

    cfg = OCEAN_DEMO.replace(resolution=n, length=float(n))
    mesh = make_mesh(batch=1)
    results = {}
    base_ms = None
    for b in (int(x) for x in args.sizes.split(",")):
        solver = EnsembleOceanSolver(cfg, mesh, ensemble_size=b,
                                     fft_backend="pallas", real_state=True,
                                     pallas_fields=True, pack_channels=True)
        state = solver.init(jax.random.PRNGKey(0))
        # benchlib drives the raw (non-donating) impl: the vmapped member
        # step with the replicated constants as the extra jit argument
        vstep = jax.vmap(solver._inner._step_impl, in_axes=(0, None, None))
        lad = time_steps_ladder(vstep, state, 1.0 / 60.0,
                                ks=(8, 64, 512),
                                extra=solver._inner._consts,
                                forcing="tinypull")
        ms = lad.per_step_s * 1e3
        if base_ms is None:
            base_ms = ms
        results[str(b)] = {
            "ms_per_step": round(ms, 4),
            "ms_per_member": round(ms / b, 4),
            "batching_efficiency": round(b * base_ms / ms, 3),
            "suspect": bool(lad.suspect),
            "fit_max_rel_resid": round(lad.max_rel_resid, 5),
        }
        print(f"# B={b}: {results[str(b)]}", file=sys.stderr, flush=True)

    rec = {"what": f"DP/ensemble batching on ONE chip at {n}^2 "
                   f"(pallas+fields+packed, real_state): per-member cost "
                   f"vs batch size — the amortization DP buys before any "
                   f"cross-chip sharding",
           "res": n, "results": results}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"ENSEMBLE_TPU_{args.tag}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: v["ms_per_member"] for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
