"""Per-stage cost breakdown of the ocean step — §5.1 observability.

`jax.profiler` device traces hang on the tunneled TPU runtime (probed —
docs/coverage.md §5.1), so this uses observe.stage_breakdown: stage-subset
programs timed with the validated K-ladder and differenced. Works on CPU
and on real TPU (where it uses tinypull forcing).

    python examples/profile_step.py [--res 256] [--backend pallas]
"""

from __future__ import annotations


# repo-root import bootstrap: these scripts run directly from a checkout
# (sys.path[0] is the script's own dir, not the repo root)
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--backend", type=str, default="pallas",
                    choices=["pallas", "pallas_fused"])
    ap.add_argument("--fields-kernel", action="store_true",
                    help="use the fused stencil kernel (pallas_fields)")
    args = ap.parse_args()

    import jax
    from tpu_ocean.config import OCEAN_DEMO
    from tpu_ocean.solver import OceanSolver
    from tpu_ocean.observe import stage_breakdown

    cfg = OCEAN_DEMO.replace(resolution=args.res, length=float(args.res))
    solver = OceanSolver(cfg, fft_backend=args.backend, real_state=True,
                         pallas_fields=args.fields_kernel)
    state = solver.init(jax.random.PRNGKey(0))
    on_tpu = jax.default_backend() not in ("cpu",)
    bd = stage_breakdown(solver, state,
                         ks=(16, 128, 1024) if on_tpu else (4, 8, 16),
                         forcing="tinypull" if on_tpu else "auto")
    print(json.dumps(bd, indent=2))


if __name__ == "__main__":
    main()
