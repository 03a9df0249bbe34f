"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: heightfield grid-points per second per chip at 1024² (BASELINE.json),
full ocean step (spectrum assembly → batched 5-channel 2-D IFFT → normals →
whitecap foam) on the flagship OCEAN_DEMO configuration.

vs_baseline: the reference is an interactive Unity demo at 1024² textures
with an implied real-time (60 FPS) target (SURVEY.md §6; no published numbers
exist), i.e. 1024² × 60 ≈ 6.29e7 grid-points/s. vs_baseline = measured / that.

Usage: python bench.py [--res N] [--steps K] [--backend B|all]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

_METHOD = "dispatch"


def _time_steps(solver, state, dt, steps):
    # Differenced scan-of-K timing (tpu_ocean.benchlib): immune to async
    # runtimes that defer work past block_until_ready and to per-pull tunnel
    # latency. ``steps`` sets the larger scan length.
    from tpu_ocean.benchlib import time_steps_meta
    k2 = max(32, steps)
    # the solver's device-resident constants travel as a jit ARGUMENT —
    # closing over them would embed (numpy) or re-fetch (device) them
    meta = time_steps_meta(solver._step_impl, state, dt, k1=k2 // 8, k2=k2,
                           method=_METHOD, extra=solver._consts)
    return meta, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--backend", type=str, default="matmul",
                    help="fft backend or 'all' (pick fastest); default is the "
                         "known-fastest single backend — compiles are the "
                         "dominant cost on tunneled runtimes")
    ap.add_argument("--budget-s", type=float, default=420.0,
                    help="stop starting new backends past this wall budget")
    ap.add_argument("--method", type=str, default="dispatch",
                    choices=["dispatch", "loop"],
                    help="dispatch: cheap-compile chained dispatches; "
                         "loop: rigorous fori-loop + checksum pull")
    args = ap.parse_args()
    global _METHOD
    _METHOD = args.method

    import jax
    from tpu_ocean.config import OCEAN_DEMO
    from tpu_ocean.solver import OceanSolver

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    cfg = OCEAN_DEMO.replace(resolution=args.res, length=float(args.res))
    dt = 1.0 / 60.0

    backends = (["reference", "stockham", "matmul", "pallas", "pallas_fused"]
                if args.backend == "all" else [args.backend])
    best = None
    t_start = time.perf_counter()
    for backend in backends:
        if best is not None and time.perf_counter() - t_start > args.budget_s:
            print(f"# budget exceeded, skipping {backend}", file=sys.stderr)
            continue
        try:
            solver = OceanSolver(cfg, fft_backend=backend)
            state = solver.init(jax.random.PRNGKey(0))
            meta, _ = _time_steps(solver, state, dt, args.steps)
        except Exception as e:  # backend unavailable on this platform
            print(f"# backend {backend}: FAILED ({type(e).__name__}: {e})",
                  file=sys.stderr)
            continue
        step_s = meta.per_step_s
        print(f"# backend {backend}: {step_s * 1e3:.3f} ms/step "
              f"({1.0 / step_s:.1f} updates/s, forcing={meta.forcing}"
              f"{', TIMING SUSPECT' if meta.suspect else ''})",
              file=sys.stderr)
        if best is None or step_s < best[1].per_step_s:
            best = (backend, meta)

    if best is None:
        print(json.dumps({"metric": "grid-points/s/chip", "value": 0,
                          "unit": "gp/s", "vs_baseline": 0,
                          "error": "all backends failed"}))
        return 1

    backend, meta = best
    step_s = meta.per_step_s
    n = args.res
    gps = n * n / step_s
    baseline_gps = 1024 * 1024 * 60.0  # reference: 1024² @ 60 FPS implied
    # physics bound: the step touches ≥ ~30 f32 planes of HBM traffic
    # (state, spectra both directions, fields); an implied bandwidth beyond
    # any shipping chip means the runtime deferred work past our forcing
    implied_tbps = 30 * n * n * 4 / step_s / 1e12
    out = {
        "metric": f"heightfield grid-points/s/chip at {n}^2",
        "value": round(gps, 1),
        "unit": "gp/s",
        "vs_baseline": round(gps / baseline_gps, 3),
        "backend": backend,
        "ms_per_step": round(step_s * 1e3, 4),
        "updates_per_s": round(1.0 / step_s, 2),
        "forcing": meta.forcing,
        "implied_hbm_tbps": round(implied_tbps, 2),
    }
    if meta.suspect or implied_tbps > 8.0:
        out["timing_suspect"] = True   # validity self-check failed: treat
        # the value as an upper bound, not a measurement
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
