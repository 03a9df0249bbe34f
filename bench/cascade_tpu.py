"""TPU timing for the multi-band cascade step (D7) — real-state path.

The cascade solver's complex state cannot be timed on the tunneled runtime
(any complex64 op breaks forcing — CLAUDE.md), which is exactly why
CascadeSolver(real_state=True) exists: the banded step in pure f32 planes.
This script ladder-times the production 3-band cascade via benchlib's
validated fori+tinypull scheme and prints one JSON line per config.

    python bench/cascade_tpu.py [--res 512] [--bands 3] [--steps 64] [--pack]

Constants ride benchlib's ``extra`` pytree (device-resident jit ARGUMENTS —
closure constants embed in the program or re-fetch over the tunnel).
"""


# repo-root import bootstrap: these scripts run directly from a checkout
# (sys.path[0] is the script's own dir, not the repo root)
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--bands", type=int, default=3)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--pack", action="store_true")
    ap.add_argument("--half", action="store_true",
                    help="half-spectrum (C2R) route for every band's last "
                         "packed channel (one batched half transform over "
                         "the band axis; implies the --pack constraints)")
    ap.add_argument("--fields", action="store_true",
                    help="fused normals+whitecap stencil on the combine")
    ap.add_argument("--lod", action="store_true",
                    help="time the LOD schedule: one ladder per distinct "
                         "refresh subset, schedule-weighted average")
    ap.add_argument("--forcing", type=str, default="tinypull",
                help="benchlib forcing; tinypull is the demonstrated-safe default on the tunnel (auto pulls the heavy loop's own output, which can hang/poison)")
    args = ap.parse_args()

    import jax
    from tpu_ocean.cascade import CascadeSolver, default_cascade
    from tpu_ocean.benchlib import time_steps_ladder

    if not 1 <= args.bands <= 3:
        ap.error("--bands must be 1..3 (the production band set)")
    if args.steps < 16:
        ap.error("--steps must be ≥ 16 (a degenerate ladder cannot fit)")
    if args.half and not args.pack:
        ap.error("--half requires --pack (the C2R fold rides the last "
                 "PACKED channel)")
    lengths = (1000.0, 130.0, 17.0)[:args.bands]
    cfgs = default_cascade(n=args.res, lengths=lengths)

    if args.lod:
        return run_lod(args, cfgs)
    solver = CascadeSolver(cfgs, fft_backend="pallas", real_state=True,
                           pack_channels=args.pack,
                           pallas_fields=args.fields,
                           half_spectrum=args.half)
    state = solver.init(jax.random.PRNGKey(0))

    def step_impl(st, dt, ex):
        omega, coeffs, x0, z0 = ex
        return solver._step_impl_real(st, dt, omega, coeffs, x0, z0)

    extra = (solver._omega, solver._coeffs, solver._x0, solver._z0)
    k2 = args.steps
    lad = time_steps_ladder(step_impl, state, 1.0 / 60.0,
                            ks=(max(2, k2 // 8), max(4, k2 // 2), k2),
                            extra=extra, forcing=args.forcing)
    out = {
        "what": f"cascade {args.bands}x{args.res}^2 real_state"
                + ("+packed" if args.pack else "")
                + ("+half" if args.half else "")
                + ("+fields" if args.fields else ""),
        "ms_per_step": round(lad.per_step_s * 1e3, 4),
        "updates_per_s": round(1.0 / lad.per_step_s, 1),
        "suspect": lad.suspect,
        "forcing": lad.forcing,
        "ladder_ks": list(lad.ks),
        "ladder_walls_s": [round(w, 5) for w in lad.walls_s],
        "fit_max_rel_resid": round(lad.max_rel_resid, 6),
        "intercept_ms": round(lad.intercept_s * 1e3, 2),
    }
    print(json.dumps(out))
    return 1 if lad.suspect else 0


def run_lod(args, cfgs):
    """Per-subset ladders over the LOD schedule. Each distinct refresh
    subset is one compiled sub-step; the frame cost is the schedule-weighted
    average (the real run interleaves slots, but each slot's work is
    identical every time it occurs — the weighting IS the schedule)."""
    import jax
    from tpu_ocean.lod import LODCascadeSolver
    from tpu_ocean.benchlib import time_steps_ladder

    solver = LODCascadeSolver(cfgs, dt=1.0 / 60.0, fft_backend="pallas",
                              real_state=True, pack_channels=args.pack,
                              pallas_fields=args.fields,
                              half_spectrum=args.half)
    state = solver.init(jax.random.PRNGKey(0))
    extra = (solver.inner._omega, solver.inner._coeffs,
             solver.inner._x0, solver.inner._z0)
    k2 = args.steps

    per_subset = {}
    suspect = False
    for subset in sorted(set(solver._slots)):
        def step_impl(st, dt, ex, _subset=subset):
            cst, planes = st
            omega, coeffs, x0, z0 = ex
            cst, planes, fields = solver._substep_impl(
                _subset, cst, planes, dt, omega, coeffs, x0, z0)
            return (cst, planes), fields

        lad = time_steps_ladder(step_impl, (state.cascade, state.planes),
                                1.0 / 60.0,
                                ks=(max(2, k2 // 8), max(4, k2 // 2), k2),
                                extra=extra, forcing=args.forcing)
        per_subset[str(list(subset))] = {
            "ms": round(lad.per_step_s * 1e3, 4),
            "resid": round(lad.max_rel_resid, 6),
            "forcing": lad.forcing,
        }
        suspect |= lad.suspect

    weighted = sum(per_subset[str(list(s))]["ms"] for s in solver._slots)
    avg_ms = weighted / solver.schedule_len
    all_ms = per_subset[str(list(range(solver.inner.b)))]["ms"]
    out = {
        "what": f"LOD cascade {args.bands}x{args.res}^2 real_state"
                + ("+packed" if args.pack else "")
                + ("+half" if args.half else "")
                + ("+fields" if args.fields else ""),
        "periods": solver.periods,
        "avg_ms_per_frame": round(avg_ms, 4),
        "all_bands_ms": all_ms,
        "lod_speedup": round(all_ms / avg_ms, 3),
        "updates_per_s": round(1e3 / avg_ms, 1),
        "per_subset": per_subset,
        "suspect": suspect,
    }
    print(json.dumps(out))
    return 1 if suspect else 0


if __name__ == "__main__":
    sys.exit(main())
