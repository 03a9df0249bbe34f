"""Device-profiler trace of the flagship (or sharded) step — §5.1 on hardware.

Rounds 1-2 probed `jax.profiler.trace` on the tunneled runtime and it hung;
re-probed in round 3 it WORKS (toolchain moved underneath us). This script
captures a real trace of the step (pallas + fused fields + packed +
real_state), parses the Chrome-trace device track, and reports the per-step
DEVICE-EVENT duration — a timing source fully independent of benchlib's
K-ladder wall-clock differencing:

  * benchlib: host walls of one fori executable at several trip counts,
    slope-fitted (bench.py headline).
  * here: the TPU profiler's own hardware-timestamped program events.

Agreement between the two is the strongest possible validation of the
timing methodology on this runtime.

Run:  timeout 900  python bench/trace_capture.py                 # flagship
      timeout 1800 python bench/trace_capture.py --dist --res 4096
Writes bench/TRACE_<tag>_<flagship|dist>_<res>.json and leaves the raw
trace (xplane.pb + trace.json.gz) under --out for TensorBoard.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tpu_ocean.config import OCEAN_DEMO

    from tpu_ocean.benchlib import enable_compile_cache
    enable_compile_cache()   # retries after outages skip Mosaic recompiles

    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--dist", action="store_true",
                    help="trace the DistributedOceanSolver shard_map step "
                         "at D=1 (VERDICT r3 #3: the sharded program had "
                         "never been profiled)")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--half", action="store_true",
                    help="trace the half-spectrum (C2R) headline variant — "
                         "per-kernel budget of the 0.397 ms r4 flagship")
    ap.add_argument("--tag", type=str, default="r4")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    kind = ("dist_half" if (args.dist and args.half) else
            "dist" if args.dist else
            "half" if args.half else "flagship")
    out = args.out or f"/tmp/tpu_ocean_trace_{args.tag}_{kind}_{args.res}"

    cfg = OCEAN_DEMO.replace(resolution=args.res, length=float(args.res))
    if args.dist:
        from jax.sharding import Mesh
        from tpu_ocean.solver_dist import DistributedOceanSolver
        mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("shard",))
        solver = DistributedOceanSolver(cfg, mesh, fft_backend="pallas",
                                        real_state=True, pack_channels=True,
                                        pallas_fields=True,
                                        half_spectrum=args.half)
        extra = (solver._omega, solver._coeffs,
                 solver._pre_re, solver._pre_im,
                 solver._post_re, solver._post_im,
                 solver._x0, solver._z0)
        # consts as ARGUMENTS (CLAUDE.md hard rule: closed-over device
        # arrays are re-fetched at lowering — minutes over the tunnel) and
        # a jit name carrying 'step' so the device-track filter below can
        # find the program event (jit__sharded_step / jit__step_impl — a
        # lambda would trace as 'jit__lambda' and match nothing)
        step_fn = jax.jit(solver._sharded_step)
        step = lambda st, dt: step_fn(st, dt, *extra)
    else:
        from tpu_ocean.solver import OceanSolver
        solver = OceanSolver(cfg, fft_backend="pallas", real_state=True,
                             pallas_fields=True, pack_channels=True,
                             half_spectrum=args.half)
        consts = solver._consts
        step_fn = jax.jit(solver._step_impl)
        step = lambda st, dt: step_fn(st, dt, consts)
    state = solver.init(jax.random.PRNGKey(0))
    dt = jnp.float32(1.0 / 60.0)

    # warm (compile outside the trace window)
    state, f = step(state, dt)
    jax.block_until_ready(f.height)

    tiny = jax.jit(lambda s: s + 1.0)
    with jax.profiler.trace(out):
        for _ in range(args.steps):
            state, f = step(state, dt)
        # tinypull INSIDE the window: the in-order queue guarantees every
        # dispatched step executed before the trace closes (benchlib's
        # demonstrated forcing mode on this runtime)
        float(jax.device_get(tiny(jnp.float32(1.0))))

    traces = sorted(glob.glob(os.path.join(out, "plugins/profile/*/"
                                           "*.trace.json.gz")))
    if not traces:
        print(json.dumps({"ok": False, "error": "no trace written"}))
        return 1
    d = json.load(gzip.open(traces[-1]))
    ev = d.get("traceEvents", [])
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, name in pids.items() if "TPU" in str(name)}
    occ = collections.defaultdict(list)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            occ[e.get("name", "?")].append(e.get("dur", 0))
    # the per-dispatch program event: jit_<fn> / ..._step_impl / shard_map.
    # Sub-fragments of the same program ('_step_local.2', ...) also carry
    # 'step' — pooling them with the outer event would publish a fragment
    # median as the step time (seen on the r4 dist capture: 3.08 ms pooled
    # vs the 16.4 ms program). Prefer the OUTER jit_ program event.
    step_events = {k: v for k, v in occ.items()
                   if "step" in k.lower() and len(v) >= args.steps // 2}

    def _med(v):
        s = sorted(v)
        return s[len(s) // 2]

    outer_names = [k for k in step_events if k.startswith("jit_")]
    outer = (max(outer_names or step_events or [None],
                 key=lambda k: _med(step_events[k])) if step_events
             else None)
    durs = sorted(step_events.get(outer, []))
    result = {
        "ok": bool(durs),
        "what": f"TPU profiler device-track durations of the {kind} step "
                f"({args.res}^2, pallas+fields+packed, real_state) — "
                "independent cross-check of the benchlib K-ladder",
        "steps_traced": args.steps,
        "step_event_names": sorted(step_events),
        "step_event_used": outer,
        "step_event_medians_ms": {k: round(_med(v) / 1e3, 4)
                                  for k, v in sorted(step_events.items())},
        "device_step_events": len(durs),
        "device_ms_per_step_median": round(
            durs[len(durs) // 2] / 1e3, 4) if durs else None,
        "device_ms_per_step_min": round(durs[0] / 1e3, 4) if durs else None,
        "device_ms_per_step_max": round(durs[-1] / 1e3, 4) if durs else None,
        "other_device_events": {
            k: {"n": len(v), "total_ms": round(sum(v) / 1e3, 4)}
            for k, v in sorted(occ.items()) if k not in step_events},
        "trace_dir": out,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"TRACE_{args.tag}_{kind}_{args.res}.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
