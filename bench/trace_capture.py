"""Device-profiler trace of the flagship step — §5.1 closed on hardware.

Rounds 1-2 probed `jax.profiler.trace` on the tunneled runtime and it hung;
re-probed in round 3 it WORKS (toolchain moved underneath us). This script
captures a real trace of the flagship 1024² step (pallas + fused fields +
packed + real_state), parses the Chrome-trace device track, and reports the
per-step DEVICE-EVENT duration — a timing source fully independent of
benchlib's K-ladder wall-clock differencing:

  * benchlib: host walls of one fori executable at several trip counts,
    slope-fitted (bench.py headline: 0.4176 ms/step).
  * here: the TPU profiler's own hardware-timestamped program events.

Agreement between the two is the strongest possible validation of the
timing methodology on this runtime. Writes bench/TRACE_r3_flagship_1024.json
and leaves the raw trace (xplane.pb + trace.json.gz) under --out for
TensorBoard. Run:  timeout 900 python bench/trace_capture.py
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp
    from tpu_ocean.config import OCEAN_DEMO
    from tpu_ocean.solver import OceanSolver

    out = (sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv
           else "/tmp/tpu_ocean_trace_r3")
    steps = 12
    cfg = OCEAN_DEMO  # 1024² flagship
    solver = OceanSolver(cfg, fft_backend="pallas", real_state=True,
                         pallas_fields=True, pack_channels=True)
    state = solver.init(jax.random.PRNGKey(0))
    step = jax.jit(solver._step_impl)
    dt = jnp.float32(1.0 / 60.0)

    # warm (compile outside the trace window)
    state, f = step(state, dt, solver._consts)
    jax.block_until_ready(f.height)

    tiny = jax.jit(lambda s: s + 1.0)
    with jax.profiler.trace(out):
        for _ in range(steps):
            state, f = step(state, dt, solver._consts)
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
    step_events = {k: v for k, v in occ.items() if "_step_impl" in k}
    durs = sorted(us for v in step_events.values() for us in v)
    result = {
        "ok": bool(durs),
        "what": "TPU profiler device-track durations of the flagship step "
                "(1024², pallas+fields+packed, real_state) — independent "
                "cross-check of the benchlib K-ladder headline",
        "steps_traced": steps,
        "device_step_events": len(durs),
        "device_ms_per_step_median": round(
            durs[len(durs) // 2] / 1e3, 4) if durs else None,
        "device_ms_per_step_min": round(durs[0] / 1e3, 4) if durs else None,
        "device_ms_per_step_max": round(durs[-1] / 1e3, 4) if durs else None,
        "benchlib_headline_ms": 0.4176,   # bench/BENCH_latest_validated.json
        "other_device_events": {
            k: {"n": len(v), "total_ms": round(sum(v) / 1e3, 4)}
            for k, v in sorted(occ.items()) if k not in step_events},
        "trace_dir": out,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "TRACE_r3_flagship_1024.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    return 0 if result["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
