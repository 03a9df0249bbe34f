"""Calibration ladder: can this runtime be wall-clock timed at all?

Times a chain of known-FLOP real-f32 matmuls (x <- tanh(x @ A), sequentially
dependent, nothing dead) inside ONE fori_loop executable, forced by pulling a
single f32 checksum (the known-good pull shape on the axon tunnel: real data,
generated on device). Sweeps K over a ladder and checks:

  1. monotonicity  — wall(K) strictly increases with K;
  2. linearity     — slope-fit residual small, intercept = dispatch constant;
  3. plausibility  — implied TFLOP/s is below the chip's physical peak.

If all three hold, walls DO scale with work and differenced timings from
tpu_ocean.benchlib are measurements, not artifacts.  Run:

    python bench/calibrate.py [--sizes 1024,2048,4096] [--ks 8,32,128,512]

Prints one JSON line per size plus a summary verdict line.
"""

from __future__ import annotations


# repo-root import bootstrap: these scripts run directly from a checkout
# (sys.path[0] is the script's own dir, not the repo root)
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys
import time

import numpy as np


def measure_size(n: int, ks: list[int], pull_timeout_s: int = 90,
                 peak_tflops: float = 400.0, forcing: str = "auto") -> dict:
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tpu_ocean.benchlib import _watchdog

    key = jax.random.PRNGKey(n)
    ka, kx = jax.random.split(key)
    # all data born ON DEVICE, all real f32 (the safe transfer/pull regime)
    a = jax.random.normal(ka, (n, n), jnp.float32) / np.float32(np.sqrt(n))
    x = jax.random.normal(kx, (n, n), jnp.float32)

    @jax.jit
    def chain(x, a, k):
        def body(_, x):
            return jnp.tanh(x @ a)   # tanh keeps magnitudes bounded; N² vs N³
        return jnp.sum(lax.fori_loop(0, k, body, x))

    # forcing modes (see benchlib.time_steps_ladder): 'tinypull' is the
    # demonstrated reliable one on the axon tunnel — the runtime executes
    # enqueued programs in order and block_until_ready alone executes
    # NOTHING, while pulling a heavy program's own output sometimes hangs
    # and poisons the process.
    forcing = {"mode": "pull" if forcing == "auto" else forcing}
    tiny = jax.jit(lambda s: s + 1.0)

    def run(k):
        acc = chain(x, a, jnp.int32(k))
        if forcing["mode"] == "tinypull":
            try:
                with _watchdog(pull_timeout_s):
                    float(jax.device_get(tiny(jnp.float32(k))))
                return None
            except Exception as e:
                print(f"# n={n} tinypull failed ({type(e).__name__}), "
                      f"demoting to block", file=sys.stderr)
                forcing["mode"] = "block"
        if forcing["mode"] == "pull":
            try:
                with _watchdog(pull_timeout_s):
                    val = float(jax.device_get(acc))
                return val
            except Exception as e:
                print(f"# n={n} pull failed ({type(e).__name__}), "
                      f"demoting to block", file=sys.stderr)
                forcing["mode"] = "block"
        jax.block_until_ready(acc)
        return None

    run(2)  # compile + warm + probe pull
    walls = {}
    for k in ks:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            run(k)
            best = min(best, time.perf_counter() - t0)
        walls[k] = best
        print(f"# n={n} k={k}: {best*1e3:.2f} ms (forcing={forcing['mode']})",
              file=sys.stderr)

    ks_arr = np.array(ks, float)
    ws = np.array([walls[k] for k in ks], float)
    monotone = bool(np.all(np.diff(ws) > 0))
    # least-squares wall = intercept + slope*K
    slope, intercept = np.polyfit(ks_arr, ws, 1)
    pred = intercept + slope * ks_arr
    # top-wall-normalized residual (see benchlib.time_steps_ladder)
    resid = float(np.max(np.abs(ws - pred)) / max(float(ws[-1]), 1e-12))
    flops_per_iter = 2.0 * n ** 3
    tflops = flops_per_iter / max(slope, 1e-12) / 1e12
    plausible = bool(0.0 < tflops < peak_tflops)
    # work must dominate the dispatch constant at the top rung, else the
    # slope is noise riding a flat line
    dominated = bool(ws[-1] > 3.0 * max(intercept, 1e-12))
    return {
        "n": n, "walls_s": {str(k): round(walls[k], 6) for k in ks},
        "forcing": forcing["mode"], "monotone": monotone,
        "slope_s_per_iter": float(slope), "intercept_s": float(intercept),
        "max_rel_resid": round(resid, 4),
        "achieved_tflops": round(float(tflops), 2),
        "plausible_vs_peak": plausible,
        "work_dominates_constant": dominated,
        "measurable": bool(monotone and plausible and dominated
                           and resid < 0.35),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=str, default="1024,2048,4096")
    ap.add_argument("--ks", type=str, default="",
                    help="override the per-size K ladder (comma list)")
    ap.add_argument("--peak-tflops", type=float, default=400.0,
                    help="physical upper bound for the chip (v5e bf16 peak "
                         "~197; generous 2x margin by default)")
    ap.add_argument("--forcing", type=str, default="tinypull",
                    choices=["tinypull", "block", "auto"],
                    help="execution forcing; tinypull is the demonstrated-"
                         "safe default on the tunnel ('auto' pulls the "
                         "heavy chain's own output, which can hang and "
                         "poison the process — the reason bench.py always "
                         "overrode this)")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    ks_fixed = ([int(s) for s in args.ks.split(",")] if args.ks else None)

    import jax
    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '?')}",
          file=sys.stderr)

    results = []
    for n in sizes:
        # K ladder sized so the top rung's WORK dwarfs the ~25 ms tunnel
        # dispatch constant (assume ≥10 TFLOP/s floor → top wall ≳ 1-2 s)
        if ks_fixed is not None:
            ks = ks_fixed
        else:
            top = max(64, int(6e13 / (2.0 * n ** 3)))
            ks = [max(1, top // 64), max(2, top // 8), top]
        try:
            r = measure_size(n, ks, peak_tflops=args.peak_tflops,
                             forcing=args.forcing)
        except Exception as e:
            r = {"n": n, "error": f"{type(e).__name__}: {e}"}
        results.append(r)
        print(json.dumps(r))

    ok = [r for r in results if r.get("measurable")]
    verdict = {
        "verdict": "measurable" if ok else "not_measurable",
        "sizes_measurable": [r["n"] for r in ok],
        "note": ("walls scale with K and implied TFLOP/s is physical; "
                 "differenced loop timings are trustworthy"
                 if ok else
                 "walls do not scale with work on this runtime; no timing "
                 "from it should be reported as a measurement"),
    }
    print(json.dumps(verdict))
    return 0


if __name__ == "__main__":
    sys.exit(main())
