"""Per-kernel microbenchmarks — FFT backends and the Gerstner kernel,
measured through benchlib's validity-checked scheme. One JSON line each.

    python bench/kernels.py [--res 1024] [--gerstner-res 512]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--gerstner-res", type=int, default=512)
    ap.add_argument("--waves", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tpu_ocean.benchlib import time_steps_meta
    from tpu_ocean.fft import get_ifft2

    n = args.res

    def mkc(key):
        k1, k2 = jax.random.split(key)
        return (jax.random.normal(k1, (5, n, n))
                + 1j * jax.random.normal(k2, (5, n, n))).astype(jnp.complex64)

    x = jax.block_until_ready(jax.jit(mkc)(jax.random.PRNGKey(0)))

    for backend in ("reference", "stockham", "matmul", "pallas"):
        try:
            ifft2 = get_ifft2(backend, n)
            # adapt to the (state, dt) stepper contract: state drifts by a
            # real dt each iteration so the loop body cannot be hoisted
            step = lambda st, dt: (st + (dt + 0j), ifft2(st))
            meta = time_steps_meta(step, x, 1e-6, k1=4, k2=32)
            print(json.dumps({
                "kernel": f"ifft2_{backend}", "n": n,
                "ms": round(meta.per_step_s * 1e3, 4),
                "forcing": meta.forcing, "suspect": meta.suspect}))
        except Exception as e:
            print(json.dumps({"kernel": f"ifft2_{backend}", "n": n,
                              "error": repr(e)[:120]}))
        sys.stdout.flush()

    # fused stencil kernel
    try:
        from tpu_ocean.ops.fields_pallas import fields_pallas
        key = jax.random.PRNGKey(1)
        ks = jax.random.split(key, 3)
        planes = [jax.random.normal(k, (n, n)) for k in ks]
        def fstep(st, dt):
            out = fields_pallas(st[0] + dt, st[1], st[2], 1.0)
            return (st[0] + dt, st[1], st[2]), out
        meta = time_steps_meta(fstep, tuple(planes), 1e-3, k1=4, k2=32)
        print(json.dumps({"kernel": "fields_pallas", "n": n,
                          "ms": round(meta.per_step_s * 1e3, 4),
                          "forcing": meta.forcing, "suspect": meta.suspect}))
    except Exception as e:
        print(json.dumps({"kernel": "fields_pallas", "error": repr(e)[:120]}))
    sys.stdout.flush()

    # Gerstner wave bank
    from tpu_ocean.gerstner import WaveBank, gerstner_eval
    from tpu_ocean.ops.gerstner_pallas import gerstner_pallas
    from tpu_ocean import grids
    import numpy as np

    g = args.gerstner_res
    bank = WaveBank.random(0, args.waves)
    gx, gz = grids.coordinate_grid(g, 1.0)
    gx = jnp.asarray(np.asarray(gx, np.float32))
    gz = jnp.asarray(np.asarray(gz, np.float32))
    for name, fn in (("gerstner_jnp", lambda t: gerstner_eval(
                          bank, gx, gz, t, "analytic")),
                     ("gerstner_pallas", lambda t: gerstner_pallas(
                          bank, gx, gz, t, "analytic"))):
        try:
            step = lambda t, dt: (t + dt, fn(t))
            meta = time_steps_meta(step, jnp.zeros((), jnp.float32), 1 / 60,
                                   k1=4, k2=32)
            print(json.dumps({
                "kernel": name, "n": g, "waves": args.waves,
                "ms": round(meta.per_step_s * 1e3, 4),
                "forcing": meta.forcing, "suspect": meta.suspect}))
        except Exception as e:
            print(json.dumps({"kernel": name, "error": repr(e)[:120]}))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
