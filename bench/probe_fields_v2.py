"""Probe: halo-free fields kernel (fields_pallas_v2) vs stock on hardware.

Roadmap #17 / VERDICT r4 #2: the stock fused fields kernel runs ~3× above
its 0.62 ms HBM floor at 4096² (1.92 ms — r = 16 blocks pay a 16-row halo
DMA band per side, 2× input traffic, plus ~15 live edge-vector temps).
fields_pallas_v2 restructures it (see ops/fields_pallas.py section
comment): the 4-cross sum collapses to cross(right−left, top−bottom) — 6
difference planes instead of 12 edge components + 3 mids — and the halo
DMA is replaced by 2 XLA-gathered boundary rows per block riding a regular
BlockSpec pipeline.

Per-call device times come from hardware-timestamped profiler traces (the
r3+ method); correctness is checked against the stock kernel in-process.

Run: timeout 1800 python bench/probe_fields_v2.py [--res 4096]
Writes bench/PROBE_r5_fields_v2_<res>.json.
"""

from __future__ import annotations

import argparse
import collections
import functools
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from tpu_ocean.benchlib import enable_compile_cache
    enable_compile_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=4096)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--tag", type=str, default="r5")
    args = ap.parse_args()
    n = args.res

    from tpu_ocean.ops.fields_pallas import fields_pallas, fields_pallas_v2

    texel = 1000.0 / n
    key = jax.random.PRNGKey(0)
    kx, kh, kz = jax.random.split(key, 3)
    dx = 0.1 * jax.random.normal(kx, (n, n), jnp.float32)
    h = 0.1 * jax.random.normal(kh, (n, n), jnp.float32)
    dz = 0.1 * jax.random.normal(kz, (n, n), jnp.float32)

    def planes(fn):
        def run(a, b, c):
            normal, foam, jac = fn(a, b, c)
            return (normal[..., 0], normal[..., 1], normal[..., 2],
                    foam, jac)
        return jax.jit(run)

    candidates = [("stock_r_auto",
                   planes(lambda a, b, c: fields_pallas(a, b, c, texel)))]
    for r in (64, 32, 16, 8):
        if n % r == 0:
            candidates.append((f"v2_r{r}", planes(functools.partial(
                fields_pallas_v2, texel_size=texel, block_rows=r))))

    results = {}
    tiny = jax.jit(lambda s: s + 1.0)
    ref_out = None
    for name, fn in candidates:
        try:
            out = fn(dx, h, dz)
            jax.block_until_ready(out[0])
        except Exception as e:
            results[name] = {"ok": False,
                             "error": f"{type(e).__name__}: {str(e)[:200]}"}
            print(f"# {name}: FAIL {type(e).__name__}: {str(e)[:120]}",
                  file=sys.stderr, flush=True)
            continue
        if ref_out is None:
            ref_out = out
            err = 0.0
        else:
            err = max(float(jnp.max(jnp.abs(a - b)))
                      for a, b in zip(out, ref_out))
        tdir = f"/tmp/tpu_ocean_probe_fv2_{name}_{n}"
        with jax.profiler.trace(tdir):
            for _ in range(args.k):
                out = fn(dx, h, dz)
            float(jax.device_get(tiny(jnp.float32(1.0))))
        traces = sorted(glob.glob(os.path.join(
            tdir, "plugins/profile/*/*.trace.json.gz")))
        occ = collections.defaultdict(float)
        cnt = collections.defaultdict(int)
        if traces:
            d = json.load(gzip.open(traces[-1]))
            ev = d.get("traceEvents", [])
            pids = {e["pid"]: e["args"]["name"] for e in ev
                    if e.get("ph") == "M" and e.get("name") == "process_name"}
            dev = {p for p, nm in pids.items() if "TPU" in str(nm)}
            for e in ev:
                if e.get("ph") == "X" and e.get("pid") in dev:
                    occ[e["name"]] += e.get("dur", 0)
                    cnt[e["name"]] += 1
        outer = [kk for kk in occ if kk.startswith("jit_")
                 and cnt[kk] >= args.k]
        per_call = (max(occ[kk] for kk in outer) / 1e3 / args.k
                    if outer else None)
        results[name] = {"ok": True, "device_ms_per_call":
                         round(per_call, 4) if per_call else None,
                         "max_abs_err_vs_stock": round(err, 8)}
        print(f"# {name}: {per_call and round(per_call, 3)} ms/call "
              f"err={err:.2e}", file=sys.stderr, flush=True)

    rec = {"what": f"halo-free cross-identity fields kernel (v2) vs stock "
                   f"at {n}^2 — roadmap #17 / VERDICT r4 #2",
           "res": n, "k": args.k,
           "hbm_floor_ms": round(8 * n * n * 4 / 819e9 * 1e3, 3),
           "results": results}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"PROBE_{args.tag}_fields_v2_{n}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({kk: v.get("device_ms_per_call") or v.get("error")
                      for kk, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
