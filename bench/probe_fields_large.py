"""Probe: fused fields stencil kernel vs its XLA (jnp) twin at LARGE N.

Motivation (r4 session 3): the 8192² step trace shows the fused
normals+whitecap kernel at ~10.1 ms/step — ~4× its ~2.6 ms HBM floor —
because the VMEM budget forces r = 8-row blocks there, and the 8-aligned
halo DMAs then re-read 2×8 halo rows per 8-row body (3× input traffic) on
top of 1024 per-block fixed costs. At 1024² (r = 128) the same kernel sits
near floor. The cheap candidate fix is a size route to the jnp stencil
twin (fields.normals_stencil + whitecap_gpu — XLA fuses rolls into one
pass without an alignment-padded halo).

Methodology: device-profiler trace (hardware timestamps; the only
methodology valid at 8192² in deferral windows), K invocations of each
jitted variant, compare the dominant device-event totals.

Run: timeout 1800 python bench/probe_fields_large.py [--res 8192] [--k 8]
Writes bench/PROBE_r4_fields_large_<res>.json.
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


def _device_totals(out_dir):
    traces = sorted(glob.glob(os.path.join(out_dir, "plugins/profile/*/"
                                           "*.trace.json.gz")))
    if not traces:
        return None
    d = json.load(gzip.open(traces[-1]))
    ev = d.get("traceEvents", [])
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev_pids = {p for p, name in pids.items() if "TPU" in str(name)}
    occ = collections.defaultdict(list)
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            occ[e.get("name", "?")].append(e.get("dur", 0))
    return {k: {"n": len(v), "total_ms": round(sum(v) / 1e3, 4)}
            for k, v in occ.items()}


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpu_ocean.benchlib import enable_compile_cache
    enable_compile_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=8192)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--tag", type=str, default="r4")
    args = ap.parse_args()
    n = args.res

    from tpu_ocean.ops.fields_pallas import fields_pallas
    from tpu_ocean import fields

    texel = np.float32(1000.0 / n)
    key = jax.random.PRNGKey(0)
    kx, kh, kz = jax.random.split(key, 3)
    dx = jax.random.normal(kx, (n, n), jnp.float32)
    h = jax.random.normal(kh, (n, n), jnp.float32)
    dz = jax.random.normal(kz, (n, n), jnp.float32)

    fused = jax.jit(lambda a, b, c: fields_pallas(a, b, c, float(texel)))

    def _jnp_twin(a, b, c):
        normal = fields.normals_stencil(a, b, c, float(texel))
        foam, jac = fields.whitecap_gpu(a, c, normal)
        return normal, foam, jac

    twin = jax.jit(_jnp_twin)

    tiny = jax.jit(lambda s: s + 1.0)
    results = {}
    for name, fn in (("fused_pallas", fused), ("jnp_stencil", twin)):
        out = fn(dx, h, dz)          # compile + warm outside the window
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        tdir = f"/tmp/tpu_ocean_probe_fields_{name}_{n}"
        with jax.profiler.trace(tdir):
            for _ in range(args.k):
                out = fn(dx, h, dz)
            float(jax.device_get(tiny(jnp.float32(1.0))))   # force in-window
        occ = _device_totals(tdir)
        if occ is None:
            results[name] = {"ok": False, "error": "no trace"}
            continue
        # the OUTER jit_ program event is the per-call device time; inner
        # fusion/kernel events are sub-spans of it (summing everything
        # double-counts — caught on the first 8192 run)
        outer = [k for k, v in occ.items()
                 if k.startswith("jit_") and v["n"] >= args.k]
        outer_ms = (max(occ[k]["total_ms"] for k in outer) / args.k
                    if outer else None)
        top = dict(sorted(occ.items(), key=lambda kv: -kv[1]["total_ms"])[:6])
        results[name] = {"ok": outer_ms is not None,
                         "device_ms_per_call": round(outer_ms, 4)
                         if outer_ms else None,
                         "top_events": top}
        print(f"# {name}: {outer_ms:.3f} ms/call", file=sys.stderr)

    rec = {
        "what": f"fused fields kernel vs jnp stencil twin at {n}^2 "
                "(device-trace totals per call; r4 fields-cost probe)",
        "res": n, "k": args.k,
        "results": results,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"PROBE_{args.tag}_fields_large_{n}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({k: v.get("device_ms_per_call")
                      for k, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
