"""Probe: VMEM-slimmed fields kernel variant — can r = 32 compile at 4096²?

Roadmap #17: the fused fields kernel is the one named lever left at large N
(1.92 ms of the 14.9 ms standalone 4096² step ≈ 3× its HBM floor; 10.1 ms
at 8192²) because the VMEM budget caps the row block at r = 16 (4096²) /
r = 8 (8192²), paying 2×/3× halo input traffic. The stock kernel at r = 32
measured ~17 MB and Mosaic rejects it (re-probed live this session).

This variant sheds VMEM two ways:
  * 4 outputs instead of 5 — ny never leaves the kernel; consumers derive
    it exactly as sqrt(1 − nx² − nz²) (the normal is unit and its y
    component is positive for a heightfield) — saves 2r double-buffered
    rows;
  * the normal accumulates EDGE BY EDGE in a fixed order (c1 += right×top,
    …) so at most 3 edge triples are live at once instead of 4 triples + 4
    cross products — a scheduling hint worth ~3-6r rows if Mosaic honors
    the shortened live ranges.

If r = 32 compiles, the probe trace-times stock-r16 vs slim-r32 per call.

Run: timeout 1800 python bench/probe_fields_vmem.py [--res 4096]
Writes bench/PROBE_r4_fields_vmem_<res>.json.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _slim_kernel(dx_hbm, h_hbm, dz_hbm,
                 nx_ref, nz_ref, foam_ref, jac_ref,
                 dx_s, h_s, dz_s, sem,
                 *, r, n, m, texel):
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tpu_ocean.ops.fields_pallas import HALO, _smoothstep01

    bi = pl.program_id(0)
    row0 = bi * r

    def load3(plane_hbm, scratch, s0, s1, s2):
        up = pl.multiple_of(jnp.mod(row0 - HALO, m), HALO)
        dn = pl.multiple_of(jnp.mod(row0 + r, m), HALO)
        c0 = pltpu.make_async_copy(plane_hbm.at[pl.ds(up, HALO)],
                                   scratch.at[pl.ds(0, HALO)], sem.at[s0])
        c1 = pltpu.make_async_copy(plane_hbm.at[pl.ds(row0, r)],
                                   scratch.at[pl.ds(HALO, r)], sem.at[s1])
        c2 = pltpu.make_async_copy(plane_hbm.at[pl.ds(dn, HALO)],
                                   scratch.at[pl.ds(HALO + r, HALO)],
                                   sem.at[s2])
        c0.start(); c1.start(); c2.start()
        return c0, c1, c2

    copies = (load3(dx_hbm, dx_s, 0, 1, 2)
              + load3(h_hbm, h_s, 3, 4, 5)
              + load3(dz_hbm, dz_s, 6, 7, 8))
    for c in copies:
        c.wait()

    dx = dx_s[:]
    h = h_s[:]
    dz = dz_s[:]

    def mid(a):
        return a[HALO:HALO + r, :]

    def xm(a):
        return a[HALO - 1:HALO - 1 + r, :]

    def xp(a):
        return a[HALO + 1:HALO + 1 + r, :]

    def zm(a):
        return pltpu.roll(mid(a), 1, 1)

    def zp(a):
        return pltpu.roll(mid(a), n - 1, 1)

    p = (mid(dx), mid(h), mid(dz))

    def edge(nb_dx, nb_h, nb_dz, ox, oz):
        return (nb_dx - p[0] + ox, nb_h - p[1], nb_dz - p[2] + oz)

    def cross_acc(acc, a, b):
        # accumulate a×b into the 3 running components (x, y, z)
        return (acc[0] + a[1] * b[2] - a[2] * b[1],
                acc[1] + a[2] * b[0] - a[0] * b[2],
                acc[2] + a[0] * b[1] - a[1] * b[0])

    # edge-by-edge accumulation: at any point ≤3 edge triples are live
    right = edge(xp(dx), xp(h), xp(dz), texel, 0.0)
    top = edge(zm(dx), zm(h), zm(dz), 0.0, -texel)
    acc = cross_acc((0.0, 0.0, 0.0), right, top)        # c1
    left = edge(xm(dx), xm(h), xm(dz), -texel, 0.0)
    acc = cross_acc(acc, top, left)                      # c2 — top dies here
    bottom = edge(zp(dx), zp(h), zp(dz), 0.0, texel)
    acc = cross_acc(acc, left, bottom)                   # c3 — left dies
    acc = cross_acc(acc, bottom, right)                  # c4
    nx, ny, nz = acc
    inv = lax.rsqrt(nx * nx + ny * ny + nz * nz)
    nx, nz = nx * inv, nz * inv                          # ny derived outside

    ddx_x = -0.5 * (xm(dx) - xp(dx)) / 8.0
    ddx_z = -0.5 * (xm(dz) - xp(dz)) / 8.0
    ddy_x = -0.5 * (zm(dx) - zp(dx)) / 8.0
    ddy_z = -0.5 * (zm(dz) - zp(dz)) / 8.0
    jac = (1.0 + ddx_x) * (1.0 + ddy_z) - ddx_z * ddy_x
    noise = 0.3 * jnp.sqrt(nx * nx + nz * nz)
    turb = jnp.maximum(1.0 - jac + noise, 0.0)

    nx_ref[:] = nx
    nz_ref[:] = nz
    foam_ref[:] = _smoothstep01(turb)
    jac_ref[:] = jac


def slim_fields(dx, h, dz, texel, r):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    m, n = h.shape
    kernel = functools.partial(_slim_kernel, r=r, n=n, m=m,
                               texel=np.float32(texel))
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    out_block = pl.BlockSpec((r, n), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM)
    nx, nz, foam, jac = pl.pallas_call(
        kernel, grid=(m // r,), in_specs=[hbm, hbm, hbm],
        out_specs=[out_block] * 4,
        out_shape=[jax.ShapeDtypeStruct((m, n), jnp.float32)] * 4,
        scratch_shapes=[pltpu.VMEM((r + 16, n), jnp.float32)] * 3
                       + [pltpu.SemaphoreType.DMA((9,))],
        cost_estimate=pl.CostEstimate(
            flops=int(60 * m * n), bytes_accessed=int(7 * m * n * 4),
            transcendentals=0),
        interpret=jax.default_backend() == "cpu",
    )(dx, h, dz)
    ny = jnp.sqrt(jnp.maximum(1.0 - nx * nx - nz * nz, 0.0))
    return nx, ny, nz, foam, jac


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tpu_ocean.benchlib import enable_compile_cache
    enable_compile_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=4096)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--tag", type=str, default="r4")
    args = ap.parse_args()
    n = args.res

    from tpu_ocean.ops.fields_pallas import fields_pallas

    texel = 1000.0 / n
    key = jax.random.PRNGKey(0)
    kx, kh, kz = jax.random.split(key, 3)
    # modest amplitudes so the unit-normal identity is well-conditioned
    dx = 0.1 * jax.random.normal(kx, (n, n), jnp.float32)
    h = 0.1 * jax.random.normal(kh, (n, n), jnp.float32)
    dz = 0.1 * jax.random.normal(kz, (n, n), jnp.float32)

    results = {}

    def stock_planes(a, b, c):
        normal, foam, jac = fields_pallas(a, b, c, texel)
        return (normal[..., 0], normal[..., 1], normal[..., 2], foam, jac)

    stock = jax.jit(stock_planes)

    candidates = [("stock_r_auto", stock)]
    for r in (32, 16):
        candidates.append((f"slim_r{r}", jax.jit(
            functools.partial(slim_fields, texel=texel, r=r))))

    import collections, glob, gzip
    tiny = jax.jit(lambda s: s + 1.0)
    ref_out = None
    for name, fn in candidates:
        try:
            out = fn(dx, h, dz)
            jax.block_until_ready(out[0])
        except Exception as e:
            results[name] = {"ok": False,
                             "error": f"{type(e).__name__}: {str(e)[:160]}"}
            print(f"# {name}: FAIL {type(e).__name__}", file=sys.stderr)
            continue
        if ref_out is None:
            ref_out = out
            err = 0.0
        else:
            err = max(float(jnp.max(jnp.abs(a - b)))
                      for a, b in zip(out, ref_out))
        tdir = f"/tmp/tpu_ocean_probe_fvmem_{name}_{n}"
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
              f"err={err:.2e}", file=sys.stderr)

    rec = {"what": f"VMEM-slimmed fields kernel (4 outputs, edge-by-edge "
                   f"accumulation) vs stock at {n}^2 — roadmap #17 probe",
           "res": n, "k": args.k, "results": results}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"PROBE_{args.tag}_fields_vmem_{n}.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps({kk: v.get("device_ms_per_call") or v.get("error")
                      for kk, v in results.items()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
