"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: heightfield grid-points per second per chip at 1024² (BASELINE.json),
full ocean step (spectrum assembly → batched 5-channel 2-D IFFT → normals →
whitecap foam) on the flagship OCEAN_DEMO configuration.

vs_baseline: the reference is an interactive Unity demo at 1024² textures
with an implied real-time (60 FPS) target (SURVEY.md §6; no published numbers
exist), i.e. 1024² × 60 ≈ 6.29e7 grid-points/s. vs_baseline = measured / that.

Validity & process architecture (every piece below was forced by measured
axon-tunnel behavior; see tpu_ocean/benchlib.py):
  * Timing = fori-loop K-ladder in ONE executable, walls fitted with
    monotonicity / linearity / work-dominance checks; invalid ⇒ value null.
  * Forcing = 'tinypull' (device_get of a tiny independent scalar; the
    runtime executes enqueued programs in order, so the pull returns only
    after the loop ran). block_until_ready alone executes NOTHING there,
    and pulling a heavy program's own output can hang AND poison the
    process (all later device ops raise UNIMPLEMENTED).
  * Each measurement (calibration rung + every backend) therefore runs in
    its OWN subprocess — a poisoned/hung child is killed and reported
    without taking the artifact down.

Usage: python bench.py [--res N] [--steps K] [--backend B|auto|all]
                       [--method loop|dispatch] [--in-process]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REAL_BACKENDS = ("pallas", "pallas_fused")   # support real_state=True
#: the complex-free sweep measured by the realsweep child and --in-process:
#: (backend, pallas_fields, pack_channels). Parity-grade flagship first (the
#: headline must survive a killed tail — results stream); then the packed
#: variant (docs/parity.md ledger: Hermitian pairs share one FFT, 2 instead
#: of 3 transforms); the unfused-stencil comparison point last.
_REAL_SWEEP = (("pallas", True, False), ("pallas", True, True),
               ("pallas", False, False))


def _variant_label(backend: str, fields: bool, packed: bool) -> str:
    return backend + ("+fields" if fields else "") + ("+packed" if packed
                                                      else "")


def _measure_calibration() -> dict:
    """Known-FLOP rung: is this runtime wall-clock measurable right now?"""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "tpu_ocean_bench_calibrate",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench", "calibrate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    r = mod.measure_size(1024, [2048, 8192, 32768], forcing="tinypull")
    return {"measurable": bool(r["measurable"]),
            "achieved_tflops": r["achieved_tflops"],
            "intercept_ms": round(r["intercept_s"] * 1e3, 2),
            "forcing": r["forcing"]}


def _measure_backend(backend: str, res: int, steps: int,
                     method: str, pallas_fields: bool = False,
                     precision: str = "float32",
                     pack_channels: bool = False) -> dict:
    import jax
    from tpu_ocean.config import OCEAN_DEMO
    from tpu_ocean.solver import OceanSolver
    from tpu_ocean.benchlib import time_steps_ladder, time_steps_meta

    cfg = OCEAN_DEMO.replace(resolution=res, length=float(res),
                             precision=precision)
    solver = OceanSolver(cfg, fft_backend=backend,
                         real_state=backend in _REAL_BACKENDS,
                         pallas_fields=pallas_fields,
                         pack_channels=pack_channels)
    state = solver.init(jax.random.PRNGKey(0))
    dt = 1.0 / 60.0
    if method == "dispatch":
        m = time_steps_meta(solver._step_impl, state, dt, k1=steps // 8,
                            k2=max(32, steps), method="dispatch",
                            extra=solver._consts)
        return {"backend": backend, "per_step_s": m.per_step_s,
                "suspect": bool(m.suspect), "forcing": m.forcing}
    k = max(8, steps // 4)
    lad = time_steps_ladder(solver._step_impl, state, dt,
                            ks=(k, 8 * k, 64 * k), extra=solver._consts,
                            escalate=True, forcing="tinypull")
    return {"backend": backend, "per_step_s": lad.per_step_s,
            "suspect": bool(lad.suspect), "forcing": lad.forcing,
            "ladder_ks": lad.ks,
            "ladder_walls_s": [round(w, 5) for w in lad.walls_s],
            "fit_max_rel_resid": round(lad.max_rel_resid, 4),
            "intercept_ms": round(lad.intercept_s * 1e3, 2)}


def _run_child(task: str, args, timeout_s: float, fields: bool = False):
    """Run one measurement in a fresh interpreter; parse its JSON line."""
    cmd = [sys.executable, os.path.abspath(__file__), "--child", task,
           "--res", str(args.res), "--steps", str(args.steps),
           "--method", args.method, "--precision", args.precision]
    if fields or args.pallas_fields:
        cmd.append("--pallas-fields")
    if args.pack_channels:
        cmd.append("--pack-channels")
    try:
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout_s)
        out, rc = p.stdout, p.returncode
    except subprocess.TimeoutExpired as e:
        # harvest whatever the child streamed before the kill
        out = (e.stdout or b"")
        out = out.decode() if isinstance(out, bytes) else out
        rc = f"timeout after {timeout_s:.0f}s"
    results = [json.loads(line) for line in (out or "").splitlines()
               if line.startswith("{")]
    if task == "realsweep":
        if results:
            return {"sweep": results}
        return {"error": f"no result ({rc})", "task": task}
    if results:
        return results[-1]
    return {"error": f"no result ({rc})", "task": task}


# HBM plane model per backend: f32 [N,N] planes moved per step (state +
# spectra in/out per pass + fields). The fused backend skips the assembled-
# spectrum round trip (ops/fused_spectrum_fft docstring traffic table).
_PLANES = {"pallas_fused": 22, "default": 30}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--backend", type=str, default="auto",
                    help="fft backend, 'auto' (pallas±fused-stencil sweep in "
                         "one complex-free child, then matmul), or 'all'")
    ap.add_argument("--budget-s", type=float, default=420.0,
                    help="stop starting new backends past this wall budget")
    ap.add_argument("--method", type=str, default="loop",
                    choices=["loop", "dispatch"])
    ap.add_argument("--no-calibrate", action="store_true")
    ap.add_argument("--pallas-fields", action="store_true",
                    help="fused normals+whitecap stencil kernel")
    ap.add_argument("--pack-channels", action="store_true",
                    help="Hermitian channel packing, 2 FFTs for 3 fields "
                         "(parity-ledger switch — docs/parity.md)")
    ap.add_argument("--precision", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="MXU dot precision mode (bfloat16 = fast mode, "
                         "~4e-3 rel err — docs/parity.md ledger)")
    ap.add_argument("--in-process", action="store_true",
                    help="run measurements in this process (CPU/debug)")
    ap.add_argument("--child", type=str, default=None,
                    help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child is not None:
        if args.child == "calibrate":
            print(json.dumps(_measure_calibration()))
        elif args.child == "realsweep":
            # the complex-free variants in ONE process: they share the
            # tunnel startup cost, never pull their own outputs, and never
            # touch complex64 — the two measured poisoning triggers. Each
            # result STREAMS as its own JSON line so a parent that must
            # kill a hung tail still harvests the finished measurements.
            for backend, fields, packed in _REAL_SWEEP:
                label = _variant_label(backend, fields, packed)
                try:
                    r = _measure_backend(backend, args.res, args.steps,
                                         args.method, pallas_fields=fields,
                                         precision=args.precision,
                                         pack_channels=packed)
                    r["backend"] = label
                except Exception as e:
                    r = {"backend": label,
                         "error": f"{type(e).__name__}: {e}"}
                print(json.dumps(r), flush=True)
        else:
            print(json.dumps(_measure_backend(
                args.child, args.res, args.steps, args.method,
                pallas_fields=args.pallas_fields,
                precision=args.precision,
                pack_channels=args.pack_channels)))
        return 0

    if args.backend == "auto":
        # complex-free (real_state) backends first — one shared child (they
        # cannot poison each other); matmul (complex einsum) trails in its
        # own child for other platforms. pallas_fields (the fused stencil
        # twin, output-identical) measured 17% faster at 1024².
        backends = [("realsweep", False), ("matmul", False)]
    elif args.backend == "all":
        backends = [(b, False) for b in
                    ("reference", "stockham", "matmul", "pallas",
                     "pallas_fused")]
    else:
        backends = [(args.backend, args.pallas_fields)]

    # child budgets: the realsweep child pays one startup + three Mosaic
    # compile sets (~4 min healthy); single-backend children finish in
    # 60-150 s; a poisoned child hangs forever and gets killed
    def _in_process(t, f=False):
        if t == "calibrate":
            return _measure_calibration()
        if t == "realsweep":
            sweep = []
            for b, pf, pk in _REAL_SWEEP:
                r = _measure_backend(b, args.res, args.steps, args.method,
                                     pallas_fields=pf,
                                     precision=args.precision,
                                     pack_channels=pk)
                r["backend"] = _variant_label(b, pf, pk)
                sweep.append(r)
            return {"sweep": sweep}
        return _measure_backend(t, args.res, args.steps, args.method,
                                pallas_fields=f, precision=args.precision,
                                pack_channels=args.pack_channels)

    measure = ((lambda t, f=False: _run_child(
                    t, args,
                    {"realsweep": 560.0, "calibrate": 210.0}.get(t, 150.0),
                    fields=f))
               if not args.in_process else _in_process)

    t_start = time.perf_counter()
    best = None
    best_parity = None   # fastest valid PARITY-GRADE (non-packed) variant
    attempted = 0
    for backend, fields in backends:
        # the label must carry EVERY variant switch the child will apply
        # (--pack-channels rides _run_child's argv): a packed measurement
        # published under a bare backend name would masquerade as
        # parity-grade in the evidence artifacts
        label = (backend if backend == "realsweep"
                 else _variant_label(backend, fields, args.pack_channels))
        if (attempted > 0
                and time.perf_counter() - t_start > args.budget_s):
            print(f"# budget exceeded, skipping {label}", file=sys.stderr)
            continue
        attempted += 1
        res0 = measure(backend, fields)
        results = res0.get("sweep", [res0])
        for r in results:
            if "error" in r:
                print(f"# backend {r.get('backend', label)}: FAILED "
                      f"({r['error']})", file=sys.stderr)
                continue
            r.setdefault("backend", label)
            step_s = r["per_step_s"]
            print(f"# backend {r['backend']}: {step_s * 1e3:.3f} ms/step "
                  f"({1.0 / step_s:.1f} updates/s, forcing={r['forcing']}"
                  f"{', TIMING SUSPECT' if r['suspect'] else ''})",
                  file=sys.stderr)
            # a VALID result outranks any suspect one regardless of speed
            # (a deferred-work runtime can fake an arbitrarily small
            # suspect number); speed only breaks ties within a class
            if (best is None
                    or (not r["suspect"] and best["suspect"])
                    or (r["suspect"] == best["suspect"]
                        and step_s < best["per_step_s"])):
                best = r
            if ("+packed" not in r["backend"] and not r["suspect"]
                    and (best_parity is None
                         or step_s < best_parity["per_step_s"])):
                best_parity = r

    # calibration LAST: the headline ladder self-validates, so when the
    # tunnel is slow the budget is spent on the measurement, not the anchor
    calib = None
    if (not args.no_calibrate
            and time.perf_counter() - t_start < args.budget_s):
        calib = measure("calibrate")
        if "error" in calib and time.perf_counter() - t_start < args.budget_s:
            print(f"# calibration retry: {calib}", file=sys.stderr)
            calib = measure("calibrate")
        print(f"# calibration: {calib}", file=sys.stderr)

    if best is None:
        out = {"metric": "grid-points/s/chip", "value": None,
               "unit": "gp/s", "vs_baseline": None,
               "error": "all backends failed"}
        # the tunnel has multi-hour outages (every child times out cold);
        # a failed RUN is not a missing MEASUREMENT — point at the archived
        # validated evidence so the null is auditable, never substituted
        evidence = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "bench", "BENCH_evidence_r2_gauss_1024.json")
        try:
            with open(evidence) as f:
                out["last_validated"] = {"file": os.path.relpath(evidence),
                                         "result": json.load(f)}
        except Exception:
            pass
        print(json.dumps(out))
        return 1

    backend, step_s = best["backend"], best["per_step_s"]
    n = args.res
    gps = n * n / step_s
    baseline_gps = 1024 * 1024 * 60.0  # reference: 1024² @ 60 FPS implied
    planes = _PLANES.get(backend.split("+")[0], _PLANES["default"])
    implied_tbps = planes * n * n * 4 / step_s / 1e12
    # a calibration child that errored (slow tunnel startup) does not
    # invalidate a ladder that passed its own monotonicity/linearity/
    # physics checks; only an explicit measurable=False verdict does
    suspect = bool(best["suspect"] or implied_tbps > 8.0
                   or (calib is not None and "error" not in calib
                       and not calib.get("measurable")))
    out = {
        "metric": f"heightfield grid-points/s/chip at {n}^2",
        "value": None if suspect else round(gps, 1),
        "unit": "gp/s",
        "vs_baseline": None if suspect else round(gps / baseline_gps, 3),
        "backend": backend,
        "ms_per_step": None if suspect else round(step_s * 1e3, 4),
        "updates_per_s": None if suspect else round(1.0 / step_s, 2),
        "forcing": best["forcing"],
        "implied_hbm_tbps": round(implied_tbps, 2),
    }
    for key in ("ladder_ks", "ladder_walls_s", "fit_max_rel_resid",
                "intercept_ms"):
        if key in best:
            out[key] = best[key]
    if ("+packed" in backend and best_parity is not None
            and not suspect):
        # the headline rode the packed (parity-ledger) path: record the
        # strict-parity number alongside so both are defensible
        out["parity_grade_backend"] = best_parity["backend"]
        out["parity_grade_ms_per_step"] = round(
            best_parity["per_step_s"] * 1e3, 4)
    if calib is not None:
        out["calibration"] = calib
    if suspect:
        out["timing_suspect"] = True   # validity self-check failed: no number
        out["rejected_ms_per_step"] = round(step_s * 1e3, 4)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
