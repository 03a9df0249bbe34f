"""BASELINE.md config harness — runs the five working-baseline configs and
emits one JSON line per config (plus an optional BASELINE.md results table).

    python bench/run_baselines.py [--configs 1,2,3,4] [--append-md]

Configs (BASELINE.json):
  1. 64² heightfield, single step — allclose vs the float64 oracle (CPU).
  2. 256² full state × 100 steps — allclose vs oracle at the final time.
  3. 512² Gerstner pond, 16 waves — fused Pallas kernel throughput.
  4. 1024² single-chip ocean step, batched 5-spectra IFFT — updates/s.
  5. 4096² domain-decomposed ocean — single-chip throughput here (multi-host
     measurement needs a pod slice; the sharded path itself is exercised by
     the 8-device CPU-mesh tests and the driver's dryrun_multichip).

Parity configs run on CPU (float comparisons against the numpy oracle need
host pulls, and complex transfers over the axon tunnel are unreliable);
throughput configs run on whatever jax.default_backend() is.
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


def _emit(obj):
    print(json.dumps(obj))
    sys.stdout.flush()
    return obj


def _parity_case(n, steps, seed=0):
    from tpu_ocean.config import OceanConfig
    from tpu_ocean.oracle import Oracle
    from tpu_ocean.solver import OceanSolver
    import jax

    length = float(n)
    cfg = OceanConfig(resolution=n, length=length, unit_width=1.0,
                      wind=(8.0, 5.0), amplitude=0.05, choppiness=1.2,
                      dispersion_mode="quantized", evolution_mode="absolute",
                      spectrum_layout="centered", normals_mode="spectral",
                      seed=seed)
    rng = np.random.default_rng(seed)
    oracle = Oracle(cfg, rng=rng)
    solver = OceanSolver(cfg, fft_backend="reference")
    state = solver.init(h0=oracle.h0.astype(np.complex64),
                        h0_conj=oracle.h0_conj.astype(np.complex64))
    dt = 1.0 / 60.0
    for _ in range(steps):
        state, fields = solver.step(state, dt)
    jax.block_until_ready(fields.height)
    t = steps * dt / cfg.t_division
    ref = oracle.fields(t)
    errs = {}
    for name in ("height", "disp_x", "disp_z", "foam", "jacobian"):
        g = np.asarray(getattr(fields, name), dtype=np.float64)
        w = np.asarray(getattr(ref, name))
        errs[name] = float(np.max(np.abs(g - w))
                           / max(np.max(np.abs(w)), 1e-12))
    return errs


def config1():
    errs = _parity_case(64, steps=1)
    ok = max(errs.values()) < 1e-3
    return _emit({"config": 1, "desc": "64^2 single step vs oracle",
                  "max_rel_err": errs, "pass": ok})


def config2():
    errs = _parity_case(256, steps=100)
    ok = max(errs.values()) < 5e-3   # float32 accumulation over 100 steps
    return _emit({"config": 2, "desc": "256^2 x100 steps vs oracle",
                  "max_rel_err": errs, "pass": ok})


def config3():
    import jax
    from tpu_ocean.gerstner import WaveBank, gerstner_eval
    from tpu_ocean import grids
    import jax.numpy as jnp

    n, w = 512, 16
    bank = WaveBank.random(0, w)
    x, z = grids.coordinate_grid(n, 1.0)
    x = jnp.asarray(np.asarray(x, np.float32))
    z = jnp.asarray(np.asarray(z, np.float32))
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        from tpu_ocean.ops.gerstner_pallas import gerstner_pallas
        raw = lambda t: gerstner_pallas(bank, x, z, t, "analytic")
        kernel = "pallas"
    else:
        raw = lambda t: gerstner_eval(bank, x, z, t, "analytic")
        kernel = "jnp"
    # adapt t -> fields to the (state, dt) stepper shape for benchlib.
    # The gerstner program is all-real, so the rigorous tinypull ladder
    # works on the tunnel (benchlib forcing notes).
    from tpu_ocean.benchlib import time_steps_ladder
    step_impl = lambda t, dt: (t + dt, raw(t))
    lad = time_steps_ladder(step_impl, jnp.zeros((), jnp.float32), 1.0 / 60.0,
                            ks=(16, 128, 1024), forcing="tinypull")
    dt = lad.per_step_s
    gerstner = _emit({"config": 3,
                      "desc": f"512^2 Gerstner {w} waves ({kernel})",
                      "ms_per_eval": round(dt * 1e3, 4),
                      "updates_per_s": round(1 / dt, 1),
                      "grid_points_per_s": round(n * n / dt, 1),
                      "forcing": lad.forcing,
                      "timing_suspect": lad.suspect,
                      "fit_max_rel_resid": round(lad.max_rel_resid, 4),
                      # the >60 updates/s target is a TPU target; CPU is
                      # informational only
                      "pass": (1 / dt > 60 and not lad.suspect)
                              if on_tpu else None})

    # the sinusoid pond mode (C14, MistralWaterLib.cginc:127-152 — the
    # `_DISPLACEMENTMODE_WAVE` degenerate bank; jnp sheet, XLA-fused):
    # ladder-timed alongside so the pond family's BOTH modes carry a
    # current-toolchain number (VERDICT r4 #6)
    from tpu_ocean.gerstner import sinusoid_eval
    from tpu_ocean.config import PondConfig
    pcfg = PondConfig(amplitude=0.6, frequency=1.3, speed=1.1)
    sin_step = lambda t, dt2: (t + dt2, sinusoid_eval(pcfg, x, z, t))
    slad = time_steps_ladder(sin_step, jnp.zeros((), jnp.float32),
                             1.0 / 60.0, ks=(16, 128, 1024),
                             forcing="tinypull")
    sdt = slad.per_step_s
    sinusoid = _emit({"config": 3,
                      "desc": "512^2 sinusoid pond (jnp sheet)",
                      "ms_per_eval": round(sdt * 1e3, 4),
                      "updates_per_s": round(1 / sdt, 1),
                      "grid_points_per_s": round(n * n / sdt, 1),
                      "forcing": slad.forcing,
                      "timing_suspect": slad.suspect,
                      "fit_max_rel_resid": round(slad.max_rel_resid, 4),
                      "pass": (1 / sdt > 60 and not slad.suspect)
                              if on_tpu else None})
    # BOTH results flow to the exit-code aggregation and --append-md
    return [gerstner, sinusoid]


def _ocean_throughput(n, backend, steps=64):
    """(per_step_s, suspect) via the rigorous K-ladder. On TPU the solver
    rides the all-real plane pipeline (complex64 in the program breaks the
    tinypull forcing — CLAUDE.md hard rules); the requested ``backend``
    applies on CPU, where complex is fine and every backend is ladderable.
    Pre-r5 this used the dispatch+block wall-clock — the exact timing mode
    CLAUDE.md declares fake on the session TPU — and DISCARDED the suspect
    flag (review finding, r5)."""
    import jax
    from tpu_ocean.config import OCEAN_DEMO
    from tpu_ocean.solver import OceanSolver
    from tpu_ocean.benchlib import time_steps_ladder

    cfg = OCEAN_DEMO.replace(resolution=n, length=float(n))
    on_tpu = jax.default_backend() not in ("cpu",)
    if on_tpu:
        solver = OceanSolver(cfg, fft_backend="pallas", real_state=True,
                             pallas_fields=True, pack_channels=True)
    else:
        solver = OceanSolver(cfg, fft_backend=backend)
    state = solver.init(jax.random.PRNGKey(0))
    k = max(4, steps // 4)
    lad = time_steps_ladder(solver._step_impl, state, 1.0 / 60.0,
                            ks=(k, 4 * k, 16 * k), extra=solver._consts,
                            forcing="tinypull" if on_tpu else "auto")
    return lad.per_step_s, bool(lad.suspect)


def config4(backend="matmul"):
    dt, suspect = _ocean_throughput(1024, backend)
    return _emit({"config": 4, "desc": f"1024^2 ocean step "
                                       f"(ladder; requested {backend})",
                  "ms_per_step": round(dt * 1e3, 4),
                  "updates_per_s": round(1 / dt, 1),
                  "grid_points_per_s_chip": round(1024 * 1024 / dt, 1),
                  "timing_suspect": suspect,
                  # a suspect ladder can never publish a pass verdict
                  "pass": False if suspect else 1 / dt > 60})


def config5(backend="matmul"):
    import jax
    n = 4096
    if jax.default_backend() == "cpu":
        return _emit({"config": 5, "desc": "4096^2 (skipped on CPU)",
                      "pass": None})
    dt, suspect = _ocean_throughput(n, backend, steps=20)
    implied_tbps = 30 * n * n * 4 / dt / 1e12
    suspect = suspect or implied_tbps > 8.0
    return _emit({"config": 5,
                  "desc": f"4096^2 ocean step, single chip (ladder; "
                          "multi-host pending pod hardware)",
                  "ms_per_step": round(dt * 1e3, 4),
                  "updates_per_s": round(1 / dt, 1),
                  "grid_points_per_s_chip": round(n * n / dt, 1),
                  "implied_hbm_tbps": round(implied_tbps, 2),
                  "timing_suspect": suspect,
                  "pass": False if suspect else 1 / dt > 60})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=str, default="1,2,3,4,5")
    ap.add_argument("--backend", type=str, default="matmul")
    ap.add_argument("--append-md", action="store_true")
    args = ap.parse_args()

    import os
    import jax
    # honor an explicit JAX_PLATFORMS=cpu even where a device plugin
    # overrides the env var during registration (the axon tunnel does) —
    # configs 1-2 are CPU oracle-parity runs and are meaningless on a
    # device whose complex support is unreliable
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    print(f"# backend: {jax.default_backend()}", file=sys.stderr)
    wants_parity = {1, 2} & {int(x) for x in args.configs.split(",")}
    if wants_parity and jax.default_backend() != "cpu":
        print("# NOTE: configs 1-2 are CPU oracle-parity runs (host pulls "
              "of complex comparisons are unreliable over experimental TPU "
              "runtimes) — run them with JAX_PLATFORMS=cpu", file=sys.stderr)
    fns = {1: config1, 2: config2, 3: config3,
           4: lambda: config4(args.backend), 5: lambda: config5(args.backend)}
    results = []
    for c in (int(x) for x in args.configs.split(",")):
        try:
            r = fns[c]()
            results.extend(r if isinstance(r, list) else [r])
        except Exception as e:
            results.append(_emit({"config": c, "error": repr(e)[:200],
                                  "pass": False}))

    if args.append_md:
        import datetime
        md = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "BASELINE.md")
        with open(md, "a") as f:
            f.write(f"\n### Measured {datetime.date.today()} "
                    f"({jax.default_backend()})\n\n```json\n")
            for r in results:
                f.write(json.dumps(r) + "\n")
            f.write("```\n")
    return 0 if all(r.get("pass") is not False for r in results) else 1


if __name__ == "__main__":
    sys.exit(main())
