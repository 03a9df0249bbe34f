"""Long-horizon hardware soak of the flagship step (VERDICT r3 #4).

The CPU suite pins a 400-step variance invariant; nothing had ever soaked
the REAL chip. This script runs 10⁴-10⁵ steps on device via chunked jitted
fori loops with per-chunk physics gates, plus a SIGKILL/resume bitwise
cross-check:

  gates (stats computed IN-JIT, pulled as one tiny all-real vector — the
  only safe pull pattern on this runtime, CLAUDE.md):
    * per chunk: energy/Hs/max|h| finite, zero NaN, foam_accum bounded in
      [0, 1] (foam_decay > 0 exercises the accumulator — the r2
      boundedness proof, now on hardware);
    * whole trajectory: energy = mean(h²) inside the calibrated beat
      envelope around the RUN MEAN (min > 0.2×mean, max < 3×mean) with no
      secular first-vs-last-quarter trend — the same invariant the CPU
      suite pins (tests/test_diagnostics.py
      test_phase_evolution_is_long_run_stable; beats of ±30% are physical,
      so chunk-0-relative drift gates would flag the physics).

  kill/resume (SURVEY §5.3-5.5 on hardware): --kill-after-chunk K
  checkpoints every chunk boundary (npz v2, all-real wire format) and
  SIGKILLs ITSELF (exact own PID) at boundary K; a --resume run restores
  and continues. Orchestrated by --orchestrate: an uninterrupted twin and
  a killed+resumed pair must reach BITWISE-identical final states (sha256
  over every state leaf).

Run on the session TPU:
    timeout 1800 python bench/soak.py --orchestrate          # full artifact
    timeout 900  python bench/soak.py --steps 20000          # soak only
Writes bench/SOAK_r4.json (or prints the child JSON line).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cfg(res: int):
    from tpu_ocean.config import OCEAN_DEMO
    # foam_decay > 0 so the accumulator path is exercised (bounded gate)
    return OCEAN_DEMO.replace(resolution=res, length=float(res),
                              foam_decay=0.5)


def _state_sha(state) -> str:
    import numpy as np
    import jax
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(state):
        h.update(np.asarray(jax.device_get(leaf)).tobytes())
    return h.hexdigest()


def run_soak(args) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import lax
    from tpu_ocean.solver import OceanSolver
    from tpu_ocean.checkpoint import save_checkpoint, load_checkpoint

    # honor an explicit CPU request (bench.py policy: the axon
    # sitecustomize re-points JAX at the tunnel during interpreter start;
    # only a post-import config update wins over it)
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_platforms", "cpu")
    from tpu_ocean.benchlib import enable_compile_cache
    enable_compile_cache()   # the orchestrator's 4 children share 1 compile

    cfg = _cfg(args.res)
    solver = OceanSolver(cfg, fft_backend="pallas", real_state=True,
                         pallas_fields=True, pack_channels=True,
                         half_spectrum=args.half)
    dt = np.float32(1.0 / 60.0)     # host scalar: embeds, never re-fetched
    ckpt = os.path.join(args.out_dir, "soak_ckpt.npz")
    start_chunk = 0
    if args.resume:
        state, _ = load_checkpoint(ckpt, real_state=True)
        state = jax.device_put(state)
        start_chunk = int(np.asarray(state.step)) // args.chunk
    else:
        state = solver.init(jax.random.PRNGKey(0))

    consts = solver._consts

    # consts enter as a jit ARGUMENT (CLAUDE.md hard rule: closed-over
    # device arrays are re-fetched over the tunnel at lowering)
    def chunk_fn(st, c):
        def body(_, s):
            return solver._step_impl(s, dt, c)[0]
        st = lax.fori_loop(0, args.chunk - 1, body, st)
        st, fields = solver._step_impl(st, dt, c)
        h = fields.height
        stats = jnp.stack([
            4.0 * jnp.std(h),                      # Hs
            jnp.mean(h * h),                       # energy
            jnp.max(jnp.abs(h)),                   # finiteness probe
            jnp.max(st.foam_accum),
            jnp.min(st.foam_accum),
            jnp.sum(jnp.isnan(h)).astype(jnp.float32),
        ])
        return st, stats

    chunk_jit = jax.jit(chunk_fn, donate_argnums=(0,))

    def run_chunk(st):
        return chunk_jit(st, consts)

    n_chunks = args.steps // args.chunk
    # per-chunk gates: finiteness, zero NaN, foam_accum bounded. The
    # energy/Hs stability gates are applied over the WHOLE trajectory at
    # the end, mirroring the calibrated CPU invariant
    # (tests/test_diagnostics.py test_phase_evolution_is_long_run_stable):
    # phase accumulation only rotates modes, so variance oscillates inside
    # a beat envelope around the RUN MEAN (±30% beats are physical) —
    # gating chunk k against chunk 0 would flag the beat itself.
    per_chunk_ok = True
    hs_series, e_series = [], []
    worst = {"max_abs_h": 0.0, "foam_max": 0.0, "nans": 0.0}
    t0 = time.time()
    for k in range(start_chunk, n_chunks):
        state, stats = run_chunk(state)
        s = np.asarray(jax.device_get(stats))   # tiny all-real pull: forces
        hs, energy, max_h, foam_mx, foam_mn, nans = map(float, s)
        hs_series.append(hs)
        e_series.append(energy)
        worst["max_abs_h"] = max(worst["max_abs_h"], max_h)
        worst["foam_max"] = max(worst["foam_max"], foam_mx)
        worst["nans"] = max(worst["nans"], nans)
        ok = (np.isfinite([hs, energy, max_h]).all() and nans == 0
              and 0.0 <= foam_mn and foam_mx <= 1.0 + 1e-6)
        per_chunk_ok = per_chunk_ok and bool(ok)
        if args.checkpoint_every_chunk or args.kill_after_chunk >= 0:
            save_checkpoint(ckpt, state, cfg)
        if args.kill_after_chunk == k:
            print(json.dumps({"killed_at_chunk": k,
                              "step": (k + 1) * args.chunk}), flush=True)
            os.kill(os.getpid(), signal.SIGKILL)   # exact own PID
        if (k - start_chunk) % 10 == 0 or not ok:
            print(f"# chunk {k + 1}/{n_chunks}: Hs={hs:.4f} E={energy:.5f} "
                  f"max|h|={max_h:.3f} foam=[{foam_mn:.3f},{foam_mx:.3f}] "
                  f"nans={nans:.0f} ok={ok}", file=sys.stderr, flush=True)
    wall = time.time() - t0
    e = np.asarray(e_series)
    q = max(1, len(e) // 4)
    # the invariant's envelope: no collapse below 0.2×mean, no blowup
    # above 3×mean, no secular trend between the first and last quarters
    envelope_ok = bool(e.min() > 0.2 * e.mean() and e.max() < 3.0 * e.mean())
    trend = float(e[:q].mean() / e[-q:].mean()) if len(e) >= 2 else 1.0
    trend_ok = bool(0.5 < trend < 2.0)
    return {
        "steps": n_chunks * args.chunk, "chunk": args.chunk,
        "res": args.res, "half_spectrum": bool(args.half),
        "resumed_from_chunk": start_chunk,
        "gates_ok": per_chunk_ok and envelope_ok and trend_ok,
        "per_chunk_ok": per_chunk_ok,
        "envelope_ok": envelope_ok, "trend_ok": trend_ok,
        "worst": worst,
        "energy_envelope": {"min_over_mean": round(float(e.min() / e.mean()), 4),
                            "max_over_mean": round(float(e.max() / e.mean()), 4),
                            "first_last_quarter_ratio": round(trend, 4)},
        "hs_mean": round(float(np.mean(hs_series)), 4),
        "wall_s": round(wall, 1),
        "device_ms_per_step_wall_bound": round(
            wall * 1e3 / max(1, (n_chunks - start_chunk) * args.chunk), 4),
        "final_state_sha256": _state_sha(state),
        "final_step": n_chunks * args.chunk,
    }


def orchestrate(args) -> int:
    """Three children: uninterrupted 20k twin → killed-at-random-chunk run →
    resume; final states must match bitwise. Then the long soak."""
    import random
    # forward EVERY physics/pacing flag — kill_at below is computed from
    # args.chunk, so a child running a different chunk size would let the
    # SIGKILL silently never fire and the resume test would test nothing
    base = [sys.executable, os.path.abspath(__file__),
            "--res", str(args.res), "--chunk", str(args.chunk),
            ] + (["--half"] if args.half else [])
    outdir = args.out_dir
    os.makedirs(outdir, exist_ok=True)
    short = args.kill_pair_steps
    kill_at = random.randrange(2, short // args.chunk - 2)
    results = {}

    def child(tag, extra, timeout):
        cmd = base + ["--out-dir", os.path.join(outdir, tag)] + extra
        os.makedirs(os.path.join(outdir, tag), exist_ok=True)
        p = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=timeout)
        lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
        sys.stderr.write(p.stderr[-2000:])
        return (json.loads(lines[-1]) if lines
                else {"error": f"rc={p.returncode}"}), p.returncode

    # (a) uninterrupted twin
    results["twin"], _ = child("twin", ["--steps", str(short)], 1200)
    # (b) killed at a random chunk boundary (SIGKILL → rc=-9)
    r, rc = child("pair", ["--steps", str(short),
                           "--kill-after-chunk", str(kill_at)], 1200)
    results["killed"] = {"rc": rc, "last_line": r, "kill_at_chunk": kill_at}
    # (c) resume to the same total
    results["resumed"], _ = child("pair", ["--steps", str(short),
                                           "--resume"], 1200)
    bitwise = (results["twin"].get("final_state_sha256") is not None
               and results["twin"].get("final_state_sha256")
               == results["resumed"].get("final_state_sha256"))
    # (d) the long soak
    results["soak"], _ = child("soak", ["--steps", str(args.steps)],
                               args.soak_timeout)
    out = {
        "what": "hardware soak (VERDICT r3 #4): chunked fori on the real "
                "chip; energy inside the calibrated beat envelope with no "
                "secular trend, bounded foam_accum, NaN gate; SIGKILL at a "
                "random chunk boundary + bitwise resume",
        "kill_resume_bitwise_ok": bitwise,
        "soak_gates_ok": results["soak"].get("gates_ok"),
        **{k: v for k, v in results.items()},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "SOAK_r5_half.json" if args.half else "SOAK_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"kill_resume_bitwise_ok": bitwise,
                      "soak_gates_ok": out["soak_gates_ok"],
                      "soak_steps": results["soak"].get("steps"),
                      "worst": results["soak"].get("worst")}))
    return 0 if (bitwise and out["soak_gates_ok"]) else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--chunk", type=int, default=1000)
    ap.add_argument("--half", action="store_true")
    ap.add_argument("--out-dir", type=str, default="/tmp/tpu_ocean_soak")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--kill-after-chunk", type=int, default=-1)
    ap.add_argument("--checkpoint-every-chunk", action="store_true")
    ap.add_argument("--orchestrate", action="store_true")
    ap.add_argument("--kill-pair-steps", type=int, default=20_000)
    ap.add_argument("--soak-timeout", type=float, default=1200.0)
    args = ap.parse_args()
    if args.orchestrate:
        return orchestrate(args)
    os.makedirs(args.out_dir, exist_ok=True)
    out = run_soak(args)
    print(json.dumps(out))
    return 0 if out["gates_ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
