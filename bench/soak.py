"""Long-horizon hardware soak of the flagship step (VERDICT r3 #4).

The CPU suite pins a 400-step variance invariant; nothing had ever soaked
the REAL chip. This script runs 10⁴-10⁵ steps on device via chunked jitted
fori loops with per-chunk physics gates, plus a SIGKILL/resume bitwise
cross-check:

  gates per chunk (computed IN-JIT, pulled as one tiny all-real vector —
  the only safe pull pattern on this runtime, CLAUDE.md):
    * Hs = 4·std(height) inside a drift envelope around the run's initial
      value (the beat envelope of the quantized/capillary mode mix);
    * energy = mean(h²) finite and inside the same envelope;
    * foam_accum bounded in [0, 1] (foam_decay > 0 exercises the
      accumulator — the r2 boundedness proof, now on hardware);
    * no NaN anywhere (max|h| finite).

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

    # persistent compile cache (bench.py policy): the orchestrator's four
    # children share one compiled executable instead of four Mosaic compiles
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/tpu_ocean_jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    cfg = _cfg(args.res)
    solver = OceanSolver(cfg, fft_backend="pallas", real_state=True,
                         pallas_fields=True, pack_channels=True,
                         half_spectrum=args.half)
    dt = jnp.float32(1.0 / 60.0)
    ckpt = os.path.join(args.out_dir, "soak_ckpt.npz")
    start_chunk = 0
    if args.resume:
        state, _ = load_checkpoint(ckpt, real_state=True)
        state = jax.device_put(state)
        start_chunk = int(np.asarray(state.step)) // args.chunk
    else:
        state = solver.init(jax.random.PRNGKey(0))

    consts = solver._consts

    def chunk_fn(st):
        def body(_, s):
            return solver._step_impl(s, dt, consts)[0]
        st = lax.fori_loop(0, args.chunk - 1, body, st)
        st, fields = solver._step_impl(st, dt, consts)
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

    n_chunks = args.steps // args.chunk
    hs0 = energy0 = None
    gates_ok = True
    worst = {"hs_drift": 0.0, "energy_drift": 0.0, "max_abs_h": 0.0,
             "foam_max": 0.0, "nans": 0.0}
    t0 = time.time()
    for k in range(start_chunk, n_chunks):
        state, stats = chunk_jit(state)
        s = np.asarray(jax.device_get(stats))   # tiny all-real pull: forces
        hs, energy, max_h, foam_mx, foam_mn, nans = map(float, s)
        if hs0 is None:
            hs0, energy0 = hs, energy
        worst["hs_drift"] = max(worst["hs_drift"], abs(hs / hs0 - 1.0))
        worst["energy_drift"] = max(worst["energy_drift"],
                                    abs(energy / energy0 - 1.0))
        worst["max_abs_h"] = max(worst["max_abs_h"], max_h)
        worst["foam_max"] = max(worst["foam_max"], foam_mx)
        worst["nans"] = max(worst["nans"], nans)
        ok = (np.isfinite([hs, energy, max_h]).all() and nans == 0
              and 0.0 <= foam_mn and foam_mx <= 1.0 + 1e-6
              and abs(hs / hs0 - 1.0) < args.drift
              and abs(energy / energy0 - 1.0) < 2 * args.drift)
        gates_ok = gates_ok and bool(ok)
        if args.checkpoint_every_chunk or args.kill_after_chunk >= 0:
            save_checkpoint(ckpt, state, cfg)
        if args.kill_after_chunk == k:
            print(json.dumps({"killed_at_chunk": k,
                              "step": (k + 1) * args.chunk}), flush=True)
            os.kill(os.getpid(), signal.SIGKILL)   # exact own PID
        if (k - start_chunk) % 10 == 0 or not ok:
            print(f"# chunk {k + 1}/{n_chunks}: Hs={hs:.4f} "
                  f"(drift {hs / hs0 - 1.0:+.2%}) E={energy:.5f} "
                  f"max|h|={max_h:.3f} foam=[{foam_mn:.3f},{foam_mx:.3f}] "
                  f"nans={nans:.0f} ok={ok}", file=sys.stderr, flush=True)
    wall = time.time() - t0
    return {
        "steps": n_chunks * args.chunk, "chunk": args.chunk,
        "res": args.res, "resumed_from_chunk": start_chunk,
        "gates_ok": gates_ok, "worst": worst,
        "drift_envelope": args.drift,
        "hs_initial": hs0,
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
    base = [sys.executable, os.path.abspath(__file__), "--res",
            str(args.res)]
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
                "chip with Hs/energy drift gates, bounded foam_accum, NaN "
                "gate; SIGKILL at a random chunk boundary + bitwise resume",
        "kill_resume_bitwise_ok": bitwise,
        "soak_gates_ok": results["soak"].get("gates_ok"),
        **{k: v for k, v in results.items()},
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "SOAK_r4.json")
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
    ap.add_argument("--drift", type=float, default=0.25,
                    help="allowed |Hs/Hs0 - 1| envelope (phase-mode beat)")
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
