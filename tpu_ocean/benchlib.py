"""Trustworthy device timing on asynchronous / tunneled runtimes.

Measured on the axon TPU tunnel, BOTH standard techniques fail:
  * dispatch loops + trailing block_until_ready report wall-clocks that do
    not scale with problem size N or iteration count K (work is deferred or
    elided past the block) — timings can be 100× too optimistic;
  * host pulls of a result scalar (the classic forcing) can raise
    UNIMPLEMENTED or hang for minutes of tunnel latency.

The scheme here is layered:

  1. K solver steps run inside ONE executable (lax.scan); every output field
     folds into a scalar checksum carried through the scan, so no step and no
     field is dead code.
  2. Execution is forced by pulling the checksum when the backend allows it
     (watchdog-guarded), else by block_until_ready.
  3. Per-step time = (wall(K₂) − wall(K₁)) / (K₂ − K₁), differencing away
     dispatch/transfer constants.
  4. A self-check compares wall(K₂)/wall(K₁) to K₂/K₁; when the ratio is
     far off linear the result is flagged ``suspect`` — reported, never
     silently trusted.
"""

from __future__ import annotations

import contextlib
import os
import signal
import time
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _consume(fields) -> jax.Array:
    """Fold every output field into one scalar so none is dead code."""
    acc = jnp.zeros((), jnp.float32)
    for leaf in jax.tree_util.tree_leaves(fields):
        acc = acc + jnp.sum(leaf).astype(jnp.float32)
    return acc


def make_scan_stepper(step_impl, dt: float, k: int, extra=None):
    """jit(state -> (state, checksum)) running ``k`` chained steps."""
    loop = make_loop_stepper(step_impl, dt, with_extra=extra is not None)
    if extra is None:
        return lambda state: loop(state, jnp.int32(k))
    return lambda state: loop(state, jnp.int32(k), extra)


def make_loop_stepper(step_impl, dt: float, with_extra: bool = False):
    """jit((state, k[, extra]) -> (state, checksum)) with a TRACED trip
    count — one compile serves every k (remote AOT compiles cost minutes per
    executable on tunneled runtimes, so the k1/k2 differencing must share
    one). ``extra`` carries the solver's device-resident constants as a real
    jit argument — closing over them would embed/re-fetch them (CLAUDE.md)."""
    # host scalar, NOT jnp: a closed-over device array becomes an MLIR
    # constant that jit must fetch device→host — unimplemented on axon
    dt = np.float32(dt)

    if with_extra:
        def run(state, k, extra):
            def body(_, carry):
                st, acc = carry
                st, fields = step_impl(st, dt, extra)
                return (st, acc + _consume(fields))
            return lax.fori_loop(0, k, body,
                                 (state, jnp.zeros((), jnp.float32)))
    else:
        def run(state, k):
            def body(_, carry):
                st, acc = carry
                st, fields = step_impl(st, dt)
                return (st, acc + _consume(fields))
            return lax.fori_loop(0, k, body,
                                 (state, jnp.zeros((), jnp.float32)))

    return jax.jit(run)


@contextlib.contextmanager
def _watchdog(seconds: int):
    """Convert a hung host pull into an exception (main thread, Unix)."""
    def handler(signum, frame):
        raise TimeoutError("host pull timed out")

    old = signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@dataclass
class TimingResult:
    per_step_s: float
    forcing: str          # 'pull' | 'block'
    suspect: bool         # K-scaling self-check failed
    k1: int
    k2: int
    wall_k1_s: float
    wall_k2_s: float


@dataclass
class LadderResult:
    """K-ladder timing: walls at several trip counts from ONE compiled
    executable, a linear fit, and explicit validity checks."""
    per_step_s: float         # fitted slope
    intercept_s: float        # fitted dispatch/transfer constant
    forcing: str              # 'pull' | 'block'
    ks: list
    walls_s: list
    monotone: bool
    max_rel_resid: float      # worst |wall − fit| / wall
    signal_ok: bool           # top wall dominated by work, not constant
    suspect: bool             # any validity check failed

    @property
    def wall_k1_s(self):
        return self.walls_s[0]

    @property
    def wall_k2_s(self):
        return self.walls_s[-1]


def time_steps_ladder(step_impl, state, dt: float, ks=(16, 48, 128),
                      repeats: int = 2, pull_timeout_s: int = 60,
                      extra=None, escalate: bool = True,
                      max_k: int = 65536,
                      forcing: str = "auto") -> LadderResult:
    """Rigorous differenced timing: walls at a ladder of trip counts (one
    fori_loop executable, traced count — one compile serves every K), then a
    least-squares fit wall = intercept + K·per_step with three validity
    checks (monotone walls, small fit residual, work ≫ dispatch constant).

    On runtimes with a large per-call constant (tunnels: ~26 ms measured)
    a too-small ladder yields pure noise; with ``escalate`` the ladder is
    multiplied ×8 until the top wall is ≥ 3× the bottom one (work dominates)
    or ``max_k`` is reached. Escalation re-uses the compiled loop, so each
    rung costs only its own wall-clock.

    ``forcing`` (probed behaviors on the axon tunnel, all measured):
      'auto'     — pull the checksum, demote to block on first failure.
      'block'    — block_until_ready only. WARNING: the tunnel runtime
                   defers ALL execution past block (65k chained matmuls
                   "complete" in 0.6 ms) — walls are then flat and the
                   validity checks reject the run.
      'tinypull' — dispatch the loop, then device_get a TINY scalar from an
                   independent trivial program: the runtime executes
                   enqueued programs IN ORDER, so the tiny pull returns only
                   after the loop really ran. Avoids pulling the loop's own
                   output (the transfer that sometimes hangs and poisons the
                   process) while still forcing execution. The demonstrated
                   reliable mode on the tunnel.
    """
    import numpy as _np

    loop = make_loop_stepper(step_impl, dt, with_extra=extra is not None)
    args = () if extra is None else (extra,)
    strategy = {"forcing": "pull" if forcing == "auto" else forcing}
    tiny = jax.jit(lambda s: s + 1.0)

    def run_once(k):
        st, acc = loop(state, jnp.int32(k), *args)
        if strategy["forcing"] == "tinypull":
            try:
                with _watchdog(pull_timeout_s):
                    # in-order queue: this cheap transfer completes only
                    # after the loop above executed
                    float(jax.device_get(tiny(jnp.float32(k))))
                return None
            except Exception:
                strategy["forcing"] = "block"
        if strategy["forcing"] == "pull":
            try:
                with _watchdog(pull_timeout_s):
                    return float(jax.device_get(acc))
            except Exception:
                strategy["forcing"] = "block"
        jax.block_until_ready(acc)
        return None

    def wall(k):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            run_once(k)
            best = min(best, time.perf_counter() - t0)
        return best

    ks = sorted(set(int(k) for k in ks))
    run_once(ks[0])   # compile + warm + probe forcing
    for attempt in range(6):
        if attempt > 0:
            # multiply BEFORE measuring so ks and walls always describe the
            # same ladder when the loop exits (by break or exhaustion)
            ks = [k * 8 for k in ks]
        walls = [wall(k) for k in ks]
        signal_ok = walls[-1] >= 3.0 * max(walls[0], 1e-9)
        if signal_ok or not escalate or ks[-1] * 8 > max_k:
            break

    ks_a = _np.asarray(ks, float)
    ws = _np.asarray(walls, float)
    slope, intercept = _np.polyfit(ks_a, ws, 1)
    pred = intercept + slope * ks_a
    # residual normalized by the TOP wall: the small rungs sit near the
    # dispatch constant where relative error is meaningless; flat ladders
    # are caught by signal_ok/monotone, not by the fit
    resid = float(_np.max(_np.abs(ws - pred)) / max(float(ws[-1]), 1e-12))
    # non-strict within 2% of the top wall: two fast rungs tying at timer
    # resolution must not null an otherwise valid ladder; genuinely flat
    # ladders are rejected by signal_ok and the fit residual
    monotone = bool(_np.all(_np.diff(ws) > -0.02 * float(ws[-1])))
    per_step = max(float(slope), 1e-9)
    suspect = not (monotone and signal_ok and resid < 0.35)
    return LadderResult(per_step_s=per_step, intercept_s=float(intercept),
                        forcing=strategy["forcing"], ks=list(ks),
                        walls_s=[float(w) for w in ws], monotone=monotone,
                        max_rel_resid=resid, signal_ok=bool(signal_ok),
                        suspect=suspect)


def time_steps_meta(step_impl, state, dt: float, k1: int = 16, k2: int = 128,
                    repeats: int = 2, pull_timeout_s: int = 60,
                    method: str = "dispatch", extra=None) -> TimingResult:
    """TimingResult for the pure (state, dt) -> (state, fields) stepper.

    method='dispatch': chained per-step dispatches, block on the last output.
      Cheap to compile (one plain step executable); accurate wherever
      block_until_ready is truthful; the K-linearity check flags the rest.
    method='loop': fori_loop-of-K executable + checksum pull — rigorous even
      against work-deferring runtimes, but the big-loop compile costs minutes
      on remote-AOT tunnels and a hung pull cannot be interrupted (SIGALRM
      can't preempt a blocked C call), so use it only where pulls are known
      good.
    """
    if method == "dispatch":
        return _time_steps_dispatch(step_impl, state, dt, k1, k2, repeats,
                                    extra)
    # loop: a 3-rung K ladder through ONE compiled executable, fitted and
    # validity-checked (time_steps_ladder). Escalation bails out of ladders
    # whose walls are dominated by the per-call dispatch constant — the
    # regime where the old two-point differencing reported noise as signal.
    mid = max(k1 + 1, min(k2 - 1, 3 * k1))
    lad = time_steps_ladder(step_impl, state, dt, ks=(k1, mid, k2),
                            repeats=repeats, pull_timeout_s=pull_timeout_s,
                            extra=extra, escalate=True)
    return TimingResult(per_step_s=lad.per_step_s, forcing=lad.forcing,
                        suspect=lad.suspect, k1=lad.ks[0], k2=lad.ks[-1],
                        wall_k1_s=lad.wall_k1_s, wall_k2_s=lad.wall_k2_s)


def _time_steps_dispatch(step_impl, state, dt: float, k1: int, k2: int,
                         repeats: int, extra=None) -> TimingResult:
    step = jax.jit(step_impl)   # NO donation: we re-feed the same start state
    dtj = jnp.asarray(dt, jnp.float32)
    args = () if extra is None else (extra,)

    def run_k(k):
        st, fields = state, None
        for _ in range(k):
            st, fields = step(st, dtj, *args)
        jax.block_until_ready(fields)

    run_k(2)   # compile + warm
    best1 = best2 = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_k(k1)
        t1 = time.perf_counter()
        run_k(k2)
        t2 = time.perf_counter()
        best1 = min(best1, t1 - t0)
        best2 = min(best2, t2 - t1)
    per_step = max((best2 - best1) / (k2 - k1), 1e-9)
    ratio = best2 / max(best1, 1e-9)
    # suspect when walls are far off linear OR the differenced signal is in
    # the noise (work never dominated the per-call constant). The old extra
    # `and best2 < 1.0` exempted slow-walled runs from the check — a
    # work-deferring runtime with >1 s dispatch walls was never flagged.
    suspect = (ratio < 0.25 * (k2 / k1)) or (best2 < 1.5 * best1)
    return TimingResult(per_step_s=per_step, forcing="block", suspect=suspect,
                        k1=k1, k2=k2, wall_k1_s=best1, wall_k2_s=best2)


def time_steps(step_impl, state, dt: float, k1: int = 16, k2: int = 128,
               repeats: int = 2, method: str = "dispatch") -> float:
    """Seconds per step (see time_steps_meta)."""
    return time_steps_meta(step_impl, state, dt, k1, k2, repeats,
                           method=method).per_step_s


def enable_compile_cache(path: str = None):
    """Point JAX's persistent compilation cache at a repo-local directory.

    The hardware harnesses (bench.py, bench/{soak,serve_tpu,trace_capture,
    family}.py) each run measurements in FRESH child interpreters so a hung
    tunnel kills only the child — but that means every retry repays the
    Mosaic/XLA compile (~20-40 s single-chip, minutes for 8192² over the
    tunnel). With the persistent cache, only the first child compiles; every
    retry and every sibling harness loads the executable from disk.

    Safe to call multiple times / before or after backend init (it only
    sets jax.config values). Keyed by program + compile options, so CPU
    test runs and TPU runs never collide."""
    import jax
    if path is None:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "..", ".jax_compile_cache")
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache even fast compiles: the 1024² step itself lowers in ~2 s but
    # the tunnel round trips make a cold trace 20-40 s
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
