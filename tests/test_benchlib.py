"""benchlib unit behavior: sane per-step estimates, metadata, and the
work-consumption checksum."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_ocean.benchlib import (time_steps_meta, make_scan_stepper, _consume)


def _toy_step(state, dt, extra=None):
    new = state * jnp.float32(0.999) + dt
    return new, {"field": new * 2.0}


def test_dispatch_method_sane():
    st = jnp.ones((64, 64), jnp.float32)
    m = time_steps_meta(_toy_step, st, 0.01, k1=4, k2=32, method="dispatch")
    assert m.per_step_s > 0 and m.forcing == "block"
    assert m.k1 == 4 and m.k2 == 32
    # grossly monotone on CPU. 0.2: microsecond-scale toy walls wobble
    # under a loaded host (the k1 burst can land on a descheduled slice);
    # the check guards ordering, not precision — flaked once at 0.5 in a
    # full parallel suite run (r5)
    assert m.wall_k2_s >= m.wall_k1_s * 0.2


def test_loop_method_and_checksum():
    st = jnp.ones((32, 32), jnp.float32)
    m = time_steps_meta(_toy_step, st, 0.01, k1=4, k2=16, method="loop")
    assert m.per_step_s > 0
    assert m.forcing in ("pull", "block")

    # the scan stepper's checksum must reflect every step's fields
    f4 = make_scan_stepper(_toy_step, 0.01, 4)
    f8 = make_scan_stepper(_toy_step, 0.01, 8)
    _, a4 = f4(st)
    _, a8 = f8(st)
    assert float(a8) != float(a4)


def test_consume_covers_all_leaves():
    tree = {"a": jnp.ones((2, 2)), "b": (jnp.ones(3), jnp.zeros(4))}
    assert float(_consume(tree)) == 7.0


def test_extra_args_threading():
    def step(state, dt, extra):
        return state + dt * extra["scale"], {"f": state}

    st = jnp.zeros((8, 8), jnp.float32)
    extra = {"scale": jnp.float32(2.0)}
    m = time_steps_meta(step, st, 0.5, k1=2, k2=8, method="dispatch",
                        extra=extra)
    assert m.per_step_s > 0
    m2 = time_steps_meta(step, st, 0.5, k1=2, k2=8, method="loop",
                         extra=extra)
    assert m2.per_step_s > 0


def test_ladder_flags_flat_walls_as_suspect(monkeypatch):
    """A runtime that defers all work past the forcing (flat walls — the
    axon block_until_ready failure mode) must be flagged, never trusted."""
    import time as _time
    from tpu_ocean import benchlib

    t = {"now": 0.0}
    monkeypatch.setattr(benchlib.time, "perf_counter", lambda: t["now"])

    def fake_wall_step(state, dt):
        return state, {"f": state}

    # walls advance a constant amount per run_once regardless of K
    orig_loop = benchlib.make_loop_stepper

    def fake_loop(step_impl, dt, with_extra=False):
        def run(state, k, *extra):
            t["now"] += 0.01          # constant: work deferred
            return state, jnp.zeros((), jnp.float32)
        return run

    monkeypatch.setattr(benchlib, "make_loop_stepper", fake_loop)
    lad = benchlib.time_steps_ladder(fake_wall_step,
                                     jnp.zeros((4, 4), jnp.float32), 0.01,
                                     ks=(4, 8, 16), forcing="block",
                                     escalate=False)
    assert lad.suspect and not lad.signal_ok


def test_ladder_escalation_reaches_signal(monkeypatch):
    """With a large dispatch constant, escalation must grow K until work
    dominates (the measured 27-37 ms tunnel constant scenario)."""
    from tpu_ocean import benchlib

    t = {"now": 0.0}
    monkeypatch.setattr(benchlib.time, "perf_counter", lambda: t["now"])

    def fake_loop(step_impl, dt, with_extra=False):
        def run(state, k, *extra):
            t["now"] += 0.030 + 1e-5 * float(k)   # constant + real work
            return state, jnp.zeros((), jnp.float32)
        return run

    monkeypatch.setattr(benchlib, "make_loop_stepper", fake_loop)
    lad = benchlib.time_steps_ladder(lambda s, d: (s, {"f": s}),
                                     jnp.zeros((4, 4), jnp.float32), 0.01,
                                     ks=(16, 48, 128), forcing="block",
                                     escalate=True)
    assert not lad.suspect
    assert lad.ks[-1] > 128                  # escalated
    assert abs(lad.per_step_s - 1e-5) < 2e-6  # recovered the true slope
