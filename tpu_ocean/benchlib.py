"""Trustworthy device timing on asynchronous/tunneled runtimes.

Measured on the axon TPU tunnel: dispatch-loop timings with a trailing
block_until_ready do NOT scale with problem size (identical wall-clock from
512² to 4096² — the runtime defers/elides work), and per-iteration scalar
pulls cost seconds of tunnel latency. Neither is a measurement.

The scheme here is immune to both failure modes:

  1. K solver steps run inside ONE executable (lax.scan) — the runtime cannot
     skip iterations, and every field output is folded into a scalar
     checksum carried through the scan, so nothing is dead code.
  2. The checksum is pulled to the host — forcing real execution end-to-end.
  3. Per-step time = (wall(K₂) − wall(K₁)) / (K₂ − K₁): differencing cancels
     dispatch, transfer, and tunnel constants.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax


def _consume(fields) -> jax.Array:
    """Fold every output field into one scalar so none is dead code."""
    acc = jnp.zeros((), jnp.float32)
    for leaf in jax.tree_util.tree_leaves(fields):
        acc = acc + jnp.sum(leaf).astype(jnp.float32)
    return acc


def make_scan_stepper(step_impl, dt: float, k: int):
    """jit(state -> (state, checksum)) running ``k`` chained steps."""
    import numpy as np
    # host scalar, NOT jnp: a closed-over device array becomes an MLIR
    # constant that jit must fetch device→host — unimplemented on axon
    dt = np.float32(dt)

    def body(carry, _):
        st, acc = carry
        st, fields = step_impl(st, dt)
        return (st, acc + _consume(fields)), None

    def run(state):
        (st, acc), _ = lax.scan(body, (state, jnp.zeros((), jnp.float32)),
                                None, length=k)
        return st, acc

    return jax.jit(run)


def time_steps(step_impl, state, dt: float, k1: int = 16, k2: int = 128,
               repeats: int = 2):
    """Seconds per step via the differenced-scan scheme. ``step_impl`` is the
    pure (state, dt) -> (state, fields) function (e.g. solver._step_impl)."""
    f1 = make_scan_stepper(step_impl, dt, k1)
    f2 = make_scan_stepper(step_impl, dt, k2)

    def run_once(f):
        st, acc = f(state)
        # the pull forces execution; float() of an f32 scalar is safe even on
        # backends where complex transfers are not
        float(jax.device_get(acc))

    run_once(f1)  # compile + warm
    run_once(f2)
    # difference the per-K minima (not per-pair diffs: noise on the short run
    # would make a pairwise difference negative and min() would keep it)
    best1 = best2 = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run_once(f1)
        t1 = time.perf_counter()
        run_once(f2)
        t2 = time.perf_counter()
        best1 = min(best1, t1 - t0)
        best2 = min(best2, t2 - t1)
    return max((best2 - best1) / (k2 - k1), 1e-9)


def time_fn(fn, example, k1: int = 16, k2: int = 128, repeats: int = 2):
    """Same scheme for a stateless x -> y function (chained via y feedback
    when shapes/dtypes allow, else re-applied to the same input inside scan
    with an iteration-dependent scale so calls cannot be collapsed)."""
    def body_feedback(carry, _):
        y = fn(carry)
        return y, None

    same_struct = jax.eval_shape(fn, example) == jax.eval_shape(
        lambda x: x, example)

    if same_struct:
        def run(k):
            def g(x):
                y, _ = lax.scan(body_feedback, x, None, length=k)
                return _consume(y)
            return jax.jit(g)
    else:
        def run(k):
            def g(x):
                def body(acc, i):
                    y = fn(x * (1.0 + 1e-6 * i.astype(x.real.dtype if
                           jnp.iscomplexobj(x) else x.dtype)))
                    return acc + _consume(y), None
                acc, _ = lax.scan(body, jnp.zeros((), jnp.float32),
                                  jnp.arange(k), length=k)
                return acc
            return jax.jit(g)

    f1, f2 = run(k1), run(k2)

    def once(f):
        float(jax.device_get(jnp.sum(f(example)).astype(jnp.float32)))

    once(f1)
    once(f2)
    best1 = best2 = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        once(f1)
        t1 = time.perf_counter()
        once(f2)
        t2 = time.perf_counter()
        best1 = min(best1, t1 - t0)
        best2 = min(best2, t2 - t1)
    return max((best2 - best1) / (k2 - k1), 1e-9)
