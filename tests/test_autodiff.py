"""Differentiability — a capability the reference architecture cannot have.

The whole step is pure JAX, so gradients flow end-to-end: ∂(field loss)/∂h0,
∂/∂(wave-bank parameters), etc. This enables adjoint-style inversion (fit a
sea state to observations), which the shader pipeline structurally cannot do.
"""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_ocean.config import OceanConfig, PondConfig
from tpu_ocean.solver import OceanSolver
from tpu_ocean.gerstner import WaveBank, gerstner_eval
from tpu_ocean import grids


def _cfg(n=32):
    return OceanConfig(resolution=n, length=float(n), wind=(6.0, 4.0),
                       amplitude=0.05, evolution_mode="phase",
                       dispersion_mode="capillary", spectrum_layout="fft",
                       normals_mode="stencil")


def test_grad_through_full_step_wrt_h0():
    cfg = _cfg()
    solver = OceanSolver(cfg)
    base = solver.init(jax.random.PRNGKey(0))

    def loss(h0):
        st = base._replace(h0=h0, h0_conj=jnp.conj(h0[::-1, ::-1]))
        st, f = solver._step_impl(st, jnp.float32(1 / 60))
        return jnp.sum(f.height ** 2) + jnp.sum(f.foam)

    g = jax.grad(loss)(base.h0)
    ga = np.asarray(jnp.abs(g))
    assert np.all(np.isfinite(ga)) and ga.max() > 0

    # finite-difference check on the dominant element
    idx = np.unravel_index(np.argmax(ga), ga.shape)
    eps = 1e-3
    e = jnp.zeros_like(base.h0).at[idx].set(eps)
    fd = (loss(base.h0 + e) - loss(base.h0 - e)) / (2 * eps)
    an = jnp.real(g[idx])   # grad convention: d/d(re) for real loss
    np.testing.assert_allclose(float(fd), float(an), rtol=2e-2)


def test_grad_through_gerstner_wrt_amplitudes():
    bank = WaveBank.random(3, 8)
    x, z = grids.coordinate_grid(32, 1.0)
    x = jnp.asarray(np.asarray(x, np.float32))
    z = jnp.asarray(np.asarray(z, np.float32))

    def loss(amps):
        b = WaveBank(amps=tuple(), steeps=bank.steeps, dirs_x=bank.dirs_x,
                     dirs_z=bank.dirs_z, freqs=bank.freqs, omegas=bank.omegas)
        # bypass the tuple container: evaluate with traced amp array
        arrs = bank.as_arrays()
        phase = (jnp.asarray(arrs["freqs"])
                 * (x[..., None] * jnp.asarray(arrs["dirs_x"])
                    + z[..., None] * jnp.asarray(arrs["dirs_z"]))
                 + jnp.asarray(arrs["omegas"]) * 1.3)
        h = jnp.sum(amps * jnp.sin(phase), axis=-1)
        return jnp.mean(h ** 2)

    amps0 = jnp.asarray(np.asarray(bank.amps, np.float32))
    g = jax.grad(loss)(amps0)
    assert np.all(np.isfinite(np.asarray(g))) and float(jnp.abs(g).max()) > 0


def test_jvp_linearity_of_transform():
    """The spectrum→fields map is linear in h0 at fixed phase: JVP must equal
    the primal difference exactly (up to fp32)."""
    cfg = _cfg(16)
    solver = OceanSolver(cfg)
    st = solver.init(jax.random.PRNGKey(1))

    def height_of(h0):
        s = st._replace(h0=h0)
        _, f = solver._step_impl(s, jnp.float32(1 / 60))
        return f.height

    v = jax.random.normal(jax.random.PRNGKey(2), st.h0.shape) * (1 + 0.5j)
    v = v.astype(st.h0.dtype)
    _, jvp = jax.jvp(height_of, (st.h0,), (v,))
    direct = height_of(st.h0 + v) - height_of(st.h0)
    np.testing.assert_allclose(np.asarray(jvp), np.asarray(direct),
                               atol=2e-2, rtol=1e-3)


def test_grad_through_cascade_wrt_band_h0():
    """Gradients flow through the multi-band (EP-analogue) step — per-band
    adjoint sea-state inversion over the combined surface, including the
    Σ-combine and the LOD-shared extraction path. Finite-difference checked
    on the dominant band element. (The real-state twin rides hand Pallas
    kernels, which carry no VJP rule — adjoint work uses the jnp-backed
    backends, same math; this mirrors OceanSolver's existing contract.)"""
    from tpu_ocean.cascade import CascadeSolver, default_cascade
    cfgs = default_cascade(n=32, lengths=(100.0, 13.0))
    solver = CascadeSolver(cfgs, fft_backend="reference")
    base = solver.init(jax.random.PRNGKey(1))

    def loss(h0):
        st = base._replace(h0=h0,
                           h0_conj=jnp.conj(h0[:, ::-1, ::-1]))
        st, f = solver._step_impl(st, jnp.float32(1 / 60))
        return jnp.sum(f.height ** 2) + jnp.sum(f.foam)

    g = jax.grad(loss)(base.h0)
    ga = np.asarray(jnp.abs(g))
    assert np.all(np.isfinite(ga)) and ga.max() > 0
    assert all(ga[b].max() > 0 for b in range(ga.shape[0]))  # every band live

    idx = np.unravel_index(np.argmax(ga), ga.shape)
    eps = 1e-3
    e = jnp.zeros_like(base.h0).at[idx].set(eps)
    fd = (loss(base.h0 + e) - loss(base.h0 - e)) / (2 * eps)
    np.testing.assert_allclose(float(fd), float(jnp.real(g[idx])), rtol=2e-2)
