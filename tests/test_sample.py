"""Bilinear field probing (the texture-sampler analogue)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_ocean.config import OceanConfig
from tpu_ocean.solver import OceanSolver
from tpu_ocean.sample import sample_bilinear, surface_at, buoy_heights


def test_sample_exact_at_grid_points():
    n, length = 16, 16.0
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    xs = np.arange(n) * (length / n)
    got = np.asarray(sample_bilinear(f, xs[:, None] * np.ones((1, n)),
                                     np.ones((n, 1)) * xs[None, :], length))
    np.testing.assert_allclose(got, np.asarray(f), atol=1e-5)


def test_sample_linear_between_points_and_periodic():
    n, length = 8, 8.0
    f = jnp.asarray(np.arange(n, dtype=np.float32)[:, None]
                    * np.ones((1, n), np.float32))   # f = i along x
    # halfway between rows 2 and 3 → 2.5
    v = float(sample_bilinear(f, 2.5, 1.0, length))
    np.testing.assert_allclose(v, 2.5, atol=1e-5)
    # periodic wrap: halfway between row n-1 (=7) and row 0 → 3.5
    v = float(sample_bilinear(f, 7.5, 1.0, length))
    np.testing.assert_allclose(v, 3.5, atol=1e-5)
    # full period shift is exact
    np.testing.assert_allclose(float(sample_bilinear(f, 2.5 + length, 1.0,
                                                     length)), 2.5, atol=1e-5)


def test_buoys_on_live_ocean_and_grad():
    cfg = OceanConfig(resolution=32, length=32.0, wind=(6.0, 4.0),
                      amplitude=0.3, evolution_mode="phase",
                      dispersion_mode="capillary", spectrum_layout="fft",
                      normals_mode="stencil")
    s = OceanSolver(cfg)
    st = s.init(jax.random.PRNGKey(0))
    st, f = s.step(st, 1 / 60)
    pos = np.asarray([[1.2, 3.4], [10.0, 20.5], [31.9, 0.1]])
    h = buoy_heights(f, pos, cfg.length)
    assert h.shape == (3,) and np.isfinite(np.asarray(h)).all()
    wx, wh, wz = surface_at(f, 5.0, 7.0, cfg.length, cfg.choppiness)
    assert np.isfinite(float(wh))

    # differentiable through the sampler (for probe-fitting applications)
    g = jax.grad(lambda x: jnp.sum(sample_bilinear(f.height, x, 3.0,
                                                   cfg.length)))(5.25)
    assert np.isfinite(float(g))


def test_grid_origin_centered_layout():
    from tpu_ocean.sample import grid_origin
    cfg = OceanConfig(resolution=16, length=16.0, unit_width=1.0,
                      wind=(5.0, 3.0), amplitude=0.1)   # centered default
    o = grid_origin(cfg)
    assert o == -7.5     # (0 − N/2)·w + w/2
    cfg_fft = OceanConfig(resolution=16, length=16.0, wind=(5.0, 3.0),
                          amplitude=0.1, evolution_mode="phase",
                          dispersion_mode="capillary", spectrum_layout="fft",
                          normals_mode="stencil")
    assert grid_origin(cfg_fft) == 0.0
    # sampling at the first vertex's world position returns field[0, 0]
    f = jnp.asarray(np.arange(256, dtype=np.float32).reshape(16, 16))
    v = float(sample_bilinear(f, o, o, cfg.length, origin=o))
    np.testing.assert_allclose(v, float(f[0, 0]), atol=1e-4)


def test_grid_period_incommensurate_centered():
    """FFT_MESH_DEMO-style config: L=12.39 but spacing is unit_width=1 —
    the sampler's period must be N·w, and vertex positions must sample
    exactly back (the review-caught spacing bug)."""
    from tpu_ocean.sample import grid_origin, grid_period
    from tpu_ocean.config import FFT_MESH_DEMO
    cfg = FFT_MESH_DEMO
    assert grid_period(cfg) == 12.0 and cfg.length == 12.39
    o = grid_origin(cfg)
    f = jnp.asarray(np.arange(144, dtype=np.float32).reshape(12, 12))
    for i in (0, 5, 11):
        x = o + i * cfg.unit_width
        v = float(sample_bilinear(f, x, o, grid_period(cfg), origin=o))
        np.testing.assert_allclose(v, float(f[i, 0]), atol=1e-3)
