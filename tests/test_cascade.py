"""Multi-band cascade solver (D7): combined fields equal the sum of the
individual band solvers, and the 'expert'-sharded step matches unsharded."""

import numpy as np
import jax
import pytest
from jax.sharding import Mesh

from tpu_ocean.cascade import CascadeSolver, CascadeState, default_cascade
from tpu_ocean.solver import OceanSolver
from tpu_ocean.config import OceanConfig


def test_cascade_equals_sum_of_bands():
    cfgs = default_cascade(n=32, lengths=(100.0, 13.0))
    casc = CascadeSolver(cfgs)
    key = jax.random.PRNGKey(4)
    state = casc.init(key)
    state, combined = casc.step(state, 1 / 60)

    keys = jax.random.split(key, 2)
    height = np.zeros((32, 32))
    disp_x = np.zeros((32, 32))
    for cfg, k in zip(cfgs, keys):
        s = OceanSolver(cfg)
        st = s.init(key=None, h0=None)
        # re-derive the same h0 the cascade drew for this band
        from tpu_ocean.spectra import h0_pair_fft
        h0, h0c = h0_pair_fft(k, cfg.resolution, cfg.length,
                              cfg.phillips_amplitude, cfg.wind, cfg.damping)
        st = s.init(h0=h0, h0_conj=h0c)
        st, f = s.step(st, 1 / 60)
        height += np.asarray(f.height)
        disp_x += cfg.choppiness * np.asarray(f.disp_x)

    np.testing.assert_allclose(np.asarray(combined.height), height, atol=1e-4)
    np.testing.assert_allclose(np.asarray(combined.disp_x), disp_x, atol=1e-4)


def test_cascade_expert_sharding_matches_unsharded():
    cfgs = default_cascade(n=32, lengths=(200.0, 50.0, 12.0, 3.0))
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("expert",))
    plain = CascadeSolver(cfgs)
    sharded = CascadeSolver(cfgs, mesh=mesh)
    key = jax.random.PRNGKey(7)
    s1 = plain.init(key)
    s2 = sharded.init(key)
    for _ in range(2):
        s1, f1 = plain.step(s1, 1 / 60)
        s2, f2 = sharded.step(s2, 1 / 60)
    np.testing.assert_allclose(np.asarray(f2.height), np.asarray(f1.height),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(f2.foam), np.asarray(f1.foam),
                               atol=1e-5)


def test_cascade_validation():
    cfgs = default_cascade(n=32)
    bad = cfgs[:1] + [cfgs[1].replace(resolution=64)]
    with pytest.raises(ValueError):
        CascadeSolver(bad)
    with pytest.raises(ValueError):
        CascadeSolver([cfgs[0].replace(spectrum_layout="centered")])


def test_cascade_honors_spectrum_model():
    cfgs = [c.replace(spectrum_model="jonswap", length=500.0,
                      wind=(12.0, 0.0), amplitude=1.0, amplitude_scale=1.0)
            for c in default_cascade(n=32, lengths=(500.0, 100.0))]
    phill = [c.replace(spectrum_model="phillips") for c in cfgs]
    key = jax.random.PRNGKey(2)
    a = CascadeSolver(cfgs).init(key)
    b = CascadeSolver(phill).init(key)
    # same key, different spectrum model ⇒ different h0 magnitudes
    assert not np.allclose(np.abs(np.asarray(a.h0)),
                           np.abs(np.asarray(b.h0)))
