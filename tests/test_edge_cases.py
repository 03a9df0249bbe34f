"""Edge cases and degenerate configurations."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_ocean.config import OceanConfig
from tpu_ocean.solver import OceanSolver
from tpu_ocean.spectra import phillips
from tpu_ocean import grids


def test_zero_amplitude_gives_flat_ocean():
    cfg = OceanConfig(resolution=32, length=32.0, wind=(6.0, 4.0),
                      amplitude=0.0, evolution_mode="phase",
                      dispersion_mode="capillary", spectrum_layout="fft",
                      normals_mode="stencil")
    s = OceanSolver(cfg)
    st = s.init(jax.random.PRNGKey(0))
    st, f = s.step(st, 1 / 60)
    assert float(jnp.max(jnp.abs(f.height))) == 0.0
    np.testing.assert_allclose(np.asarray(f.normal[..., 1]), 1.0)
    # Jacobian of an undisplaced sheet is exactly 1
    np.testing.assert_allclose(np.asarray(f.jacobian), 1.0)


def test_non_power_of_two_reference_backend():
    cfg = OceanConfig(resolution=12, length=12.39, wind=(5.0, 3.0),
                      amplitude=0.01)
    s = OceanSolver(cfg, eval_mode="direct")
    st = s.init(jax.random.PRNGKey(1))
    st, f = s.step(st, 1 / 60)
    assert np.all(np.isfinite(np.asarray(f.height)))


def test_power_of_two_required_by_fast_backends():
    cfg = OceanConfig(resolution=24, length=24.0, wind=(5.0, 3.0),
                      amplitude=0.01, spectrum_layout="fft",
                      evolution_mode="phase", dispersion_mode="capillary",
                      normals_mode="stencil")
    with pytest.raises(AssertionError):
        s = OceanSolver(cfg, fft_backend="stockham")
        st = s.init(jax.random.PRNGKey(0))
        s.step(st, 1 / 60)


def test_phillips_zero_at_k_zero_and_below_cutoff():
    p = phillips(np.zeros((3, 3)), np.zeros((3, 3)), 1.0, (5.0, 3.0), 0.001)
    np.testing.assert_array_equal(np.asarray(p), 0.0)


def test_phillips_downwind_anisotropy():
    """Energy concentrates along the wind direction (k̂·ŵ)²."""
    k = 2 * np.pi / 50.0
    along = phillips(np.asarray([[k]]), np.asarray([[0.0]]), 1.0,
                     (10.0, 0.0), 0.001)
    across = phillips(np.asarray([[0.0]]), np.asarray([[k]]), 1.0,
                      (10.0, 0.0), 0.001)
    assert float(np.asarray(along)) > 100 * max(float(np.asarray(across)), 1e-300)


def test_incommensurate_length_rejected_by_fft_centered():
    cfg = OceanConfig(resolution=16, length=20.0, unit_width=1.0,
                      wind=(5.0, 3.0), amplitude=0.01,
                      spectrum_layout="centered")
    with pytest.raises(ValueError, match="length == resolution"):
        OceanSolver(cfg, eval_mode="fft")


def test_large_dt_phase_stays_bounded():
    cfg = OceanConfig(resolution=16, length=16.0, wind=(6.0, 4.0),
                      amplitude=0.1, evolution_mode="phase",
                      dispersion_mode="capillary", spectrum_layout="fft",
                      normals_mode="stencil")
    s = OceanSolver(cfg)
    st = s.init(jax.random.PRNGKey(0))
    for _ in range(3):
        st, f = s.step(st, 1000.0)   # huge dt: φ must stay in [0, 2π)
    ph = np.asarray(st.phase)
    assert ph.min() >= 0.0 and ph.max() < 2 * np.pi + 1e-5
    assert np.all(np.isfinite(np.asarray(f.height)))


def test_even_odd_coordinate_offsets():
    even = grids.coordinate_1d(4, 1.0)
    odd = grids.coordinate_1d(5, 1.0)
    # even N: half-cell offset (FFTMesh.cs:111); odd N: integer offsets
    np.testing.assert_allclose(even, [-1.5, -0.5, 0.5, 1.5])
    np.testing.assert_allclose(odd, [-2.0, -1.0, 0.0, 1.0, 2.0])


def test_gpu_hash_seeds_requires_fft_layout():
    import pytest
    cfg = OceanConfig(resolution=16, length=16.0, wind=(5.0, 3.0),
                      amplitude=0.1)   # centered default
    s = OceanSolver(cfg)
    with pytest.raises(ValueError, match="fft"):
        s.init(gpu_hash_seeds=(0.3, 0.8))


def test_fields_pallas_rejects_non_multiple_of_8():
    import pytest
    from tpu_ocean.ops.fields_pallas import fields_pallas
    a = jnp.zeros((12, 12), jnp.float32)
    with pytest.raises(ValueError, match="multiple of 8"):
        fields_pallas(a, a, a, 1.0)


def test_distributed_jonswap_matches_single():
    from tpu_ocean.parallel import make_mesh
    from tpu_ocean.solver_dist import DistributedOceanSolver
    cfg = OceanConfig(resolution=64, length=500.0, wind=(12.0, 0.0),
                      amplitude=1.0, evolution_mode="phase",
                      dispersion_mode="capillary", spectrum_layout="fft",
                      normals_mode="stencil", spectrum_model="jonswap")
    key = jax.random.PRNGKey(0)
    single = OceanSolver(cfg)
    dist = DistributedOceanSolver(cfg, make_mesh(shard=8))
    s1, f1 = single.step(single.init(key), 1 / 60)
    s2, f2 = dist.step(dist.init(key), 1 / 60)
    np.testing.assert_allclose(np.asarray(f2.height), np.asarray(f1.height),
                               atol=1e-4 * np.abs(np.asarray(f1.height)).max())


def test_pallas_plain_routes_to_fused_at_scale(monkeypatch):
    """Roadmap #14 / VERDICT r3 #2: the non-fused 'pallas' backend crashed
    the TPU worker at 8192² (UNAVAILABLE, r3 family sweep) — at or beyond
    solver.PALLAS_PLAIN_ROUTE_N the solver must route to 'pallas_fused'
    internally so no user-reachable config can kill the worker. Threshold
    lowered so the test runs at a small grid; the fields must stay
    identical (the fused pipeline is output-equivalent)."""
    import numpy as np
    import tpu_ocean.solver as solver_mod
    from tpu_ocean.config import OceanConfig
    cfg = OceanConfig(resolution=64, length=64.0, wind=(8.0, 5.0),
                      amplitude=0.4, spectrum_layout="fft",
                      normals_mode="stencil")
    monkeypatch.setattr(solver_mod, "PALLAS_PLAIN_ROUTE_N", 64)
    routed = solver_mod.OceanSolver(cfg, fft_backend="pallas",
                                    real_state=True)
    assert routed.fft_backend == "pallas_fused"
    # half_spectrum opts out (explicit plane-pipeline switch)
    kept = solver_mod.OceanSolver(cfg, fft_backend="pallas", real_state=True,
                                  pack_channels=True, half_spectrum=True)
    assert kept.fft_backend == "pallas"
    # centered layout cannot ride the fused pipeline — and since r5 the
    # constructor REFUSES rather than building the exact non-fused plane
    # set that crashed the worker in r3 (review finding)
    ccfg = OceanConfig(resolution=64, length=64.0, wind=(8.0, 5.0),
                       amplitude=0.4, spectrum_layout="centered",
                       normals_mode="spectral")
    import pytest
    with pytest.raises(ValueError, match="centered"):
        solver_mod.OceanSolver(ccfg, fft_backend="pallas")
    # below the route threshold centered+pallas stays constructible
    monkeypatch.setattr(solver_mod, "PALLAS_PLAIN_ROUTE_N", 8192)
    plain = solver_mod.OceanSolver(ccfg, fft_backend="pallas")
    assert plain.fft_backend == "pallas"
    monkeypatch.setattr(solver_mod, "PALLAS_PLAIN_ROUTE_N", 64)
    # routed output == explicit fused output (same program)
    import jax
    explicit = solver_mod.OceanSolver(cfg, fft_backend="pallas_fused",
                                      real_state=True)
    s1 = routed.init(jax.random.PRNGKey(3))
    s2 = explicit.init(jax.random.PRNGKey(3))
    _, f1 = routed.step(s1, 1 / 60)
    _, f2 = explicit.step(s2, 1 / 60)
    np.testing.assert_array_equal(np.asarray(f1.height),
                                  np.asarray(f2.height))


def test_fields_at_refuses_phase_mode():
    """fields_at evaluates the stateless ω·t form; in phase mode that
    silently disagrees with the accumulated per-mode phase — it must
    refuse like velocity() does (review finding, r5)."""
    import jax
    import pytest
    from tpu_ocean.config import OceanConfig
    from tpu_ocean.solver import OceanSolver
    cfg = OceanConfig(resolution=16, length=16.0, wind=(5.0, 3.0),
                      amplitude=0.1, evolution_mode="phase",
                      dispersion_mode="capillary", spectrum_layout="fft",
                      normals_mode="stencil")
    s = OceanSolver(cfg)
    st = s.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="absolute"):
        s.fields_at(st, 1.0)
    # absolute mode keeps working
    s2 = OceanSolver(cfg.replace(evolution_mode="absolute",
                                 dispersion_mode="quantized"))
    st2 = s2.init(jax.random.PRNGKey(0))
    f = s2.fields_at(st2, 1.0)
    assert f.height.shape == (16, 16)
