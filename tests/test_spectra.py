"""Unit tests for Phillips / h0 / dispersion against closed-form numpy
(SURVEY.md §4.4)."""

import numpy as np
import jax
import jax.numpy as jnp

from tpu_ocean import spectra, grids
from tpu_ocean.config import G, PI, EPSILON


def _phillips_scalar(kx, kz, amp, wind, damping):
    """Straight transliteration of FFTMesh.cs:149-166 for one wavevector."""
    k_len = np.hypot(kx, kz)
    if k_len < EPSILON:
        return 0.0
    k2 = k_len ** 2
    k4 = k2 ** 2
    w_len = np.hypot(*wind)
    k_dot_w = (kx * wind[0] + kz * wind[1]) / (k_len * w_len)
    l = w_len ** 2 / G
    l2 = l * l
    big_l2 = l2 * damping ** 2
    return amp * np.exp(-1.0 / (k2 * l2)) / k4 * k_dot_w ** 2 * np.exp(-k2 * big_l2)


def test_phillips_matches_scalar_reference():
    n, length = 16, 32.0
    kx, kz, _ = grids.wavevector_grid(n, length, "centered")
    amp, wind, damping = 0.8, (3.0, -2.0), 0.001
    p = spectra.phillips(kx, kz, amp, wind, damping)
    expected = np.vectorize(
        lambda a, b: _phillips_scalar(a, b, amp, wind, damping))(kx, kz)
    np.testing.assert_allclose(p, expected, rtol=1e-10)


def test_phillips_zero_at_k0_and_perpendicular_wind():
    kx = np.array([0.0, 0.0])
    kz = np.array([0.0, 1.0])
    p = spectra.phillips(kx, kz, 1.0, (1.0, 0.0), 0.001)
    assert p[0] == 0.0           # |k| < EPSILON cutoff
    assert p[1] < 1e-20          # (k̂·ŵ)² = 0


def test_dispersion_capillary_formula():
    k = np.array([0.0, 1.0, 370.0])
    w = spectra.dispersion_capillary(k)
    np.testing.assert_allclose(
        w, np.sqrt(G * k * (1 + (k / 370.0) ** 2)), rtol=1e-12)


def test_dispersion_quantized_is_multiple_of_w0():
    n, length = 32, 57.0
    _, _, k_mag = grids.wavevector_grid(n, length, "centered")
    w0 = 2 * PI / length
    w = spectra.dispersion_quantized(k_mag, length)
    ratio = w / w0
    np.testing.assert_allclose(ratio, np.round(ratio), atol=1e-9)
    # quantization floors: ω ≤ sqrt(g|k|)
    assert np.all(w <= np.sqrt(G * k_mag) + 1e-12)


def test_sample_h0_statistics_and_determinism():
    n, length = 64, 64.0
    kx, kz, _ = grids.wavevector_grid(n, length, "centered")
    p = spectra.phillips(kx, kz, 1.0, (10.0, 10.0), 0.001)
    key = jax.random.PRNGKey(7)
    h0a = spectra.sample_h0(key, p)
    h0b = spectra.sample_h0(key, p)
    # same key ⇒ bit-identical (replaces the reference's irreproducible RNGs,
    # SURVEY.md §4.5)
    assert jnp.array_equal(h0a, h0b)
    # E[|h0|²] = P(k): with a flat unit spectrum the mean |h0|² over all
    # N² modes concentrates tightly around 1 (std ≈ 1/N).
    flat = spectra.sample_h0(jax.random.PRNGKey(11), np.ones((n, n)))
    ratio = float(jnp.mean(jnp.abs(flat) ** 2))
    assert 0.93 < ratio < 1.07


def test_h0_pair_centered_conjugate_convention():
    key = jax.random.PRNGKey(3)
    h0, h0c = spectra.h0_pair_centered(key, 16, 16.0, 1.0, (5.0, 3.0), 0.001)
    assert h0.shape == (16, 16) and h0c.shape == (16, 16)
    assert h0.dtype == jnp.complex64
    # independent draws: not simply conj-mirrors of each other
    assert not jnp.allclose(h0c, jnp.conj(h0))


def test_uv_random_matches_hlsl_frac_sin_hash():
    # spot-check the scalar recipe frac(sin(dot(uv+(s,r),(12.9898,78.233)))*43758.5453)
    u, v, s, r = 0.3, 0.7, 10.612, 1.5
    got = spectra.uv_random(np.float64(u), np.float64(v), s, r)
    expected = np.mod(
        np.sin((u + s) * 12.9898 + (v + r) * 78.233) * 43758.5453, 1.0)
    np.testing.assert_allclose(got, expected, rtol=1e-9)


def test_gpu_hash_h0_deterministic_and_shaped():
    """The shader-hash path (FFTCommon.cginc:37-41,87-99,
    InitialSpectrum.shader:42-54) — float32-faithful reimplementation."""
    from tpu_ocean.spectra import h0_pair_gpu_hash, uv_random
    h0, h0c = h0_pair_gpu_hash(32, 32.0, 0.001, (14.0, 12.0), 0.37, 0.81)
    h0b, h0cb = h0_pair_gpu_hash(32, 32.0, 0.001, (14.0, 12.0), 0.37, 0.81)
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h0b))
    np.testing.assert_array_equal(np.asarray(h0c), np.asarray(h0cb))
    assert h0.dtype == np.complex64
    assert np.isfinite(h0).all() and np.isfinite(h0c).all()
    # different seeds decorrelate
    h0d, _ = h0_pair_gpu_hash(32, 32.0, 0.001, (14.0, 12.0), 0.11, 0.93)
    assert not np.allclose(h0, h0d)
    # the hash stays in [0, 1)
    from tpu_ocean.spectra import uv_random_f32
    u = uv_random_f32(np.linspace(0, 1, 257), np.linspace(0, 1, 257),
                      10.612, 0.4)
    assert float(u.min()) >= 0.0 and float(u.max()) < 1.0


def test_gpu_hash_h0_energy_tracks_phillips():
    """E|h̃₀|² = P·E[ξ₁²+ξ₂²]/2 ≈ P: the hash-drawn spectrum's band energy
    must track the Phillips input (the hash RNG's Box–Muller is clamped, so
    its second moment is slightly below 1 — allow 0.7..1.3)."""
    from tpu_ocean.spectra import h0_pair_gpu_hash, phillips
    from tpu_ocean import grids
    n, length = 64, 512.0
    h0, _ = h0_pair_gpu_hash(n, length, 0.01, (20.0, 0.0), 0.5, 0.5)
    kx, kz, _ = grids.wavevector_grid(n, length, "fft")
    P = np.asarray(phillips(kx, kz, 0.01, (20.0, 0.0), 0.01))
    e = np.abs(np.asarray(h0)) ** 2
    mask = P > 1e-6 * P.max()
    ratio = (e[mask] / P[mask]).mean()
    assert 0.7 < ratio < 1.3, ratio
    # and exactly zero where Phillips is zero (the |k| < EPSILON cutoff)
    assert np.abs(np.asarray(h0))[P == 0].max() == 0.0


def test_jonswap_physical_sea_state():
    """JONSWAP at U=12 m/s, F=100 km must synthesize a sea with realistic
    Hs (1–5 m) and peak period (4–10 s), with energy zero upwind."""
    import jax
    from tpu_ocean.config import OceanConfig
    from tpu_ocean.solver import OceanSolver
    from tpu_ocean.diagnostics import significant_wave_height, peak_period
    from tpu_ocean.spectra import jonswap
    from tpu_ocean import grids

    cfg = OceanConfig(resolution=128, length=1000.0, wind=(12.0, 0.0),
                      amplitude=1.0, evolution_mode="phase",
                      dispersion_mode="capillary", spectrum_layout="fft",
                      normals_mode="stencil", spectrum_model="jonswap")
    s = OceanSolver(cfg)
    st = s.init(jax.random.PRNGKey(0))
    st, f = s.step(st, 1 / 60)
    hs = float(significant_wave_height(f.height))
    tp = peak_period(f.height, cfg.length)
    assert 1.0 < hs < 5.0, hs
    assert 4.0 < tp < 10.0, tp

    # upwind lobe is zero (cos² spreading clipped at 90°)
    kx, kz, _ = grids.wavevector_grid(64, 500.0, "fft")
    p = np.asarray(jonswap(kx, kz, 1.0, (10.0, 0.0), length=500.0))
    assert p[kx < 0].max() == 0.0
    assert p[(kx > 0) & (np.abs(kz) < 0.01)].max() > 0.0


def test_bad_spectrum_model_rejected():
    import pytest
    from tpu_ocean.config import OceanConfig
    with pytest.raises(ValueError, match="spectrum_model"):
        OceanConfig(spectrum_model="pierson")


def test_jonswap_spreading_and_tma():
    from tpu_ocean.spectra import jonswap
    from tpu_ocean import grids
    kx, kz, _ = grids.wavevector_grid(64, 500.0, "fft")
    wind = (10.0, 0.0)
    broad = np.asarray(jonswap(kx, kz, 1.0, wind, length=500.0, spreading=2))
    narrow = np.asarray(jonswap(kx, kz, 1.0, wind, length=500.0, spreading=16))
    # off-axis (45°) energy relative to on-axis must shrink with s
    on = (np.abs(kz) < 0.02) & (kx > 0.05)
    off = (np.abs(kx - kz) < 0.02) & (kx > 0.04)
    ratio_b = broad[off].mean() / broad[on].mean()
    ratio_n = narrow[off].mean() / narrow[on].mean()
    assert ratio_n < ratio_b * 0.5

    # TMA: shallow water strips the long (low-ω) waves, leaves short ones
    deep = np.asarray(jonswap(kx, kz, 1.0, wind, length=500.0))
    shallow = np.asarray(jonswap(kx, kz, 1.0, wind, length=500.0, depth=3.0))
    km = np.sqrt(kx ** 2 + kz ** 2)
    low = (km > 0) & (km < 0.05) & (kx > 0)
    assert shallow[low].sum() < 0.6 * deep[low].sum()
    assert np.all(shallow <= deep + 1e-12)
