"""Pallas kernel unit tests (interpret mode on the fake-CPU mesh) against
their pure-jnp twins — SURVEY.md §4.4 kernel-level testing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_ocean.fft.pallas_fft import ifft2_pallas, fft2_pallas
from tpu_ocean.config import PondConfig
from tpu_ocean import grids
from tpu_ocean.gerstner import (
    WaveBank, gerstner_eval, PondSolver)
from tpu_ocean.ops.gerstner_pallas import gerstner_pallas


@pytest.mark.parametrize("n", [16, 64, 256])
def test_pallas_ifft2_matches_fft(n):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((5, n, n))
         + 1j * rng.standard_normal((5, n, n))).astype(np.complex64)
    ref = np.fft.ifft2(x) * (n * n)
    got = np.asarray(ifft2_pallas(jnp.asarray(x)))
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(got - ref)) / scale < 1e-5


def test_pallas_fft2_forward():
    n = 64
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((2, n, n))
         + 1j * rng.standard_normal((2, n, n))).astype(np.complex64)
    ref = np.fft.fft2(x)
    got = np.asarray(fft2_pallas(jnp.asarray(x)))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-5


def test_pallas_ifft2_rectangular_batch():
    n = 32
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((3, n, n))
         + 1j * rng.standard_normal((3, n, n))).astype(np.complex64)
    ref = np.fft.ifft2(x) * (n * n)
    got = np.asarray(ifft2_pallas(jnp.asarray(x)))
    assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-5


@pytest.mark.parametrize("mode", ["analytic", "flat"])
def test_gerstner_pallas_matches_jnp(mode):
    cfg = PondConfig(resolution=64)
    bank = WaveBank.random(7, 16)
    x, z = grids.coordinate_grid(64, 1.0)
    x = jnp.asarray(x, jnp.float32)
    z = jnp.asarray(z, jnp.float32)
    ref = gerstner_eval(bank, x, z, 2.3, mode)
    got = gerstner_pallas(bank, x, z, 2.3, mode)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-5)


def test_pond_solver_pallas_path():
    cfg = PondConfig(resolution=64)
    ref = PondSolver(cfg, use_pallas=False).fields(1.0)
    got = PondSolver(cfg, use_pallas=True).fields(1.0)
    np.testing.assert_allclose(np.asarray(got.offset_y),
                               np.asarray(ref.offset_y), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got.normal),
                               np.asarray(ref.normal), atol=2e-5)


def test_solver_pallas_backend_matches_reference_backend():
    from tpu_ocean.config import OceanConfig
    from tpu_ocean.solver import OceanSolver
    cfg = OceanConfig(resolution=64, length=64.0, wind=(7.0, 4.0),
                      amplitude=0.2, evolution_mode="phase",
                      dispersion_mode="capillary", spectrum_layout="fft",
                      normals_mode="stencil")
    key = jax.random.PRNGKey(5)
    s_ref = OceanSolver(cfg, fft_backend="reference")
    s_pal = OceanSolver(cfg, fft_backend="pallas")
    st_r = s_ref.init(key)
    st_p = s_pal.init(key)
    for _ in range(3):
        st_r, f_r = s_ref.step(st_r, 1 / 60)
        st_p, f_p = s_pal.step(st_p, 1 / 60)
    scale = np.max(np.abs(np.asarray(f_r.height))) + 1e-12
    assert np.max(np.abs(np.asarray(f_p.height)
                         - np.asarray(f_r.height))) / scale < 1e-4


def test_fused_assembly_fft_matches_reference_backend():
    from tpu_ocean.config import OceanConfig
    from tpu_ocean.solver import OceanSolver
    cfg = OceanConfig(resolution=64, length=64.0, wind=(7.0, 4.0),
                      amplitude=0.2, evolution_mode="phase",
                      dispersion_mode="capillary", spectrum_layout="fft",
                      normals_mode="stencil")
    key = jax.random.PRNGKey(5)
    s_ref = OceanSolver(cfg, fft_backend="reference")
    s_fus = OceanSolver(cfg, fft_backend="pallas_fused")
    st_r = s_ref.init(key)
    st_f = s_fus.init(key)
    for _ in range(3):
        st_r, f_r = s_ref.step(st_r, 1 / 60)
        st_f, f_f = s_fus.step(st_f, 1 / 60)
    for name in ("height", "disp_x", "disp_z", "foam", "jacobian"):
        a = np.asarray(getattr(f_r, name))
        b = np.asarray(getattr(f_f, name))
        scale = np.max(np.abs(a)) + 1e-12
        assert np.max(np.abs(a - b)) / scale < 1e-4, name
    # recurrent phase must evolve identically
    np.testing.assert_array_equal(np.asarray(st_r.phase),
                                  np.asarray(st_f.phase))


def test_fused_requires_fft_layout():
    from tpu_ocean.config import OceanConfig
    from tpu_ocean.solver import OceanSolver
    cfg = OceanConfig(resolution=16, length=16.0, wind=(5.0, 3.0),
                      amplitude=0.01, spectrum_layout="centered")
    with pytest.raises(ValueError, match="pallas_fused"):
        OceanSolver(cfg, fft_backend="pallas_fused")


# (the k1-tiled transposed-store variant this file once tested was deleted
# after hardware probing proved its VMEM/lane window is empty on v5e — see
# pallas_fft.ifft2_planes_auto; the large-N route is covered below)


def test_fields_pallas_matches_jnp_twins():
    from tpu_ocean.ops.fields_pallas import fields_pallas
    from tpu_ocean import fields as field_ops
    rng = np.random.default_rng(1)
    n = 64
    dx = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    dz = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    normal, foam, jac = fields_pallas(dx, h, dz, 0.5)
    ref_n = field_ops.normals_stencil(dx, h, dz, 0.5)
    ref_f, ref_j = field_ops.whitecap_gpu(dx, dz, ref_n)
    np.testing.assert_allclose(np.asarray(normal), np.asarray(ref_n),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(foam), np.asarray(ref_f), atol=1e-5)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(ref_j), atol=1e-5)


def test_solver_pallas_fields_matches_default():
    from tpu_ocean.config import OceanConfig
    from tpu_ocean.solver import OceanSolver
    cfg = OceanConfig(resolution=64, length=64.0, wind=(7.0, 4.0),
                      amplitude=0.3, evolution_mode="phase",
                      dispersion_mode="capillary", spectrum_layout="fft",
                      normals_mode="stencil")
    key = jax.random.PRNGKey(3)
    a = OceanSolver(cfg)
    b = OceanSolver(cfg, pallas_fields=True)
    sa, sb = a.init(key), b.init(key)
    for _ in range(2):
        sa, fa = a.step(sa, 1 / 60)
        sb, fb = b.step(sb, 1 / 60)
    np.testing.assert_allclose(np.asarray(fb.normal), np.asarray(fa.normal),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(fb.foam), np.asarray(fa.foam),
                               atol=1e-5)
    with pytest.raises(ValueError, match="pallas_fields"):
        OceanSolver(cfg.replace(normals_mode="spectral"), pallas_fields=True)


def test_large_n_planes_path_matches_plain(monkeypatch):
    """N > MAX_PALLAS_N route: tiled natural-store row pass + axis(-2)
    einsum column pass == the plain transposed-store 2-D path. Forced at a
    small N by lowering the cap (the dispatch reads the module global)."""
    import tpu_ocean.fft.pallas_fft as pf
    rng = np.random.RandomState(3)
    n = 256
    re = jnp.asarray(rng.randn(2, n, n), jnp.float32)
    im = jnp.asarray(rng.randn(2, n, n), jnp.float32)
    want_r, want_i = pf.ifft2_planes_auto(re, im)
    monkeypatch.setattr(pf, "MAX_PALLAS_N", 128)
    got_r, got_i = pf.ifft2_planes_auto(re, im)
    scale = float(jnp.max(jnp.abs(want_r)))
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               atol=2e-5 * scale)


def test_axis2_einsum_matches_numpy():
    from tpu_ocean.fft.matmul import ifft1d_planes_axis2
    rng = np.random.RandomState(4)
    n = 128
    re = jnp.asarray(rng.randn(2, n, n), jnp.float32)
    im = jnp.asarray(rng.randn(2, n, n), jnp.float32)
    ar, ai = ifft1d_planes_axis2(re, im)
    want = np.fft.ifft(np.asarray(re) + 1j * np.asarray(im), axis=-2) * n
    np.testing.assert_allclose(np.asarray(ar) + 1j * np.asarray(ai), want,
                               atol=2e-4)


def test_large_n_fused_planes_matches_plain(monkeypatch):
    import tpu_ocean.ops.fused_spectrum_fft as fsf
    rng = np.random.RandomState(5)
    n = 256
    h0 = tuple(jnp.asarray(rng.randn(n, n), jnp.float32) for _ in range(4))
    ph = jnp.asarray(rng.rand(n, n) * 6.28, jnp.float32)
    want_r, want_i = fsf.ifft2_fused_planes(h0, ph, 100.0, 1.0, ch_count=3)
    monkeypatch.setattr(fsf, "MAX_FUSED_N", 128)
    got_r, got_i = fsf.ifft2_fused_planes(h0, ph, 100.0, 1.0, ch_count=3)
    scale = float(jnp.max(jnp.abs(want_r)))
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               atol=2e-5 * scale)




def test_b3_precision_sentinel_matches_highest():
    """The explicit bf16x3 kernel tier (pallas_fft.B3) tracks HIGHEST to the
    split-emulation floor (~1e-5). Default-off — the v5e probe measured it
    SLOWER than HIGHEST (bench/PROBE_r3_precision_tier.json) — but the path
    stays green for toolchains where 3-pass dots do pay."""
    from tpu_ocean.fft import pallas_fft as pf
    n = 64
    rng = np.random.default_rng(7)
    re = jnp.asarray(rng.standard_normal((2, n, n)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((2, n, n)), jnp.float32)
    ar, ai = pf.ifft2_planes_auto(re, im, True)            # HIGHEST
    br, bi = pf.ifft2_planes_auto(re, im, True, precision=pf.B3)
    scale = float(jnp.max(jnp.abs(ar)))
    assert float(jnp.max(jnp.abs(ar - br))) / scale < 5e-5
    assert float(jnp.max(jnp.abs(ai - bi))) / scale < 5e-5
    # the sentinel maps to native HIGH on the einsum helpers
    from tpu_ocean.fft.matmul import _einsum_f32_precision
    assert _einsum_f32_precision(pf.B3) == jax.lax.Precision.HIGH


def test_three_factor_stage2_matches_plain():
    """The 3-factor stage-2 split (pallas_fft._stage2_split3) is fp32-exact
    against the plain kernel and numpy. Default-off — measured SLOWER on v5e
    (pass-fixed-cost bound MXU, bench/PROBE_r3_three_factor.json) — but the
    path stays green for hardware where small-dot issue is cheap."""
    from tpu_ocean.fft import pallas_fft as pf
    n = 1024
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((1, n, n))
         + 1j * rng.standard_normal((1, n, n))).astype(np.complex64)
    re, im = jnp.asarray(x.real), jnp.asarray(x.imag)
    old = pf.THREE_FACTOR_THRESHOLD
    try:
        pf.THREE_FACTOR_THRESHOLD = 512
        assert pf._use_split3(n, 128)
        ar, ai = pf.ifft2_planes_auto(re, im, True)
    finally:
        pf.THREE_FACTOR_THRESHOLD = old
    got = np.asarray(ar) + 1j * np.asarray(ai)
    want = np.fft.ifft2(x) * (n * n)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def test_fields_pallas_v2_matches_twins_and_v1():
    """r5 halo-free fields kernel (cross-product identity + boundary-row
    blocking — ops/fields_pallas.py v2 section): output-equal to the v1
    kernel and the jnp twins up to fp reassociation, at several block
    sizes including non-divisible-by-16 grids."""
    from tpu_ocean.ops.fields_pallas import fields_pallas, fields_pallas_v2
    from tpu_ocean import fields as field_ops
    rng = np.random.default_rng(3)
    n = 64
    dx = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    h = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    dz = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    ref_n = field_ops.normals_stencil(dx, h, dz, 0.5)
    ref_f, ref_j = field_ops.whitecap_gpu(dx, dz, ref_n)
    for r in (0, 8, 32):
        normal, foam, jac = fields_pallas_v2(dx, h, dz, 0.5, block_rows=r)
        np.testing.assert_allclose(np.asarray(normal), np.asarray(ref_n),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(foam), np.asarray(ref_f),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(jac), np.asarray(ref_j),
                                   atol=2e-5)
    v1 = fields_pallas(dx, h, dz, 0.5)
    v2 = fields_pallas_v2(dx, h, dz, 0.5)
    for a, b in zip(v1, v2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    with pytest.raises(ValueError, match="divide"):
        fields_pallas_v2(dx, h, dz, 0.5, block_rows=48)
