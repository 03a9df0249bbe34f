"""Half-spectrum (C2R) route (pallas_fft.ifft2_planes_half, VERDICT r3 #1):
the last packed channel's spectrum is exactly Hermitian, so its transform
computes spectral rows 0..N/2 only and folds the conjugate half analytically.

Parity claims under test:
  * transform level — on ANY Hermitian spectrum, the half route equals the
    Re part of the full complex transform (both storage regimes);
  * solver level — OceanSolver(..., half_spectrum=True) reproduces the
    packed solver's fields to f32 rounding (which itself matches unpacked,
    test_packing).
Reference anchor: the symmetry is the one the reference's Stockham shader
packs two channels with (Stockham.shader:53-54), applied per-transform."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpu_ocean.config import OceanConfig
from tpu_ocean.solver import OceanSolver
from tests.test_packing import _cfg, _pair, _assert_fields_close


def _hermitian_spectrum(n, c=1, seed=0, scale=0.3):
    """Random exactly-Hermitian [C, N, N] complex spectrum (numpy f64 →
    f32 planes)."""
    rng = np.random.default_rng(seed)
    s = scale * (rng.normal(size=(c, n, n)) + 1j * rng.normal(size=(c, n, n)))
    neg = (-np.arange(n)) % n
    s = 0.5 * (s + np.conj(s[:, np.ix_(neg, neg)[0], np.ix_(neg, neg)[1]]))
    return s


@pytest.mark.parametrize("n", [64, 256])
def test_half_transform_matches_full_re(n):
    from tpu_ocean.fft.pallas_fft import ifft2_planes_auto, ifft2_planes_half
    s = _hermitian_spectrum(n, c=2, seed=3)
    re = jnp.asarray(s.real, jnp.float32)
    im = jnp.asarray(s.imag, jnp.float32)
    fr, fi = ifft2_planes_auto(re, im, True)
    m = n // 2
    half = ifft2_planes_half(re[:, :m + 1], im[:, :m + 1], True)
    scale = np.abs(np.asarray(fr)).max()
    # full transform of a Hermitian spectrum is real: Im ≈ 0 pins the input
    assert np.abs(np.asarray(fi)).max() < 1e-4 * scale
    np.testing.assert_allclose(np.asarray(half), np.asarray(fr),
                               atol=2e-5 * scale)


def test_half_transform_natural_store_regime():
    """Force the large-N regime (natural-store row kernel + einsum column)
    at a small N via the public cap override — the 4096² code path."""
    from tpu_ocean.fft import pallas_fft
    n = 128
    s = _hermitian_spectrum(n, c=1, seed=5)
    re = jnp.asarray(s.real, jnp.float32)
    im = jnp.asarray(s.imag, jnp.float32)
    fr, _ = pallas_fft.ifft2_planes_auto(re, im, True)
    with pallas_fft.transposed_store_cap(32):
        half = pallas_fft.ifft2_planes_half(re[:, :n // 2 + 1],
                                            im[:, :n // 2 + 1], True)
    scale = np.abs(np.asarray(fr)).max()
    np.testing.assert_allclose(np.asarray(half), np.asarray(fr),
                               atol=2e-5 * scale)


def test_half_transform_validates_input():
    from tpu_ocean.fft.pallas_fft import ifft2_planes_half
    x = jnp.zeros((1, 30, 64), jnp.float32)
    with pytest.raises(ValueError, match="N/2"):
        ifft2_planes_half(x, x, True)
    y = jnp.zeros((1, 33, 64), jnp.float32)
    with pytest.raises(NotImplementedError):
        ifft2_planes_half(y, y, inverse=False)


@pytest.mark.parametrize("normals,fields_kernel,backend", [
    ("stencil", False, "pallas"), ("stencil", True, "pallas"),
    ("spectral", False, "pallas"),
    ("stencil", False, "pallas_fused"), ("stencil", True, "pallas_fused"),
    ("spectral", False, "pallas_fused")])
def test_half_spectrum_step_matches_packed(normals, fields_kernel, backend):
    """Flagship-shaped parity: half_spectrum vs plain packed on the SAME
    injected h0 (CLAUDE.md: one shared h0, never independent draws).
    'pallas_fused' rides ifft2_fused_planes_half — in-kernel assembly
    composed with the C2R fold."""
    cfg = _cfg(n=64, normals=normals)
    h0, h0c = _pair(64)
    kw = dict(real_state=True, pack_channels=True,
              pallas_fields=fields_kernel)
    ref = OceanSolver(cfg, fft_backend="pallas", **kw)
    got = OceanSolver(cfg, fft_backend=backend, half_spectrum=True, **kw)
    s_ref = ref.init(h0=h0, h0_conj=h0c)
    s_got = got.init(h0=h0, h0_conj=h0c)
    for _ in range(3):
        s_ref, f_ref = ref.step(s_ref, 1 / 60)
        s_got, f_got = got.step(s_got, 1 / 60)
    _assert_fields_close(f_got, f_ref, 5e-6)


def test_half_spectrum_fused_natural_store_regime():
    """Fused half route in the LARGE-N regime (natural-store fused row
    kernel + einsum column at length N/2 — the 4096² path), forced at a
    small N via the public cap override."""
    from tpu_ocean.fft import pallas_fft
    cfg = _cfg(n=128)
    h0, h0c = _pair(128)
    kw = dict(real_state=True, pack_channels=True, half_spectrum=True)
    ref = OceanSolver(cfg, fft_backend="pallas", **kw)
    s_ref = ref.init(h0=h0, h0_conj=h0c)
    s_ref, f_ref = ref.step(s_ref, 1 / 60)
    with pallas_fft.transposed_store_cap(32):
        got = OceanSolver(cfg, fft_backend="pallas_fused", **kw)
        s_got = got.init(h0=h0, h0_conj=h0c)
        s_got, f_got = got.step(s_got, 1 / 60)
    _assert_fields_close(f_got, f_ref, 5e-6)


def test_half_spectrum_validation():
    cfg = _cfg(n=64)
    with pytest.raises(ValueError, match="pack_channels"):
        OceanSolver(cfg, fft_backend="pallas", real_state=True,
                    half_spectrum=True)
    with pytest.raises(ValueError, match="real_state"):
        OceanSolver(cfg, fft_backend="pallas", pack_channels=True,
                    half_spectrum=True)
    with pytest.raises(ValueError, match="real_state|pallas"):
        OceanSolver(cfg, fft_backend="matmul", real_state=True,
                    pack_channels=True, half_spectrum=True)
    with pytest.raises(ValueError, match="resolution"):
        OceanSolver(_cfg(n=24), fft_backend="pallas", real_state=True,
                    pack_channels=True, half_spectrum=True)


def test_half_spectrum_simulation_passthrough(tmp_path):
    """Simulation(**solver_kw) carries the switch; checkpoint/resume keeps
    the trajectory bitwise (same wire format — no new state)."""
    from tpu_ocean.runtime import Simulation
    cfg = _cfg(n=64)
    kw = dict(fft_backend="pallas", real_state=True, pack_channels=True,
              half_spectrum=True)
    sim = Simulation(cfg, out_dir=str(tmp_path), checkpoint_every=2, **kw)
    assert sim.solver.half_spectrum
    sim.run(2)
    sim.close()
    sim2 = Simulation(cfg, out_dir=str(tmp_path), checkpoint_every=2, **kw)
    assert sim2.step_count == 2
    f_a = sim.step()
    f_b = sim2.step()
    np.testing.assert_array_equal(np.asarray(f_a.height),
                                  np.asarray(f_b.height))
    sim2.close()


@pytest.mark.parametrize("normals", ["stencil", "spectral"])
def test_half_spectrum_cascade_matches_packed(normals):
    """CascadeSolver(half_spectrum=True): every band's last packed channel
    rides ONE batched C2R transform over the band axis (B triples on B×1.5
    transform-equivalents) — fields match the plain packed cascade on the
    same seeded draw (bit-identical init, cascade.py real-state contract)."""
    import dataclasses
    from tpu_ocean.cascade import CascadeSolver, default_cascade
    cfgs = [dataclasses.replace(c, normals_mode=normals)
            for c in default_cascade(n=64, lengths=(100.0, 13.0))]
    kw = dict(fft_backend="pallas", real_state=True, pack_channels=True)
    ref = CascadeSolver(cfgs, **kw)
    got = CascadeSolver(cfgs, half_spectrum=True, **kw)
    key = jax.random.PRNGKey(11)
    s_ref, s_got = ref.init(key), got.init(key)
    np.testing.assert_array_equal(np.asarray(s_ref.h0_re),
                                  np.asarray(s_got.h0_re))
    for _ in range(3):
        s_ref, f_ref = ref.step(s_ref, 1 / 60)
        s_got, f_got = got.step(s_got, 1 / 60)
    _assert_fields_close(f_got, f_ref, 5e-6)


def test_half_spectrum_lod_cascade_and_reconfigure():
    """LODCascadeSolver threads the switch into its inner cascade (the
    subset refresh path reuses _real_planes, so LOD frames ride the C2R
    fold too); structural reconfigure PRESERVES the switch."""
    import dataclasses
    from tpu_ocean.cascade import CascadeSolver, default_cascade
    from tpu_ocean.lod import LODCascadeSolver
    cfgs = default_cascade(n=64, lengths=(100.0, 13.0))
    kw = dict(fft_backend="pallas", real_state=True, pack_channels=True,
              half_spectrum=True)
    ref = LODCascadeSolver(cfgs, periods=(1, 2), **kw)
    plain = LODCascadeSolver(cfgs, periods=(1, 2),
                             fft_backend="pallas", real_state=True,
                             pack_channels=True)
    assert ref.inner.half_spectrum
    s_a, s_b = ref.init(jax.random.PRNGKey(3)), plain.init(
        jax.random.PRNGKey(3))
    for _ in range(3):
        s_a, f_a = ref.step(s_a)
        s_b, f_b = plain.step(s_b)
    _assert_fields_close(f_a, f_b, 5e-6)
    # structural rebuild (choppiness is NOT init-only) keeps half_spectrum
    flat = CascadeSolver(cfgs, **kw)
    st = flat.init(jax.random.PRNGKey(3))
    new_cfgs = [dataclasses.replace(c, choppiness=0.9) for c in cfgs]
    solver2, _ = flat.reconfigure(st, new_cfgs)
    assert solver2.half_spectrum


def test_half_spectrum_cascade_validation():
    from tpu_ocean.cascade import CascadeSolver, default_cascade
    cfgs = default_cascade(n=64, lengths=(100.0, 13.0))
    with pytest.raises(ValueError, match="pack_channels"):
        CascadeSolver(cfgs, fft_backend="pallas", real_state=True,
                      half_spectrum=True)
    with pytest.raises(ValueError, match="real_state"):
        CascadeSolver(cfgs, fft_backend="pallas", pack_channels=True,
                      half_spectrum=True)
    bad = default_cascade(n=24, lengths=(100.0,))
    with pytest.raises(ValueError, match="resolution|real_state|pallas"):
        CascadeSolver(bad, fft_backend="pallas", real_state=True,
                      pack_channels=True, half_spectrum=True)


def test_half_spectrum_cascade_simulation_passthrough(tmp_path):
    """CascadeSimulation carries the switch to both the flat and the LOD
    solver; checkpoint/resume keeps the trajectory bitwise."""
    from tpu_ocean.cascade import default_cascade
    from tpu_ocean.runtime import CascadeSimulation
    cfgs = default_cascade(n=64, lengths=(100.0, 13.0))
    kw = dict(fft_backend="pallas", real_state=True, pack_channels=True,
              half_spectrum=True)
    sim = CascadeSimulation(cfgs, out_dir=str(tmp_path),
                            checkpoint_every=2, **kw)
    assert sim.solver.half_spectrum
    sim.run(2)
    sim.close()
    sim2 = CascadeSimulation(cfgs, out_dir=str(tmp_path),
                             checkpoint_every=2, **kw)
    f_a = sim.step()
    f_b = sim2.step()
    np.testing.assert_array_equal(np.asarray(f_a.height),
                                  np.asarray(f_b.height))
    sim2.close()
    lod = CascadeSimulation(cfgs, camera_distance=300.0, **kw)
    assert lod.solver.inner.half_spectrum
    f = lod.step()
    assert np.isfinite(np.asarray(f.height)).all()
    lod.close()


def test_half_spectrum_velocity_matches_packed():
    """velocity() under half_spectrum rides the C2R transform (v̂ is
    exactly Hermitian under the packed projection — the same symmetry as
    the height channel); values match the packed solver's velocity."""
    cfg = _cfg(n=64)
    h0, h0c = _pair(64)
    kw = dict(fft_backend="pallas", real_state=True, pack_channels=True)
    ref = OceanSolver(cfg, **kw)
    got = OceanSolver(cfg, half_spectrum=True, **kw)
    s_ref = ref.init(h0=h0, h0_conj=h0c)
    s_got = got.init(h0=h0, h0_conj=h0c)
    s_ref, _ = ref.step(s_ref, 1 / 60)
    s_got, _ = got.step(s_got, 1 / 60)
    v_ref = np.asarray(ref.velocity(s_ref))
    v_got = np.asarray(got.velocity(s_got))
    scale = max(np.abs(v_ref).max(), 1e-6)
    assert np.abs(v_got - v_ref).max() < 5e-6 * scale


def test_half_spectrum_cascade_velocity_matches_packed():
    from tpu_ocean.cascade import CascadeSolver, default_cascade
    cfgs = default_cascade(n=64, lengths=(100.0, 13.0))
    kw = dict(fft_backend="pallas", real_state=True, pack_channels=True)
    ref = CascadeSolver(cfgs, **kw)
    got = CascadeSolver(cfgs, half_spectrum=True, **kw)
    key = jax.random.PRNGKey(4)
    s_ref, s_got = ref.init(key), got.init(key)
    s_ref, _ = ref.step(s_ref, 1 / 60)
    s_got, _ = got.step(s_got, 1 / 60)
    v_ref = np.asarray(ref.velocity(s_ref))
    v_got = np.asarray(got.velocity(s_got))
    scale = max(np.abs(v_ref).max(), 1e-6)
    assert np.abs(v_got - v_ref).max() < 5e-6 * scale


def test_half_natural_regime_kernel_column():
    """Natural-store half route with the COLUMN pass on the transposed-
    store kernel (HALF_NAT_COLUMN_KERNEL): the C2R fold halves the column
    length, so at 4096² it fits the fused kernel's envelope while the full
    path's column cannot. Forced at a small N: cap 64 routes N=128 through
    the natural regime AND keeps M=64 ≤ cap for the kernel column."""
    from tpu_ocean.fft import pallas_fft
    n = 128
    s = _hermitian_spectrum(n, c=2, seed=11)
    re = jnp.asarray(s.real, jnp.float32)
    im = jnp.asarray(s.imag, jnp.float32)
    fr, _ = pallas_fft.ifft2_planes_auto(re, im, True)
    assert pallas_fft.HALF_NAT_COLUMN_KERNEL
    with pallas_fft.transposed_store_cap(64):
        half = pallas_fft.ifft2_planes_half(re[:, :n // 2 + 1],
                                            im[:, :n // 2 + 1], True)
    scale = np.abs(np.asarray(fr)).max()
    np.testing.assert_allclose(np.asarray(half), np.asarray(fr),
                               atol=2e-5 * scale)


def test_full_column_radix2_kernel_matches_einsum(monkeypatch):
    """Large-N FULL transform with the radix-2 DIT column engine
    (COLUMN_RADIX2_KERNEL — kept implemented but DISABLED by default, a
    measured hardware loss: bench/PROBE_r4_column_radix2.json): two
    half-length transposed-store kernel calls + one twiddle butterfly
    replace the einsum column pass. Forced small: cap 64 routes N=128
    through the natural regime with M/2 = 64 ≤ cap."""
    from tpu_ocean.fft import pallas_fft
    n = 128
    s = _hermitian_spectrum(n, c=2, seed=13)
    # a GENERAL complex spectrum (not Hermitian): perturb asymmetry
    s = s + 0.3j * np.random.default_rng(5).normal(size=s.shape)
    re = jnp.asarray(s.real, jnp.float32)
    im = jnp.asarray(s.imag, jnp.float32)
    want_r, want_i = pallas_fft.ifft2_planes_auto(re, im, True)
    monkeypatch.setattr(pallas_fft, "COLUMN_RADIX2_KERNEL", True)
    with pallas_fft.transposed_store_cap(64):
        got_r, got_i = pallas_fft.ifft2_planes_auto(re, im, True)
    scale = np.abs(np.asarray(want_r)).max()
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               atol=2e-5 * scale)
    # forward direction too (the butterfly's sign path)
    monkeypatch.setattr(pallas_fft, "COLUMN_RADIX2_KERNEL", False)
    fw_r, fw_i = pallas_fft.ifft2_planes_auto(re, im, False)
    monkeypatch.setattr(pallas_fft, "COLUMN_RADIX2_KERNEL", True)
    with pallas_fft.transposed_store_cap(64):
        fg_r, fg_i = pallas_fft.ifft2_planes_auto(re, im, False)
    np.testing.assert_allclose(np.asarray(fg_r), np.asarray(fw_r),
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(fg_i), np.asarray(fw_i),
                               atol=2e-5 * scale)


def test_half_column_radix2_matches_einsum_route():
    """The 8192²-regime half-column radix-2 DIT (two M/2 kernel columns +
    butterfly — pallas_fft.HALF_COLUMN_RADIX2) is numerically exact
    against the default route; forced at a small size via the cap
    override. Default ON in its regime per the hardware A/B — 58.97 vs
    64.21 ms at 8192² (bench/PROBE_r5_half_radix2_8192.json)."""
    from tpu_ocean.fft import pallas_fft as pf
    n = 512
    s = _hermitian_spectrum(n, c=1, seed=3)
    re = jnp.asarray(s.real, jnp.float32)
    im = jnp.asarray(s.imag, jnp.float32)
    m = n // 2
    want = pf.ifft2_planes_half(re[:, :m + 1], im[:, :m + 1], True)
    old = pf.HALF_COLUMN_RADIX2, pf.HALF_NAT_COLUMN_KERNEL
    try:
        pf.HALF_COLUMN_RADIX2 = True
        pf.HALF_NAT_COLUMN_KERNEL = False     # close the direct kernel door
        with pf.transposed_store_cap(128):    # m=256 > cap → natural regime
            got = pf.ifft2_planes_half(re[:, :m + 1], im[:, :m + 1], True)
    finally:
        pf.HALF_COLUMN_RADIX2, pf.HALF_NAT_COLUMN_KERNEL = old
    scale = np.abs(np.asarray(want)).max()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5 * scale)
