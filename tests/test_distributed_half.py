"""Mirror-balanced distributed half-spectrum route
(fft.distributed.ifft2_x_sharded_half — D5 × the r4 C2R headline lever).

Parity claims under test, on the fake 8-device CPU mesh:
  * transform level — on ANY exactly-Hermitian spectrum the sharded half
    route equals the Re part of the full sharded transform, for every even
    shard count and BOTH storage regimes (transposed-store / natural-store
    + einsum column);
  * load balance is structural — every device row-transforms N/(2D) rows
    (lower devices directly, upper devices via the local conj/z-flip
    partner derivation), so there is no idle half to observe; what CAN be
    asserted is that the result is invariant in D;
  * solver level — DistributedOceanSolver(half_spectrum=True) matches its
    own non-half packed twin to f32 rounding (same topology on both sides,
    so the comparison isolates the C2R fold) and the single-device
    OceanSolver(half_spectrum=True) under the suite's standard tolerances.

Reference anchor: the symmetry is the one the reference's Stockham shader
packs two channels with (Stockham.shader:53-54); the distributed win is
that the last packed channel's all_to_all transpose volume halves."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
import pytest

from tpu_ocean.config import OceanConfig
from tpu_ocean.solver import OceanSolver
from tpu_ocean.solver_dist import DistributedOceanSolver
from tests.test_packing import _cfg, _pair, _assert_fields_close
from tests.test_half_spectrum import _hermitian_spectrum


def _mesh_d(d):
    devs = np.asarray(jax.devices()[:d]).reshape(1, d)
    return Mesh(devs, axis_names=("batch", "shard"))


def _sharded_half(re, im, mesh, cap=None):
    """Run ifft2_x_sharded_half under shard_map (X-sharded in, Z-sharded
    out), optionally forcing the natural-store regime via the cap."""
    from tpu_ocean.fft import distributed, pallas_fft

    def local(r, i):
        return distributed.ifft2_x_sharded_half(r, i, "shard")

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, "shard", None), P(None, "shard", None)),
                   out_specs=P(None, None, "shard"), check_vma=False)
    if cap is None:
        return np.asarray(fn(re, im))
    with pallas_fft.transposed_store_cap(cap):
        return np.asarray(fn(re, im))


@pytest.mark.parametrize("d", [2, 4, 8])
@pytest.mark.parametrize("regime", ["transposed", "natural"])
def test_sharded_half_matches_full_re(d, regime):
    from tpu_ocean.fft.pallas_fft import ifft2_planes_auto
    n = 128
    s = _hermitian_spectrum(n, c=1, seed=11)
    re = jnp.asarray(s.real, jnp.float32)
    im = jnp.asarray(s.imag, jnp.float32)
    fr, _ = ifft2_planes_auto(re, im, True)
    got = _sharded_half(re, im, _mesh_d(d),
                        cap=None if regime == "transposed" else 32)
    scale = np.abs(np.asarray(fr)).max()
    np.testing.assert_allclose(got, np.asarray(fr), atol=3e-5 * scale)


def test_sharded_half_d1_degenerate():
    """D == 1 reduces to the single-chip route exactly."""
    from tpu_ocean.fft.pallas_fft import ifft2_planes_half
    n = 64
    s = _hermitian_spectrum(n, c=1, seed=7)
    re = jnp.asarray(s.real, jnp.float32)
    im = jnp.asarray(s.imag, jnp.float32)
    want = np.asarray(ifft2_planes_half(re[:, :n // 2 + 1],
                                        im[:, :n // 2 + 1], True))
    got = _sharded_half(re, im, _mesh_d(1))
    np.testing.assert_allclose(got, want, atol=1e-6 * np.abs(want).max())


@pytest.mark.parametrize("normals", ["stencil", "spectral"])
def test_sharded_half_step_matches_nonhalf(normals):
    """Same topology both sides — isolates the C2R fold from the usual
    distributed-vs-single fp noise (one shared h0, CLAUDE.md)."""
    n = 128
    cfg = _cfg(n=n, normals=normals)
    h0, h0c = _pair(n)
    mesh = _mesh_d(8)
    kw = dict(fft_backend="pallas", real_state=True, pack_channels=True)
    ref = DistributedOceanSolver(cfg, mesh, **kw)
    got = DistributedOceanSolver(cfg, mesh, half_spectrum=True, **kw)
    s_ref = ref.init(h0=h0, h0_conj=h0c)
    s_got = got.init(h0=h0, h0_conj=h0c)
    for _ in range(2):
        s_ref, f_ref = ref.step(s_ref, 1 / 60)
        s_got, f_got = got.step(s_got, 1 / 60)
    _assert_fields_close(f_got, f_ref, 5e-6)


def test_sharded_half_step_matches_single_device():
    n = 128
    cfg = _cfg(n=n)
    h0, h0c = _pair(n)
    kw = dict(fft_backend="pallas", real_state=True, pack_channels=True,
              half_spectrum=True)
    single = OceanSolver(cfg, **kw)
    dist = DistributedOceanSolver(cfg, _mesh_d(8), **kw)
    s1 = single.init(h0=h0, h0_conj=h0c)
    s8 = dist.init(h0=h0, h0_conj=h0c)
    for _ in range(2):
        s1, f1 = single.step(s1, 1 / 60)
        s8, f8 = dist.step(s8, 1 / 60)
    tol = 2e-5 * np.abs(np.asarray(f1.height)).max()
    np.testing.assert_allclose(np.asarray(f8.height), np.asarray(f1.height),
                               atol=tol)
    np.testing.assert_allclose(np.asarray(f8.disp_z), np.asarray(f1.disp_z),
                               atol=tol)
    np.testing.assert_allclose(np.asarray(f8.foam), np.asarray(f1.foam),
                               atol=1e-4)


def test_sharded_half_validation():
    cfg = _cfg(n=64)
    mesh = _mesh_d(8)
    with pytest.raises(ValueError, match="pack_channels"):
        DistributedOceanSolver(cfg, mesh, fft_backend="pallas",
                               real_state=True, half_spectrum=True)
    with pytest.raises(ValueError, match="real_state|pallas"):
        DistributedOceanSolver(cfg, mesh, fft_backend="pallas_fused",
                               real_state=True, pack_channels=True,
                               half_spectrum=True)
    # N/(2D) = 4 rows per device: below the kernels' row-block floor
    with pytest.raises(ValueError, match="mirror-balanced"):
        DistributedOceanSolver(cfg, mesh, fft_backend="pallas",
                               real_state=True, pack_channels=True,
                               half_spectrum=True)


def test_half_row_perm_is_bijection():
    from tpu_ocean.fft.distributed import _half_row_perm
    for d, b in ((2, 16), (4, 8), (8, 32)):
        inv = _half_row_perm(d, b)
        assert sorted(inv.tolist()) == list(range(d * b // 2))


def test_ensemble_distributed_half_composition():
    """DP × SP × C2R: EnsembleDistributedSolver vmaps the sharded half
    step over the 'batch' axis — the mirror selection (axis_index) and the
    Nyquist all_gather must survive the spmd-vmapped composition."""
    from tpu_ocean.ensemble import EnsembleDistributedSolver
    cfg = _cfg(n=128)
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, axis_names=("batch", "shard"))
    es = EnsembleDistributedSolver(cfg, mesh, ensemble_size=2,
                                   fft_backend="pallas", real_state=True,
                                   pack_channels=True, half_spectrum=True)
    ref = EnsembleDistributedSolver(cfg, mesh, ensemble_size=2,
                                    fft_backend="pallas", real_state=True,
                                    pack_channels=True)
    key = jax.random.PRNGKey(0)
    s_a, s_b = es.init(key), ref.init(key)
    s_a, f_a = es.step(s_a, 1 / 60)
    s_b, f_b = ref.step(s_b, 1 / 60)
    h_a, h_b = np.asarray(f_a.height), np.asarray(f_b.height)
    assert h_a.shape == (2, cfg.resolution, cfg.resolution)
    np.testing.assert_allclose(h_a, h_b, atol=2e-5 * np.abs(h_b).max())
    # members differ (fold_in-seeded draws)
    assert np.abs(h_a[0] - h_a[1]).max() > 1e-3 * np.abs(h_a).max()


def test_sharded_half_velocity_matches_nonhalf():
    """velocity() under the sharded half route (v̂ exactly Hermitian under
    the packed projection) equals the non-half sharded velocity — same
    topology both sides, one shared h0."""
    n = 128
    cfg = _cfg(n=n)
    h0, h0c = _pair(n)
    mesh = _mesh_d(8)
    kw = dict(fft_backend="pallas", real_state=True, pack_channels=True)
    ref = DistributedOceanSolver(cfg, mesh, **kw)
    got = DistributedOceanSolver(cfg, mesh, half_spectrum=True, **kw)
    s_ref = ref.init(h0=h0, h0_conj=h0c)
    s_got = got.init(h0=h0, h0_conj=h0c)
    s_ref, _ = ref.step(s_ref, 1 / 60)
    s_got, _ = got.step(s_got, 1 / 60)
    v_ref = np.asarray(ref.velocity(s_ref))
    v_got = np.asarray(got.velocity(s_got))
    scale = max(np.abs(v_ref).max(), 1e-6)
    assert np.abs(v_got - v_ref).max() < 2e-5 * scale


def test_grad_through_sharded_half_adjoint_and_fd():
    """Differentiability of the mirror-balanced sharded C2R route
    (VERDICT r4 #4): (a) the shard_map program's VJP satisfies the
    dot-product adjoint identity ⟨F(x), y⟩ = ⟨x, Fᵀ(y)⟩; (b) a random
    directional derivative matches central finite differences."""
    n, d = 128, 4
    mesh = _mesh_d(d)
    s = _hermitian_spectrum(n, c=1, seed=23)
    re = jnp.asarray(s.real, jnp.float32)
    im = jnp.asarray(s.imag, jnp.float32)
    from tpu_ocean.fft import distributed
    from jax import shard_map as _sm

    def local(r, i):
        return distributed.ifft2_x_sharded_half(r, i, "shard")

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(None, "shard", None), P(None, "shard", None)),
                   out_specs=P(None, None, "shard"), check_vma=False)
    out, pull = jax.vjp(fn, re, im)
    rng = np.random.default_rng(3)
    ct = jnp.asarray(rng.standard_normal(out.shape), jnp.float32)
    gr, gi = pull(ct)
    assert np.isfinite(np.asarray(gr)).all()
    lhs = float(jnp.vdot(out, ct))
    rhs = float(jnp.vdot(re, gr) + jnp.vdot(im, gi))
    np.testing.assert_allclose(lhs, rhs, rtol=3e-5)

    # directional FD on sum(F·ct) along a random (vr, vi)
    vr = jnp.asarray(rng.standard_normal(re.shape), jnp.float32)
    vi = jnp.asarray(rng.standard_normal(im.shape), jnp.float32)

    def g(t):
        return float(jnp.vdot(fn(re + t * vr, im + t * vi), ct))

    eps = 1e-2
    fd = (g(eps) - g(-eps)) / (2 * eps)
    an = float(jnp.vdot(vr, gr) + jnp.vdot(vi, gi))
    np.testing.assert_allclose(fd, an, rtol=1e-3)


@pytest.mark.parametrize("d", [2, 4])
def test_sharded_half_radix2_column_regime(d):
    """The 8192²-regime sharded half route: column length M = N/2 above
    the (overridden) kernel cap with M % 256 == 0 routes through the
    radix-2 DIT mirror (fft/distributed.py) — shard-exact against the
    full single-device transform."""
    from tpu_ocean.fft import pallas_fft
    from tpu_ocean.fft.pallas_fft import ifft2_planes_auto
    n = 512                      # mh = 256 > cap 128; 256 % 256 == 0
    s = _hermitian_spectrum(n, c=1, seed=31)
    re = jnp.asarray(s.real, jnp.float32)
    im = jnp.asarray(s.imag, jnp.float32)
    fr, _ = ifft2_planes_auto(re, im, True)
    old_nat = pallas_fft.HALF_NAT_COLUMN_KERNEL
    try:
        pallas_fft.HALF_NAT_COLUMN_KERNEL = False   # close the direct door
        assert pallas_fft.HALF_COLUMN_RADIX2        # shipping default
        got = _sharded_half(re, im, _mesh_d(d), cap=128)
    finally:
        pallas_fft.HALF_NAT_COLUMN_KERNEL = old_nat
    scale = np.abs(np.asarray(fr)).max()
    np.testing.assert_allclose(got, np.asarray(fr), atol=3e-5 * scale)


def test_dist_reconfigure_preserves_half_and_reuses_step():
    """Review findings (r5): DistributedOceanSolver.reconfigure previously
    DROPPED half_spectrum on rebuild and recompiled the sharded step for
    init-only tweaks. Both fixed: flag preserved, compiled step shared."""
    from tpu_ocean.config import OceanConfig
    from tpu_ocean.solver_dist import DistributedOceanSolver
    cfg = OceanConfig(resolution=64, length=64.0, wind=(6.0, 4.0),
                      amplitude=0.1, evolution_mode="phase",
                      dispersion_mode="capillary", spectrum_layout="fft",
                      normals_mode="stencil")
    solver = DistributedOceanSolver(cfg, _mesh_d(2), fft_backend="pallas",
                                    real_state=True, pack_channels=True,
                                    half_spectrum=True, pallas_fields=True)
    st = solver.init(jax.random.PRNGKey(0))
    st, _ = solver.step(st, 1 / 60)
    # init-only change: same compiled step object, all switches kept
    s2, st2 = solver.reconfigure(st, cfg.replace(wind=(2.0, 1.0)))
    assert s2.half_spectrum and s2.pack_channels and s2.pallas_fields
    assert s2._step_jit is solver._step_jit        # no recompile
    np.testing.assert_array_equal(np.asarray(st2.phase),
                                  np.asarray(st.phase))
    st3, f = s2.step(st2, 1 / 60)
    assert np.isfinite(np.asarray(f.height)).all()
    # structural change: rebuild still carries half_spectrum
    s3, _ = solver.reconfigure(st, cfg.replace(length=128.0,
                                               choppiness=0.5))
    assert s3.half_spectrum and s3._step_jit is not solver._step_jit
