"""Small-N hardware routes (probed r4 on the real chip).

Mosaic's 128-lane rule bounds the transposed-store kernels from BELOW as
well as above: at any N not divisible by 128 the lane-merging reshape is
rejected on hardware ("infer-vector-layout: unsupported shape cast" at
N = 64; non-divisible block shapes at N = 192) even though interpret mode
accepts it — so the CPU suite alone cannot catch the hole. The library
routes around it on hardware:

  * ifft2_planes_auto: N % 128 != 0 → einsum four-step on both axes;
  * ifft2_planes_half: N < HALF_MIN_PALLAS_N → mirror the conjugate rows,
    ride the full transform (the C2R fold's length M = N/2 must itself
    fill the 128 lanes);
  * OceanSolver: 'pallas_fused' at N % 128 != 0 → 'pallas' (the low-end
    twin of the PALLAS_PLAIN_ROUTE_N high-end route).

The routes key on ``jax.default_backend() != "cpu"`` — the same predicate
the kernels use for interpret mode — so these tests force the hardware
branch by patching that predicate; every branch they take is Pallas-free
by construction, which is exactly the point of the routes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_half_spectrum import _hermitian_spectrum


def _patched_tpu(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")


@pytest.mark.parametrize("n", [64, 192])
def test_auto_small_n_einsum_route_matches_kernel(n, monkeypatch):
    from tpu_ocean.fft import pallas_fft
    s = _hermitian_spectrum(n, c=2, seed=7)
    re = jnp.asarray(s.real, jnp.float32)
    im = jnp.asarray(s.imag, jnp.float32)
    want_r, want_i = pallas_fft.ifft2_planes_auto(re, im, True)
    _patched_tpu(monkeypatch)
    got_r, got_i = pallas_fft.ifft2_planes_auto(re, im, True)
    scale = np.abs(np.asarray(want_r)).max()
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(want_r),
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(want_i),
                               atol=2e-5 * scale)


@pytest.mark.parametrize("n", [64])
def test_half_small_n_mirror_route_matches_kernel(n, monkeypatch):
    # n = 64 only: under the patched predicate the mirrored full transform
    # at n = 128 (lane-divisible) correctly takes the REAL kernel branch,
    # which cannot execute on CPU — that case was verified live on the v5e
    # (r4 probe: half N=128 OK, rel err ≤ 2e-5).
    from tpu_ocean.fft import pallas_fft
    assert n < pallas_fft.HALF_MIN_PALLAS_N
    s = _hermitian_spectrum(n, c=2, seed=9)
    re = jnp.asarray(s.real, jnp.float32)
    im = jnp.asarray(s.imag, jnp.float32)
    m = n // 2
    want = pallas_fft.ifft2_planes_half(re[:, :m + 1], im[:, :m + 1], True)
    _patched_tpu(monkeypatch)
    got = pallas_fft.ifft2_planes_half(re[:, :m + 1], im[:, :m + 1], True)
    scale = np.abs(np.asarray(want)).max()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5 * scale)


@pytest.mark.parametrize("n", [320])
def test_half_non_lane_multiple_routes_to_mirror(n, monkeypatch):
    """N ≥ HALF_MIN_PALLAS_N with N % 128 != 0 (valid for the solver's
    N % 16 check, e.g. 320): the half route must mirror + ride the full
    auto transform on hardware — the transposed regime's non-128 lane
    split is Mosaic-rejected (ADVICE r4 medium). The mirror branch is
    Pallas-free under the patched predicate (auto sends N % 128 to the
    einsum four-step), so it executes here."""
    from tpu_ocean.fft import pallas_fft
    assert n >= pallas_fft.HALF_MIN_PALLAS_N and n % 128
    s = _hermitian_spectrum(n, c=2, seed=11)
    re = jnp.asarray(s.real, jnp.float32)
    im = jnp.asarray(s.imag, jnp.float32)
    m = n // 2
    want = pallas_fft.ifft2_planes_half(re[:, :m + 1], im[:, :m + 1], True)
    _patched_tpu(monkeypatch)
    got = pallas_fft.ifft2_planes_half(re[:, :m + 1], im[:, :m + 1], True)
    scale = np.abs(np.asarray(want)).max()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5 * scale)


@pytest.mark.parametrize("n", [128, 384])
def test_fused_half_small_n_falls_back_to_full_pipeline(monkeypatch, n):
    """ifft2_fused_planes_half must ride the full fused pipeline whenever
    the FOLD length M = N/2 is not kernel-legal: N < HALF_MIN_PALLAS_N
    (ADVICE r4 — at N = 128 the solver's N % 128 reroute does NOT fire)
    and N ≡ 128 (mod 256), e.g. 384, where M = 192 breaks the 128-lane
    rule (review finding, r5). The full pipeline's kernels can't execute
    on CPU under the patched predicate, so the gate is checked with a
    recording stub; the fallback identity itself (Hermitian last channel
    → full transform's Re is the field) is covered numerically by
    test_half_spectrum_step_matches_packed."""
    from tpu_ocean.ops import fused_spectrum_fft as fsf
    ch = 2
    called = {}

    def stub(h0_pair, phase, length, dz_sign, **kw):
        called.update(kw)
        re = jnp.arange(ch * n * n, dtype=jnp.float32).reshape(ch, n, n)
        return re, re + 1.0
    monkeypatch.setattr(fsf, "ifft2_fused_planes", stub)
    _patched_tpu(monkeypatch)
    pair = tuple(jnp.zeros((n, n), jnp.float32) for _ in range(4))
    phase = jnp.zeros((n, n), jnp.float32)
    re_f, im_f, last = fsf.ifft2_fused_planes_half(
        pair, phase, float(n), 1.0, np.zeros((2 * ch, 1, n), np.float32),
        ch_count=ch)
    assert called["ch_count"] == ch and called["packed"] is True
    assert re_f.shape == (ch - 1, n, n) and last.shape == (n, n)
    # last = Re of the final full channel; re_f/im_f = the leading ones
    np.testing.assert_array_equal(np.asarray(last),
                                  np.arange(ch * n * n, dtype=np.float32)
                                  .reshape(ch, n, n)[-1])


def test_solver_routes_fused_to_plain_below_lane_width(monkeypatch):
    """'pallas_fused' at N % 128 != 0 constructs as 'pallas' on hardware
    (construction reads the predicate once; no trace happens here)."""
    from tpu_ocean.config import OceanConfig
    from tpu_ocean.solver import OceanSolver
    cfg = OceanConfig(resolution=192, length=192.0, wind=(8.0, 5.0),
                      amplitude=0.5, spectrum_layout="fft",
                      normals_mode="stencil")
    _patched_tpu(monkeypatch)
    s = OceanSolver(cfg, fft_backend="pallas_fused", real_state=True,
                    pack_channels=True)
    assert s.fft_backend == "pallas"
    # 128-divisible N keeps the requested fused pipeline
    cfg2 = OceanConfig(resolution=256, length=256.0, wind=(8.0, 5.0),
                       amplitude=0.5, spectrum_layout="fft",
                       normals_mode="stencil")
    s2 = OceanSolver(cfg2, fft_backend="pallas_fused", real_state=True,
                     pack_channels=True)
    assert s2.fft_backend == "pallas_fused"


def test_cpu_keeps_kernel_paths():
    """On CPU (interpret mode) nothing is rerouted — the suite's small-N
    kernel parity tests keep exercising the real kernels."""
    from tpu_ocean.config import OceanConfig
    from tpu_ocean.solver import OceanSolver
    cfg = OceanConfig(resolution=64, length=64.0, wind=(8.0, 5.0),
                      amplitude=0.5, spectrum_layout="fft",
                      normals_mode="stencil")
    s = OceanSolver(cfg, fft_backend="pallas_fused", real_state=True,
                    pack_channels=True)
    assert s.fft_backend == "pallas_fused"


def test_distributed_rejects_non_lane_multiple_on_hardware(monkeypatch):
    """DistributedOceanSolver fails EARLY with a real message on hardware
    for N % 128 != 0 (the sharded transforms call the transposed-store
    kernels directly — no einsum reroute exists there)."""
    from tpu_ocean.config import OceanConfig
    from tpu_ocean.parallel import make_mesh
    from tpu_ocean.solver_dist import DistributedOceanSolver
    cfg = OceanConfig(resolution=192, length=192.0, wind=(8.0, 5.0),
                      amplitude=0.5, spectrum_layout="fft",
                      normals_mode="stencil")
    mesh = make_mesh(1)
    _patched_tpu(monkeypatch)
    with pytest.raises(ValueError, match="128"):
        DistributedOceanSolver(cfg, mesh, fft_backend="pallas")
    # the check is scoped to the Pallas backends (ADVICE r4): the
    # jnp.fft/einsum sharded locals have no lane constraint and must stay
    # constructible on hardware at any N % n_dev == 0
    DistributedOceanSolver(cfg, mesh, fft_backend="matmul")
    DistributedOceanSolver(cfg, mesh, fft_backend="reference")


def test_column_engine_defaults_pinned():
    """The shipped column-engine configuration is measurement-backed
    (PROBE_r4_half_nat_column POSITIVE, PROBE_r4_column_radix2 NEGATIVE) —
    pin the defaults so an accidental flip is caught."""
    from tpu_ocean.fft import pallas_fft
    assert pallas_fft.HALF_NAT_COLUMN_KERNEL is True
    assert pallas_fft.COLUMN_RADIX2_KERNEL is False
    assert pallas_fft.HALF_MIN_PALLAS_N == 256


def test_half_fold_length_gate_routes_384_to_mirror(monkeypatch):
    """N = 384: N % 128 == 0 (so no solver reroute, and the r4 gate passed
    it) but the C2R fold length M = 192 breaks the 128-lane rule — the
    half route must mirror to the FULL transform on hardware (review
    finding, r5). Checked with a recording stub on ifft2_planes_auto:
    under the patched predicate the full transform would run real kernels
    (legal on hardware at N % 128 == 0, not executable on CPU)."""
    from tpu_ocean.fft import pallas_fft
    n = 384
    called = {}

    def stub(r, i, inverse, precision=None):
        called["shape"] = tuple(r.shape)
        return jnp.zeros_like(r), jnp.zeros_like(i)

    monkeypatch.setattr(pallas_fft, "ifft2_planes_auto", stub)
    _patched_tpu(monkeypatch)
    re = jnp.zeros((1, n // 2 + 1, n), jnp.float32)
    out = pallas_fft.ifft2_planes_half(re, re, True)
    assert called["shape"] == (1, n, n)       # mirrored to the FULL rows
    assert out.shape == (1, n, n)


def test_distributed_half_rejects_fold_illegal_n(monkeypatch):
    """Sharded half_spectrum at N ≡ 128 (mod 256) fails fast on hardware
    (no mirror fallback exists in the sharded kernels)."""
    from tpu_ocean.config import OceanConfig
    from tpu_ocean.parallel import make_mesh
    from tpu_ocean.solver_dist import DistributedOceanSolver
    cfg = OceanConfig(resolution=384, length=384.0, wind=(8.0, 5.0),
                      amplitude=0.5, spectrum_layout="fft",
                      normals_mode="stencil")
    mesh = make_mesh(1)
    _patched_tpu(monkeypatch)
    with pytest.raises(ValueError, match="256"):
        DistributedOceanSolver(cfg, mesh, fft_backend="pallas",
                               real_state=True, pack_channels=True,
                               half_spectrum=True)
    # N % 256 == 0 still constructs
    cfg2 = OceanConfig(resolution=256, length=256.0, wind=(8.0, 5.0),
                       amplitude=0.5, spectrum_layout="fft",
                       normals_mode="stencil")
    DistributedOceanSolver(cfg2, mesh, fft_backend="pallas",
                           real_state=True, pack_channels=True,
                           half_spectrum=True)


def test_distributed_rejects_shard_illegal_row_batch(monkeypatch):
    """Transposed-regime per-shard row batches must pick a lane-legal
    block: N = 1280/D = 4 passes every N-level gate but yields 320-row
    shards → a 64-row block, Mosaic-illegal on hardware (review finding,
    r5). Power-of-two shard counts over 128-multiples stay accepted."""
    from tpu_ocean.config import OceanConfig
    from tpu_ocean.parallel import make_mesh
    from tpu_ocean.solver_dist import DistributedOceanSolver

    def cfg(n):
        return OceanConfig(resolution=n, length=float(n), wind=(8.0, 5.0),
                           amplitude=0.5, spectrum_layout="fft",
                           normals_mode="stencil")
    _patched_tpu(monkeypatch)
    with pytest.raises(ValueError, match="per-shard"):
        DistributedOceanSolver(cfg(1280), make_mesh(shard=4),
                               fft_backend="pallas")
    # legal shardings construct: 128-multiple locals and whole-batch picks
    DistributedOceanSolver(cfg(1024), make_mesh(shard=4),
                           fft_backend="pallas")
    DistributedOceanSolver(cfg(512), make_mesh(shard=8),
                           fft_backend="pallas")


def test_solver_rejects_centered_pallas_at_worker_crash_scale(monkeypatch):
    """The r3 worker-crash config had one remaining user-reachable door:
    centered layout + 'pallas' at N ≥ PALLAS_PLAIN_ROUTE_N has no fused
    reroute — the constructor now refuses (review finding, r5)."""
    from tpu_ocean.config import OceanConfig
    from tpu_ocean.solver import OceanSolver, PALLAS_PLAIN_ROUTE_N
    cfg = OceanConfig(resolution=PALLAS_PLAIN_ROUTE_N,
                      length=float(PALLAS_PLAIN_ROUTE_N), wind=(8.0, 5.0),
                      amplitude=0.5, spectrum_layout="centered")
    with pytest.raises(ValueError, match="centered"):
        OceanSolver(cfg, fft_backend="pallas")
