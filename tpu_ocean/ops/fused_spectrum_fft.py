"""Fused spectrum-assembly + row-FFT Pallas kernel — pipeline pass 1.

The reference materializes the time-evolved spectra as textures between the
Spectrum/SpectrumHeight blits and the Stockham chain (OceanRenderer.cs:227,
264-265). The XLA solver already fuses the assembly *into* the first FFT
stage's reads, but the assembled 5-channel spectrum block [5, N, N] complex
(40 MB at 1024²) still makes one full HBM round trip. This kernel removes it:

    per (R, N) row block and channel ch, entirely in VMEM:
      φ tile → (cos, sin)                                 (VPU)
      h̃ = h0·e^{iφ} + h0*·e^{−iφ}                         (VPU)
      S = K_ch ⊙ h̃                                        (VPU)
      row-FFT S (Bailey four-step)                         (MXU ×2)
      store transposed → out[ch]                           (DMA)

Grid layout is (row_block, channel) with channel INNERMOST: the input block
index maps ignore the channel coordinate, so Mosaic elides the input DMA for
the 4 consecutive channel revisits — inputs stream from HBM once per row
block while each channel's output block stays small enough that the
transposed store keeps a 128-lane minor dimension (the earlier all-channels-
in-one-block formulation forced the row block below the lane width at 1024²
and failed Mosaic's divisibility rule).

The five channel coefficient grids are REAL (evolve.spectrum_coefficients:
[1, kx/|k|, ±kz/|k|, −kx, −kz]) and are rebuilt in-kernel from three
wavevector tiles by arithmetic selection on the channel id — no coefficient
planes stream from HBM and no scratch staging is needed.

HBM traffic per step for the whole 2-D transform (C = live channels, 3 on
the stencil flagship):
  pass 1 (this kernel): read 5 f32 planes (h0 pair, φ) + write 2C
  pass 2 (pallas_fft._fft1d_transposed): read 2C + write 2C
vs the unfused chain's read 5 + write 2C + read 2C + write 2C + read 2C +
write 2C — a ~36% cut, plus one fewer kernel launch boundary. Beyond the
transposed-store VMEM cap the same fusion survives via
assemble_rowfft_natural (any N) with an einsum column pass.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_ocean.fft.pallas_fft import (
    _tables_np, _dot_mid, _gauss_cmul, _fft1d_transposed, _rowfft_core,
    _pick_block_rows_natural, MAX_FUSED_N, kernel_precision,
    _use_split3, _split3_tables_np, _stage2_split3, _SPLIT_W, _SPLIT_U, B3)

NUM_CHANNELS = 5


def _assemble_block(kz_tile_ref, h0r_ref, h0i_ref, h0cr_ref, h0ci_ref,
                    ph_ref, *, n1, n2, wrap_n, length, dz_sign, epsilon,
                    ch, bi, r, row_off=0, packed=False, nch_live=3,
                    kz_nyq=0.0):
    """Shared assembly body: refs → (ar, ai) [r, n2, n1] spectrum planes for
    channel ``ch`` of row block ``bi`` (all VPU). ``row_off`` shifts the
    global row index (X-sharded callers pass the shard's first global row);
    ``wrap_n`` is the GLOBAL grid side the wavevector wrap folds over —
    always the full row width N, even when the row batch is a shard.

    ``packed=True`` assembles the Hermitian-packed channels instead
    (evolve.packed_coefficients: P = (A − iB)·h̃, ch indexes the PACKED
    list): the odd-part masking zeroes the Nyquist row (kx) / column (kz),
    where r(−k) = −r(k) fails — compare against ``kz_nyq``, the exact f32
    Nyquist kz value from the caller's tile, so the mask is bit-safe."""
    shape3 = (r, n2, n1)
    ph = ph_ref[:].reshape(shape3)
    c = jnp.cos(ph)
    s = jnp.sin(ph)
    h0r = h0r_ref[:].reshape(shape3)
    h0i = h0i_ref[:].reshape(shape3)
    h0cr = h0cr_ref[:].reshape(shape3)
    h0ci = h0ci_ref[:].reshape(shape3)
    # h̃ = h0 e^{iφ} + h0* e^{−iφ} (FFTMesh.cs:188, Spectrum.shader:44-45)
    htr = (h0r + h0cr) * c + (h0ci - h0i) * s
    hti = (h0i + h0ci) * c + (h0r - h0cr) * s

    # wavevectors rebuilt on the VPU (fft layout, grids.wavenumbers_1d):
    # kx varies only with the GLOBAL row index; kz only within the row
    two_pi_over_l = np.float32(2.0 * np.pi / length)
    row = (row_off + bi * r
           + lax.broadcasted_iota(jnp.int32, shape3, 0)).astype(jnp.float32)
    wrapped = jnp.where(row < wrap_n * 0.5, row,
                       row - wrap_n)
    kx = two_pi_over_l * wrapped
    kz = kz_tile_ref[:][None, :, :]          # (1, n2, n1) broadcast over rows
    kz = jnp.broadcast_to(kz, shape3)
    kmag2 = kx * kx + kz * kz
    invk = jnp.where(kmag2 < epsilon * epsilon, 0.0, lax.rsqrt(kmag2))

    # channel coefficient by arithmetic selection on the (traced) channel id —
    # all five are cheap VPU expressions (evolve.spectrum_coefficients)
    def w(i):
        return (ch == i).astype(jnp.float32)

    if packed:
        # wrapped row index at the kx Nyquist is exactly −N/2 (f32-exact
        # integer); kz compares against the caller-derived tile value
        rowmask = (wrapped != np.float32(-(wrap_n // 2))).astype(jnp.float32)
        colmask = (kz != np.float32(kz_nyq)).astype(jnp.float32)
        rx = kx * invk * rowmask
        rz = dz_sign * kz * invk * colmask
        if nch_live == 5:
            a = w(0) * (1.0 + rx) + w(1) * (-kx) * rowmask
            b = w(1) * rz + w(2) * (-kz) * colmask
        else:
            a = w(0) * (1.0 + rx)
            b = w(1) * rz
        return a * htr + b * hti, a * hti - b * htr

    k = (w(0) * 1.0
         + w(1) * kx * invk
         + w(2) * dz_sign * kz * invk
         + w(3) * (-kx)
         + w(4) * (-kz))

    return k * htr, k * hti


def _fused_kernel(row_off_ref, f2r_ref, f2i_ref, twr_ref, twi_ref,
                  f1r_ref, f1i_ref, kz_tile_ref,
                  h0r_ref, h0i_ref, h0cr_ref, h0ci_ref, ph_ref,
                  ore_ref, oim_ref, *, n1, n2, length, dz_sign, epsilon,
                  precision, ch_start=0, packed=False, nch_live=3,
                  kz_nyq=0.0):
    r, _, _ = h0r_ref.shape
    n = n1 * n2
    ch = ch_start + pl.program_id(1)
    bi = pl.program_id(0)

    ar, ai = _assemble_block(kz_tile_ref, h0r_ref, h0i_ref, h0cr_ref,
                             h0ci_ref, ph_ref, n1=n1, n2=n2, wrap_n=n,
                             length=length, dz_sign=dz_sign, epsilon=epsilon,
                             ch=ch, bi=bi, r=r,
                             row_off=row_off_ref[0, 0], packed=packed,
                             nch_live=nch_live, kz_nyq=kz_nyq)
    # four-step row FFT (see pallas_fft._fft_block_kernel for layout notes;
    # Gauss 3-dot complex products, pallas_fft._gauss_cmul). B3 → stage 2
    # only (VMEM-stack reasoning at pallas_fft._fft_block_kernel)
    p1 = lax.Precision.HIGHEST if precision == B3 else precision
    f2r, f2i = f2r_ref[:], f2i_ref[:]
    cr, ci = _gauss_cmul(f2r, f2i, f2r + f2i, ar, ai, p1)
    twr = twr_ref[:][:, None, :]
    twi = twi_ref[:][:, None, :]
    cr, ci = cr * twr - ci * twi, cr * twi + ci * twr
    cr = cr.transpose(0, 2, 1)
    ci = ci.transpose(0, 2, 1)
    f1r, f1i = f1r_ref[:], f1i_ref[:]
    dr, di = _gauss_cmul(f1r, f1i, f1r + f1i, cr, ci, precision)
    ore_ref[:] = dr.reshape(1, n, r)
    oim_ref[:] = di.reshape(1, n, r)


def _fused_kernel_split3(row_off_ref, f2r_ref, f2i_ref, twr_ref, twi_ref,
                         fwr_ref, fwi_ref, t3r_ref, t3i_ref,
                         fur_ref, fui_ref, kz_tile_ref,
                         h0r_ref, h0i_ref, h0cr_ref, h0ci_ref, ph_ref,
                         ore_ref, oim_ref, *, n1, n2, length, dz_sign,
                         epsilon, precision, ch_start=0, packed=False,
                         nch_live=3, kz_nyq=0.0):
    """_fused_kernel with stage 2 three-factored — the F1 refs are replaced
    by the (F_W, TW, F_U) factor tables (pallas_fft.THREE_FACTOR_THRESHOLD)."""
    r, _, _ = h0r_ref.shape
    n = n1 * n2
    ch = ch_start + pl.program_id(1)
    bi = pl.program_id(0)

    ar, ai = _assemble_block(kz_tile_ref, h0r_ref, h0i_ref, h0cr_ref,
                             h0ci_ref, ph_ref, n1=n1, n2=n2, wrap_n=n,
                             length=length, dz_sign=dz_sign, epsilon=epsilon,
                             ch=ch, bi=bi, r=r,
                             row_off=row_off_ref[0, 0], packed=packed,
                             nch_live=nch_live, kz_nyq=kz_nyq)
    p1 = lax.Precision.HIGHEST if precision == B3 else precision
    f2r, f2i = f2r_ref[:], f2i_ref[:]
    cr, ci = _gauss_cmul(f2r, f2i, f2r + f2i, ar, ai, p1)
    twr = twr_ref[:][:, None, :]
    twi = twi_ref[:][:, None, :]
    cr, ci = cr * twr - ci * twi, cr * twi + ci * twr
    cr = cr.transpose(0, 2, 1)
    ci = ci.transpose(0, 2, 1)
    dr, di = _stage2_split3(cr, ci, fwr_ref[:], fwi_ref[:],
                            t3r_ref[:], t3i_ref[:], fur_ref[:], fui_ref[:],
                            precision)
    ore_ref[:] = dr.reshape(1, n, r)
    oim_ref[:] = di.reshape(1, n, r)


def _fused_rowfft_kernel_natural(row_off_ref, f2r_ref, f2i_ref, twr_ref,
                                 twi_ref, f1tr_ref, f1ti_ref, kz_tile_ref,
                                 h0r_ref, h0i_ref, h0cr_ref, h0ci_ref,
                                 ph_ref, ore_ref, oim_ref,
                                 *, n1, n2, length, dz_sign, epsilon,
                                 precision, ch_start=0, packed=False,
                                 nch_live=3, kz_nyq=0.0):
    """Any-N fused assembly + row FFT with a NATURAL-orientation store —
    the large-N twin of _fused_kernel. Built on the three probed-legal
    Mosaic behaviors documented at pallas_fft.fft1d_natural_large."""
    r, _, _ = h0r_ref.shape
    ch = ch_start + pl.program_id(1)
    bi = pl.program_id(0)
    ar, ai = _assemble_block(kz_tile_ref, h0r_ref, h0i_ref, h0cr_ref,
                             h0ci_ref, ph_ref, n1=n1, n2=n2, wrap_n=n1 * n2,
                             length=length, dz_sign=dz_sign, epsilon=epsilon,
                             ch=ch, bi=bi, r=r, row_off=row_off_ref[0, 0],
                             packed=packed, nch_live=nch_live,
                             kz_nyq=kz_nyq)
    dr, di = _rowfft_core(ar, ai, f2r_ref[:], f2i_ref[:], twr_ref[:],
                          twi_ref[:], f1tr_ref[:], f1ti_ref[:], precision)
    ore_ref[:] = dr[None]
    oim_ref[:] = di[None]


def assemble_rowfft_natural(h0_pair, phase, length: float, dz_sign: float,
                            inverse: bool = True, precision=None,
                            epsilon: float = 1e-4, row_offset=0,
                            ch_start: int = 0,
                            ch_count: int = NUM_CHANNELS,
                            packed: bool = False, nch_live: int = 3):
    """Fused assembly + row FFT for ANY even N: (re, im) [ch_count, M, N]
    f32 in natural orientation — feed matmul.ifft1d_planes_axis2 for the
    column pass. One HBM read of the 5 input planes + one write of the
    2·ch_count output planes; the jnp/einsum equivalent materializes every
    stage."""
    if precision is None:
        precision = lax.Precision.HIGHEST
    h0r, h0i, h0cr, h0ci = h0_pair
    m, n = phase.shape
    precision = kernel_precision(n, precision)
    r = _pick_block_rows_natural(m, n, planes=5)
    if r == 0:
        raise ValueError(
            f"assemble_rowfft_natural needs a row count divisible by 8 "
            f"(got M={m}) — a truncated grid would silently skip rows")
    n1, n2, f2r, f2i, twr, twi, f1r, f1i = _tables_np(n, inverse)

    idx = np.arange(n, dtype=np.float64)
    wrapped = np.where(idx < n / 2.0, idx, idx - n)
    kz_tile = (2.0 * np.pi * wrapped / length).astype(np.float32
                                                      ).reshape(n2, n1)
    ins = [x.reshape(m, n2, n1) for x in (h0r, h0i, h0cr, h0ci, phase)]
    row_off = jnp.asarray(row_offset, jnp.int32).reshape(1, 1)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    table = lambda shape: pl.BlockSpec(shape, lambda bi, ch: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_block = pl.BlockSpec((r, n2, n1), lambda bi, ch: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((1, r, n1, n2), lambda bi, ch: (ch, bi, 0, 0),
                             memory_space=pltpu.VMEM)

    kernel = functools.partial(_fused_rowfft_kernel_natural, n1=n1, n2=n2,
                               length=float(length),
                               dz_sign=np.float32(dz_sign),
                               epsilon=np.float32(epsilon),
                               precision=precision, ch_start=ch_start,
                               packed=packed, nch_live=nch_live,
                               kz_nyq=float(kz_tile.min()))
    ore, oim = pl.pallas_call(
        kernel,
        grid=(m // r, ch_count),
        in_specs=[smem,
                  table((n2, n2)), table((n2, n2)),
                  table((n2, n1)), table((n2, n1)),
                  table((n1, n1)), table((n1, n1)),
                  table((n2, n1))] + [in_block] * 5,
        out_specs=[out_block, out_block],
        out_shape=[jax.ShapeDtypeStruct((ch_count, m, n1, n2),
                                        jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=int(ch_count * 6 * m * n * (n1 + n2)),  # Gauss: 3 dots
            bytes_accessed=int((5 + 2 * ch_count) * m * n * 4),
            transcendentals=int(2 * ch_count * m * n)),
        interpret=jax.default_backend() == "cpu",
    )(row_off, f2r, f2i, twr, twi, f1r.T.copy(), f1i.T.copy(), kz_tile,
      *ins)
    return (ore.reshape(ch_count, m, n), oim.reshape(ch_count, m, n))


def _pick_rows_fused(m: int, n: int):
    """Row block for the fused kernel: must keep the transposed store's
    minor dim (R) lane-aligned, under ~13 MB live VMEM. The block MUST
    divide the row count — a non-divisor grid silently skips the trailing
    rows and leaves uninitialized (NaN) output (reproduced at N = 18/20,
    review finding r5); continue halving to 1 like _pick_block_rows."""
    r = 128
    while m % r != 0 and r > 8:
        r //= 2
    while m % r != 0 and r > 1:
        r //= 2
    return r


def assemble_rowfft(h0_pair, phase, length: float, dz_sign: float,
                    inverse: bool = True, precision=None,
                    epsilon: float = 1e-4, row_offset=0,
                    ch_start: int = 0, ch_count: int = NUM_CHANNELS,
                    packed: bool = False, nch_live: int = 3):
    """(h0r, h0i, h0cr, h0ci) f32 [M, N] each + phase [M, N] → row-FFT'd
    spectra stored TRANSPOSED: (re, im) [ch_count, N, M] f32. Wavevectors
    are derived in-kernel from ``length`` (fft layout); ``row_offset``
    (traced ok) shifts the global row index for X-sharded row batches;
    ``packed=True`` assembles the Hermitian-packed channel set instead
    (evolve.packed_coefficients, ``nch_live`` ∈ {3, 5} live fields). Feed
    the result to pallas_fft._fft1d_transposed for the column pass."""
    if precision is None:
        precision = lax.Precision.HIGHEST
    h0r, h0i, h0cr, h0ci = h0_pair
    m, n = phase.shape
    precision = kernel_precision(n, precision)
    if n > MAX_FUSED_N:
        raise ValueError(
            f"assemble_rowfft's transposed-store kernel caps at "
            f"N={MAX_FUSED_N} (VMEM wall, see pallas_fft.ifft2_planes_auto)"
            f" — use ifft2_fused_planes, which switches to the einsum "
            f"four-step beyond")
    n1, n2, f2r, f2i, twr, twi, f1r, f1i = _tables_np(n, inverse)
    r = _pick_rows_fused(m, n)

    # kz's within-row pattern, as one (N2, N1) table (float64 build)
    idx = np.arange(n, dtype=np.float64)
    wrapped = np.where(idx < n / 2.0, idx, idx - n)
    kz_tile = (2.0 * np.pi * wrapped / length).astype(np.float32
                                                      ).reshape(n2, n1)

    def shaped(x):
        return x.reshape(m, n2, n1)

    ins = [shaped(x) for x in (h0r, h0i, h0cr, h0ci, phase)]
    row_off = jnp.asarray(row_offset, jnp.int32).reshape(1, 1)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    table = lambda shape: pl.BlockSpec(shape, lambda bi, ch: (0, 0),
                                       memory_space=pltpu.VMEM)
    # channel-independent index map ⇒ Mosaic reuses the input block across
    # the NUM_CHANNELS inner iterations (one HBM read per row block)
    in_block = pl.BlockSpec((r, n2, n1), lambda bi, ch: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((1, n, r), lambda bi, ch: (ch, 0, bi),
                             memory_space=pltpu.VMEM)

    common = dict(n1=n1, n2=n2, length=float(length),
                  dz_sign=np.float32(dz_sign), epsilon=np.float32(epsilon),
                  precision=precision, ch_start=ch_start, packed=packed,
                  nch_live=nch_live, kz_nyq=float(kz_tile.min()))
    if _use_split3(n, n1):
        kernel = functools.partial(_fused_kernel_split3, **common)
        w_, u_ = _SPLIT_W, _SPLIT_U
        stage2_specs = [table((w_, w_)), table((w_, w_)),
                        table((w_, u_)), table((w_, u_)),
                        table((u_, u_)), table((u_, u_))]
        stage2_args = _split3_tables_np(n1, inverse)
        flops = int(ch_count * 6 * m * n * (n2 + w_ + u_))
    else:
        kernel = functools.partial(_fused_kernel, **common)
        stage2_specs = [table((n1, n1)), table((n1, n1))]
        stage2_args = (f1r, f1i)
        flops = int(ch_count * 6 * m * n * (n1 + n2))     # Gauss: 3 dots
    ore, oim = pl.pallas_call(
        kernel,
        grid=(m // r, ch_count),
        in_specs=[smem,
                  table((n2, n2)), table((n2, n2)),
                  table((n2, n1)), table((n2, n1))]
                 + stage2_specs
                 + [table((n2, n1))] + [in_block] * 5,
        out_specs=[out_block, out_block],
        out_shape=[jax.ShapeDtypeStruct((ch_count, n, m),
                                        jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int((5 + 2 * ch_count) * m * n * 4),
            transcendentals=int(2 * ch_count * m * n)),
        interpret=jax.default_backend() == "cpu",
    )(row_off, f2r, f2i, twr, twi, *stage2_args, kz_tile, *ins)
    return ore, oim     # [5, N, M]


def ifft2_fused(h0_pair, phase, length: float, dz_sign: float,
                precision=None, epsilon: float = 1e-4,
                row_offset=0, ch_count: int = NUM_CHANNELS,
                packed: bool = False, nch_live: int = 3) -> jnp.ndarray:
    """Full fused 2-D unnormalized inverse transform of the first
    ``ch_count`` evolved spectra: returns complex [ch_count, N, N] spatial
    fields (matches ifft2(assemble_spectra(...)) to fp32). Stencil-normal
    solvers pass ch_count=3 — the slope channels are dead there — or
    ``packed=True, ch_count=2`` for the Hermitian-packed pair."""
    if precision is None:
        precision = lax.Precision.HIGHEST
    re, im = ifft2_fused_planes(h0_pair, phase, length, dz_sign,
                                precision=precision, epsilon=epsilon,
                                row_offset=row_offset, ch_count=ch_count,
                                packed=packed, nch_live=nch_live)
    return re + 1j * im


def ifft2_fused_planes(h0_pair, phase, length: float, dz_sign: float,
                       precision=None, epsilon: float = 1e-4,
                       row_offset=0, ch_count: int = NUM_CHANNELS,
                       packed: bool = False, nch_live: int = 3):
    """All-real twin of ifft2_fused: (re, im) f32 [ch_count, N, N] planes.
    N ≤ MAX_FUSED_N: fused transposed-store row pass + transposed column
    pass. Beyond: jnp assembly (wavevectors from iota, fused by XLA into
    the first contraction) + the einsum four-step on both axes (see
    pallas_fft.ifft2_planes_auto for the VMEM reasoning)."""
    if precision is None:
        precision = lax.Precision.HIGHEST
    m, n = phase.shape
    if n > MAX_FUSED_N:
        # VMEM closes the TRANSPOSED-store window here, but the
        # natural-store fused row kernel is legal at any N (probed —
        # pallas_fft.fft1d_natural_large): assembly + row FFT in one HBM
        # round trip, then the einsum column pass.
        re, im = assemble_rowfft_natural(h0_pair, phase, length, dz_sign,
                                         precision=precision,
                                         epsilon=epsilon,
                                         row_offset=row_offset,
                                         ch_count=ch_count, packed=packed,
                                         nch_live=nch_live)
        from tpu_ocean.fft.matmul import ifft1d_planes_axis2
        return ifft1d_planes_axis2(re, im, True, precision)
    re, im = assemble_rowfft(h0_pair, phase, length, dz_sign,
                             precision=precision, epsilon=epsilon,
                             row_offset=row_offset, ch_count=ch_count,
                             packed=packed, nch_live=nch_live)
    return _fft1d_transposed(re, im, inverse=True, precision=precision)


def ifft2_fused_planes_half(h0_pair, phase, length: float, dz_sign: float,
                            pack_nyq, precision=None, epsilon: float = 1e-4,
                            ch_count: int = 2, nch_live: int = 3):
    """Fused-assembly twin of pallas_fft.ifft2_planes_half — the composition
    of the round's two headline levers (half-spectrum C2R route + in-kernel
    spectrum assembly).

    The first ``ch_count − 1`` PACKED channels ride the full fused pipeline
    (assemble_rowfft → _fft1d_transposed). The LAST packed channel is a lone
    real field (A = 0 in evolve.packed_coefficients) whose spectrum is
    exactly Hermitian after symmetrize, so its fused row pass runs over
    spectral rows 0..N/2−1 ONLY (the kernels take a row-sliced input batch
    with row_offset=0 — the sliced rows ARE global rows), the Nyquist
    spectral row is assembled in XLA from ``pack_nyq`` (the HOST-numpy
    [2P, 1, N] row slice of the solver's packed_coefficients grid —
    CLAUDE.md: trace-time constants stay host arrays) and transformed by a
    one-row matmul, and the conjugate half folds via the classic C2R
    even/odd identity (pallas_fft._c2r_combine). vs the non-fused half
    route this removes the assembled-spectrum HBM round trip
    (1.5 transform-equivalents' worth of planes) that r3's device trace
    priced at ~0.08 ms of the 0.42 ms flagship step.

    Returns (re_full, im_full) f32 [ch_count−1, N, N] + ``last`` f32 [N, N]
    (the final field is real — its Im is identically zero and never
    computed). Both storage regimes: transposed ≤ MAX_FUSED_N, natural-store
    + einsum column beyond (where the half route also halves the column
    pass length — the measured 4096² HBM bottleneck)."""
    from tpu_ocean.fft.matmul import ifft1d_planes_lastaxis
    from tpu_ocean.fft.pallas_fft import _c2r_combine, HALF_MIN_PALLAS_N
    from tpu_ocean.evolve import assemble_spectra_packed_real
    if precision is None:
        precision = lax.Precision.HIGHEST
    m, n = phase.shape
    if (n < HALF_MIN_PALLAS_N or n % 256) and jax.default_backend() != "cpu":
        # Mosaic rejects the half channel's kernels when the fold length
        # M = N/2 is not lane-legal: M < 128 (probed r4 at N ∈ {64, 128};
        # ADVICE r4 — at N = 128 the solver's N % 128 → 'pallas' reroute
        # does NOT fire, so the guard must live here) or M % 128 != 0
        # (N ≡ 128 mod 256, e.g. 384 — review finding, r5: the fused half
        # row pass also picks sub-128 transposed-store blocks there).
        # Ride the full fused pipeline on all channels; the last packed
        # channel's spectrum is exactly Hermitian, so its full
        # transform's Im is identically zero and Re IS the field.
        re_all, im_all = ifft2_fused_planes(h0_pair, phase, length, dz_sign,
                                            precision=precision,
                                            epsilon=epsilon,
                                            ch_count=ch_count, packed=True,
                                            nch_live=nch_live)
        return re_all[:-1], im_all[:-1], re_all[-1]
    mh = n // 2
    kw = dict(precision=precision, epsilon=epsilon, packed=True,
              nch_live=nch_live)

    # full packed channels: the standard fused pipeline
    re_t, im_t = assemble_rowfft_natural(h0_pair, phase, length, dz_sign,
                                         ch_start=0, ch_count=ch_count - 1,
                                         **kw) \
        if n > MAX_FUSED_N else \
        assemble_rowfft(h0_pair, phase, length, dz_sign,
                        ch_start=0, ch_count=ch_count - 1, **kw)

    # half channel: fused row pass over the Hermitian half 0..N/2−1
    half_in = tuple(p[:mh] for p in h0_pair)
    # Nyquist spectral row (global row N/2): one-row XLA assembly + matmul
    # transform — 2·N² MACs, noise next to the kernels
    nyq_in = tuple(p[mh:mh + 1] for p in h0_pair)
    rnr, rni = assemble_spectra_packed_real(nyq_in, phase[mh:mh + 1],
                                            jnp.asarray(pack_nyq))
    nyr, nyi = ifft1d_planes_lastaxis(rnr[-1:], rni[-1:], True,
                                      precision)              # [1, 1, N]

    if n > MAX_FUSED_N:
        from tpu_ocean.fft.matmul import ifft1d_planes_axis2
        re_f, im_f = ifft1d_planes_axis2(re_t, im_t, True, precision)
        yr, yi = assemble_rowfft_natural(half_in, phase[:mh], length,
                                         dz_sign, ch_start=ch_count - 1,
                                         ch_count=1, **kw)   # [1, M, N]
        vr, vi = _c2r_combine(yr, yi, nyr, nyi, True, axis=-2)
        # the shared measurement-backed column-engine dispatch — the
        # fused route previously hard-coded the einsum chain and forwent
        # both banked wins (review finding, r5)
        from tpu_ocean.fft.pallas_fft import half_column_pass
        xr, xi = half_column_pass(vr, vi, mh, True, precision)
    else:
        re_f, im_f = _fft1d_transposed(re_t, im_t, inverse=True,
                                       precision=precision)
        yr, yi = assemble_rowfft(half_in, phase[:mh], length, dz_sign,
                                 ch_start=ch_count - 1, ch_count=1,
                                 **kw)                        # [1, N, M]
        vr, vi = _c2r_combine(yr, yi,
                              jnp.swapaxes(nyr, -1, -2),
                              jnp.swapaxes(nyi, -1, -2), True, axis=-1)
        xr, xi = _fft1d_transposed(vr, vi, inverse=True,
                                   precision=precision)       # [1, M, N]
    # x[2m] = Re v[m], x[2m+1] = Im v[m]: interleave as even/odd rows
    last = jnp.stack([xr, xi], axis=2).reshape(n, n)
    return re_f, im_f, last

