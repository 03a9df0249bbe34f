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

HBM traffic per step for the whole 2-D transform becomes:
  pass 1 (this kernel): read 5 f32 planes (h0 pair, φ) + write 10
  pass 2 (pallas_fft._fft1d_transposed): read 10 + write 10
vs the unfused chain's read 5 + write 10 + read 10 + write 10 + read 10 +
write 10 — a ~36% cut, plus one fewer kernel launch boundary.
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
    _tables_np, _dot_mid, _fft1d_transposed)

NUM_CHANNELS = 5


def _fused_kernel(f2r_ref, f2i_ref, twr_ref, twi_ref, f1r_ref, f1i_ref,
                  kz_tile_ref,
                  h0r_ref, h0i_ref, h0cr_ref, h0ci_ref, ph_ref,
                  ore_ref, oim_ref, *, n1, n2, m, length, dz_sign, epsilon,
                  precision):
    r, _, _ = h0r_ref.shape
    n = n1 * n2
    shape3 = (r, n2, n1)
    ch = pl.program_id(1)
    bi = pl.program_id(0)

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
    row = (bi * r
           + lax.broadcasted_iota(jnp.int32, shape3, 0)).astype(jnp.float32)
    wrapped = jnp.where(row < m * 0.5, row, row - m)
    kx = two_pi_over_l * wrapped
    kz = kz_tile_ref[:][None, :, :]          # (1, n2, n1) broadcast over rows
    kz = jnp.broadcast_to(kz, shape3)
    kmag2 = kx * kx + kz * kz
    invk = jnp.where(kmag2 < epsilon * epsilon, 0.0, lax.rsqrt(kmag2))

    # channel coefficient by arithmetic selection on the (traced) channel id —
    # all five are cheap VPU expressions (evolve.spectrum_coefficients)
    def w(i):
        return (ch == i).astype(jnp.float32)

    k = (w(0) * 1.0
         + w(1) * kx * invk
         + w(2) * dz_sign * kz * invk
         + w(3) * (-kx)
         + w(4) * (-kz))

    ar = k * htr
    ai = k * hti
    # four-step row FFT (see pallas_fft._fft_block_kernel for layout notes)
    f2r, f2i = f2r_ref[:], f2i_ref[:]
    cr = _dot_mid(f2r, ar, precision) - _dot_mid(f2i, ai, precision)
    ci = _dot_mid(f2r, ai, precision) + _dot_mid(f2i, ar, precision)
    twr = twr_ref[:][:, None, :]
    twi = twi_ref[:][:, None, :]
    cr, ci = cr * twr - ci * twi, cr * twi + ci * twr
    cr = cr.transpose(0, 2, 1)
    ci = ci.transpose(0, 2, 1)
    f1r, f1i = f1r_ref[:], f1i_ref[:]
    dr = _dot_mid(f1r, cr, precision) - _dot_mid(f1i, ci, precision)
    di = _dot_mid(f1r, ci, precision) + _dot_mid(f1i, cr, precision)
    ore_ref[:] = dr.reshape(1, n, r)
    oim_ref[:] = di.reshape(1, n, r)


def _pick_rows_fused(m: int, n: int):
    """Row block for the fused kernel: must keep the transposed store's
    minor dim (R) lane-aligned, under ~13 MB live VMEM."""
    r = 128
    while m % r != 0 and r > 8:
        r //= 2
    return r


def assemble_rowfft(h0_pair, phase, length: float, dz_sign: float,
                    inverse: bool = True, precision=None,
                    epsilon: float = 1e-4):
    """(h0r, h0i, h0cr, h0ci) f32 [M, N] each + phase [M, N] → row-FFT'd
    spectra stored TRANSPOSED: (re, im) [5, N, M] f32. Wavevectors are
    derived in-kernel from ``length`` (fft layout). Feed the result to
    pallas_fft._fft1d_transposed for the column pass."""
    if precision is None:
        precision = lax.Precision.HIGHEST
    h0r, h0i, h0cr, h0ci = h0_pair
    m, n = phase.shape
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

    table = lambda shape: pl.BlockSpec(shape, lambda bi, ch: (0, 0),
                                       memory_space=pltpu.VMEM)
    # channel-independent index map ⇒ Mosaic reuses the input block across
    # the NUM_CHANNELS inner iterations (one HBM read per row block)
    in_block = pl.BlockSpec((r, n2, n1), lambda bi, ch: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((1, n, r), lambda bi, ch: (ch, 0, bi),
                             memory_space=pltpu.VMEM)

    kernel = functools.partial(_fused_kernel, n1=n1, n2=n2, m=m,
                               length=float(length),
                               dz_sign=np.float32(dz_sign),
                               epsilon=np.float32(epsilon),
                               precision=precision)
    ore, oim = pl.pallas_call(
        kernel,
        grid=(m // r, NUM_CHANNELS),
        in_specs=[table((n2, n2)), table((n2, n2)),
                  table((n2, n1)), table((n2, n1)),
                  table((n1, n1)), table((n1, n1)),
                  table((n2, n1))] + [in_block] * 5,
        out_specs=[out_block, out_block],
        out_shape=[jax.ShapeDtypeStruct((NUM_CHANNELS, n, m),
                                        jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=int(NUM_CHANNELS * 8 * m * n * (n1 + n2)),
            bytes_accessed=int((5 + 2 * NUM_CHANNELS) * m * n * 4),
            transcendentals=int(2 * NUM_CHANNELS * m * n)),
        interpret=jax.default_backend() == "cpu",
    )(f2r, f2i, twr, twi, f1r, f1i, kz_tile, *ins)
    return ore, oim     # [5, N, M]


def ifft2_fused(h0_pair, phase, length: float, dz_sign: float,
                precision=None, epsilon: float = 1e-4) -> jnp.ndarray:
    """Full fused 2-D unnormalized inverse transform of the five evolved
    spectra: returns complex [5, N, N] spatial fields (matches
    ifft2(assemble_spectra(...)) to fp32)."""
    if precision is None:
        precision = lax.Precision.HIGHEST
    re, im = assemble_rowfft(h0_pair, phase, length, dz_sign,
                             precision=precision, epsilon=epsilon)
    re, im = _fft1d_transposed(re, im, inverse=True,
                               precision=precision)   # column pass
    return re + 1j * im
