"""Fused spectrum-assembly + row-FFT Pallas kernel — pipeline pass 1.

The reference materializes the time-evolved spectra as textures between the
Spectrum/SpectrumHeight blits and the Stockham chain (OceanRenderer.cs:227,
264-265). The XLA solver already fuses the assembly *into* the first FFT
stage's reads, but the assembled 5-channel spectrum block [5, N, N] complex
(40 MB at 1024²) still makes one full HBM round trip. This kernel removes it:

    per (R, N) row block, entirely in VMEM:
      φ tile → (cos, sin)                                 (VPU)
      h̃ = h0·e^{iφ} + h0*·e^{−iφ}                         (VPU)
      for ch in 0..4:  S_ch = K_ch ⊙ h̃                    (VPU)
                       row-FFT S_ch (Bailey four-step)     (MXU ×2)
                       store transposed → out[ch]          (DMA)

The five channel coefficient grids are REAL (evolve.spectrum_coefficients:
[1, kx/|k|, ±kz/|k|, −kx, −kz]) and are rebuilt in-kernel from three
wavevector tiles (kx, kz, 1/|k|) instead of streaming ten coefficient planes
from HBM. Channels run under lax.fori_loop so per-channel FFT temps reuse one
VMEM allocation (the unrolled-loop OOM lesson from gerstner_pallas).

HBM traffic per step for the whole 2-D transform becomes:
  pass 1 (this kernel): read 5 f32 planes (h0 pair, φ) + write 10
  pass 2 (pallas_fft._fft1d_transposed): read 10 + write 10
vs the unfused chain's read 5 + write 10 + read 10 + write 10 + read 10 +
write 10 — a ~30% cut, plus one fewer kernel launch boundary.
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
    _split_lanes, _tables_np, _dot_mid, _fft1d_transposed, _pick_block_rows)

NUM_CHANNELS = 5


def _fused_kernel(f2r_ref, f2i_ref, twr_ref, twi_ref, f1r_ref, f1i_ref,
                  h0r_ref, h0i_ref, h0cr_ref, h0ci_ref, ph_ref,
                  kx_ref, kz_ref, invk_ref,
                  ore_ref, oim_ref, kscr_ref, *, n1, n2, dz_sign,
                  precision):
    r, _, _ = h0r_ref.shape
    n = n1 * n2
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

    kx = kx_ref[:].reshape(shape3)
    kz = kz_ref[:].reshape(shape3)
    invk = invk_ref[:].reshape(shape3)
    # the five real channel coefficient tiles (evolve.spectrum_coefficients),
    # staged through VMEM scratch: Mosaic supports dynamic indexing of REFS
    # (not of values) inside the channel loop
    kscr_ref[0] = jnp.ones_like(kx)
    kscr_ref[1] = kx * invk
    kscr_ref[2] = dz_sign * kz * invk
    kscr_ref[3] = -kx
    kscr_ref[4] = -kz

    f2r, f2i = f2r_ref[:], f2i_ref[:]
    twr = twr_ref[:][:, None, :]
    twi = twi_ref[:][:, None, :]
    f1r, f1i = f1r_ref[:], f1i_ref[:]

    def channel(ch, _):
        k = kscr_ref[pl.ds(ch, 1)].reshape(shape3)
        ar = k * htr
        ai = k * hti
        # four-step row FFT (see pallas_fft._fft_block_kernel for layout notes)
        cr = _dot_mid(f2r, ar, precision) - _dot_mid(f2i, ai, precision)
        ci = _dot_mid(f2r, ai, precision) + _dot_mid(f2i, ar, precision)
        cr, ci = cr * twr - ci * twi, cr * twi + ci * twr
        cr = cr.transpose(0, 2, 1)
        ci = ci.transpose(0, 2, 1)
        dr = _dot_mid(f1r, cr, precision) - _dot_mid(f1i, ci, precision)
        di = _dot_mid(f1r, ci, precision) + _dot_mid(f1i, cr, precision)
        ore_ref[pl.ds(ch, 1)] = dr.reshape(1, 1, n, r)
        oim_ref[pl.ds(ch, 1)] = di.reshape(1, 1, n, r)
        return 0

    lax.fori_loop(0, NUM_CHANNELS, channel, 0)


def assemble_rowfft(h0_pair, phase, kx, kz, invk, dz_sign: float,
                    inverse: bool = True, precision=None):
    """(h0r, h0i, h0cr, h0ci) f32 [M, N] each + phase/k tiles → row-FFT'd
    spectra stored TRANSPOSED: (re, im) [5, N, M] f32. Feed the result to
    pallas_fft._fft1d_transposed for the column pass."""
    if precision is None:
        precision = lax.Precision.HIGHEST
    h0r, h0i, h0cr, h0ci = h0_pair
    m, n = phase.shape
    n1, n2, f2r, f2i, twr, twi, f1r, f1i = _tables_np(n, inverse)
    r = _pick_block_rows(m, n, vmem_budget=2 * 1024 * 1024)

    def shaped(x):
        return x.reshape(m, n2, n1)

    ins = [shaped(x) for x in (h0r, h0i, h0cr, h0ci, phase, kx, kz, invk)]

    table = lambda shape: pl.BlockSpec(shape, lambda bi: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_block = pl.BlockSpec((r, n2, n1), lambda bi: (bi, 0, 0),
                            memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((NUM_CHANNELS, 1, n, r), lambda bi: (0, 0, 0, bi),
                             memory_space=pltpu.VMEM)

    kernel = functools.partial(_fused_kernel, n1=n1, n2=n2,
                               dz_sign=np.float32(dz_sign),
                               precision=precision)
    ore, oim = pl.pallas_call(
        kernel,
        grid=(m // r,),
        in_specs=[table((n2, n2)), table((n2, n2)),
                  table((n2, n1)), table((n2, n1)),
                  table((n1, n1)), table((n1, n1))] + [in_block] * 8,
        out_specs=[out_block, out_block],
        out_shape=[jax.ShapeDtypeStruct((NUM_CHANNELS, 1, n, m),
                                        jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((NUM_CHANNELS, r, n2, n1), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=int(NUM_CHANNELS * 8 * m * n * (n1 + n2)),
            bytes_accessed=int((8 + 2 * NUM_CHANNELS) * m * n * 4),
            transcendentals=int(2 * m * n)),
        interpret=jax.default_backend() == "cpu",
    )(f2r, f2i, twr, twi, f1r, f1i, *ins)
    return ore[:, 0], oim[:, 0]     # [5, N, M]


def ifft2_fused(h0_pair, phase, kx, kz, invk, dz_sign: float,
                precision=None) -> jnp.ndarray:
    """Full fused 2-D unnormalized inverse transform of the five evolved
    spectra: returns complex [5, N, N] spatial fields (matches
    ifft2(assemble_spectra(...)) to fp32)."""
    if precision is None:
        precision = lax.Precision.HIGHEST
    re, im = assemble_rowfft(h0_pair, phase, kx, kz, invk, dz_sign,
                             precision=precision)
    re, im = _fft1d_transposed(re, im, inverse=True,
                               precision=precision)   # column pass
    return re + 1j * im
