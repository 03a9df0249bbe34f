"""Time evolution of the wave spectrum and the packed 5-spectra assembly
(components C5-C7).

The reference has two evolution modes (SURVEY.md §3.5), both supported:

* ``absolute`` — stateless in t: h̃(k,t) = h0·e^{iωt} + h0*·e^{−iωt}
  (FFTMesh.cs:178-190). Exactly periodic with quantized dispersion.
* ``phase`` — recurrent: φ ← (φ + ω·dt) mod 2π, then the same assembly with
  e^{iφ} (Dispersion.shader:32-41, Spectrum.shader:34-51). Supports varying dt.

The reference runs two separate FFT chains of 2 complex channels each
(OceanRenderer.cs:229-298: displacement hx,hz then height h,h — the height
channel duplicated). Here all output fields pack into ONE batched spectrum
tensor [5, N, N]: (height, disp_x, disp_z, slope_x, slope_z), transformed by a
single batched 2-D IFFT — 5 transforms instead of the reference's 8.

Coefficient conventions (oracle signs, FFTMesh.cs:205-215):
    C_height  = 1
    C_disp_x  = +kx/|k|        (zero where |k| < EPSILON)
    C_disp_z  = −kz/|k|        (the z sign quirk, FFTMesh.cs:215; flag-gated)
    C_slope_x = −kx            (normal accumulation, FFTMesh.cs:212)
    C_slope_z = −kz
Fields extract as height = Re(F₀), others = Im(F_c), matching the reference's
Re/Im bookkeeping. Choppiness is applied at position update (FFTMesh.cs:244-245),
not baked into the spectrum (the GPU path bakes it, Spectrum.shader:48-49 —
mathematically identical since it is a real scalar).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpu_ocean.config import EPSILON, OceanConfig
from tpu_ocean.grids import wavevector_grid
from tpu_ocean.spectra import dispersion

#: order of channels in the packed spectrum / field tensors
CHANNELS = ("height", "disp_x", "disp_z", "slope_x", "slope_z")
NUM_CHANNELS = len(CHANNELS)


def omega_grid(cfg: OceanConfig) -> np.ndarray:
    """ω[N, N] as a float64 trace-time constant.

    Computed in float64 on purpose: the quantized mode's floor() is
    discontinuous, and evaluating it in float32 can flip a mode across the
    floor boundary, producing O(ω₀·t) phase divergence from the float64 oracle
    (SURVEY.md §7 "Hard parts").
    """
    _, _, k_mag = wavevector_grid(cfg.resolution, cfg.length, cfg.spectrum_layout)
    return dispersion(k_mag, cfg.dispersion_mode, cfg.length)


def spectrum_coefficients(cfg: OceanConfig) -> np.ndarray:
    """[5, N, N] float64 per-channel multipliers (trace-time constant)."""
    kx, kz, k_mag = wavevector_grid(cfg.resolution, cfg.length, cfg.spectrum_layout)
    inv_k = np.where(k_mag < EPSILON, 0.0, 1.0 / np.maximum(k_mag, 1e-300))
    dz_sign = -1.0 if cfg.oracle_sign_quirk else 1.0
    return np.stack([
        np.ones_like(kx),          # height
        kx * inv_k,                # disp_x
        dz_sign * kz * inv_k,      # disp_z
        -kx,                       # slope_x
        -kz,                       # slope_z
    ])


def packed_coefficients(cfg: OceanConfig, nch: int) -> np.ndarray:
    """Hermitian-packed channel multipliers for the 'fft' layout — [2P, N, N]
    float64, P = 2 (stencil mode, nch=3) or 3 (spectral mode, nch=5): rows
    0..P−1 hold the real parts A, rows P..2P−1 the i-folded parts B of the
    packed complex coefficient A − i·B.

    Every output field is real, so each channel's complex transform carries
    twice the information the extraction keeps: the height spectrum is
    Hermitian (Re taken, FFTMesh.cs:253 bookkeeping) while the disp/slope
    spectra are anti-Hermitian (Im taken) because their multipliers r(k) are
    real and ODD under k → −k (spectrum_coefficients: kx/|k|, ±kz/|k|, −kx,
    −kz). Packing pairs one of each into a single transform:

        P0 = (1 + r_x)·h̃        → height  = Re F0,  disp_x  = Im F0
        P1 = (r_sx − i·r_z)·h̃   → disp_z  = Re F1,  slope_x = Im F1
        P2 = (     − i·r_sz)·h̃  → slope_z = Re F2

    (3-channel mode stops at P1 with r_sx = 0.) 5 transforms become 3 and
    3 become 2 — a 33-40% cut in FFT flops, HBM traffic, and (distributed)
    transpose volume, changing no extracted field beyond f32 rounding.

    The subtlety is the fft layout's self-paired modes (k = 0 and the
    Nyquist row/column, where (−m) mod N = m): there r(−k) = −r(k) fails,
    that slice of the spectrum is Hermitian rather than anti-, and its
    transform contribution is REAL — content the unpacked path's Im()
    extraction already discards. Taking the odd part of each multiplier
    under the index negation map zeroes exactly that discarded content, so
    packed and unpacked fields agree.

    'fft' layout only: the centered layout's k grid has an unpaired −πN/L
    line (no +πN/L partner), so even its height spectrum is not Hermitian
    and Re/Im do not separate fields there.
    """
    if cfg.spectrum_layout != "fft":
        raise ValueError("packed channels require spectrum_layout='fft'")
    if nch not in (3, 5):
        raise ValueError(f"nch must be 3 or 5, got {nch}")
    coeffs = spectrum_coefficients(cfg)
    n = coeffs.shape[-1]
    neg = (-np.arange(n)) % n

    def odd(r):                      # odd part under the index negation map
        return 0.5 * (r - r[np.ix_(neg, neg)])

    zero = np.zeros_like(coeffs[0])
    if nch == 3:
        a = [coeffs[0] + odd(coeffs[1]), zero]
        b = [zero, odd(coeffs[2])]
    else:
        a = [coeffs[0] + odd(coeffs[1]), odd(coeffs[3]), zero]
        b = [zero, odd(coeffs[2]), odd(coeffs[4])]
    return np.stack(a + b)


def assemble_spectra_packed_real(h0_planes, phase, pack):
    """Hermitian-packed assemble_spectra_real: ``pack`` is the [2P, N, N]
    grid from packed_coefficients; returns (re, im) f32 [P, N, N]."""
    h0r, h0i, h0cr, h0ci = h0_planes
    p = pack.shape[0] // 2
    a, b = pack[:p], pack[p:]
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    htr = (h0r + h0cr) * c + (h0ci - h0i) * s
    hti = (h0i + h0ci) * c + (h0r - h0cr) * s
    # P = (A − iB)·h̃, expanded into real planes
    return (a * htr[None] + b * hti[None],
            a * hti[None] - b * htr[None])


def assemble_spectra_packed(h0, h0_conj, phase, pack) -> jnp.ndarray:
    """Complex twin of assemble_spectra_packed_real: [P, N, N] complex."""
    p = pack.shape[0] // 2
    pv = jnp.cos(phase) + 1j * jnp.sin(phase)
    h = h0 * pv + h0_conj * jnp.conj(pv)
    return (pack[:p] - 1j * pack[p:]).astype(h.dtype) * h[None]


def negflip(x):
    """x indexed at (−m) mod N along both axes (the fft layout's k → −k
    index negation map; partner of packed_coefficients' ``neg``)."""
    return jnp.roll(x[::-1, ::-1], shift=(1, 1), axis=(0, 1))


def hermitize_pair(h0, h0_conj):
    """Project a complex (h0, h0_conj) pair onto its Hermitian part — see
    OceanSolver.symmetrize for the derivation and the idempotence note."""
    a = 0.5 * (h0 + jnp.conj(negflip(h0_conj)))
    return a, jnp.conj(negflip(a))


def hermitize_planes(r1, i1, r2, i2):
    """Real-plane twin of hermitize_pair: (h0_re, h0_im, h0c_re, h0c_im)."""
    ar = 0.5 * (r1 + negflip(r2))
    ai = 0.5 * (i1 - negflip(i2))
    return ar, ai, negflip(ar), -negflip(ai)


def evolve_phase_absolute(omega, t):
    """φ(k) = ω·t — the absolute-time mode (FFTMesh.cs:183)."""
    return omega * t


def evolve_phase_accumulate(phase, omega, dt):
    """φ ← (φ + ω·dt) mod 2π — the phase-accumulation mode
    (GetDispersion, FFTCommon.cginc:101-104; Dispersion.shader:32-41)."""
    two_pi = 2.0 * np.pi
    return jnp.mod(phase + omega * dt, two_pi)


def assemble_spectra_real(h0_planes, phase, coeffs):
    """assemble_spectra in pure REAL arithmetic: (re, im) [5, N, N] f32.

    ``h0_planes`` = (h0_re, h0_im, h0c_re, h0c_im) f32 planes; ``coeffs``
    must be the real coefficient grid (spectrum_coefficients is real-valued
    in every layout). Same math as assemble_spectra with the complex algebra
    expanded — complex64 never appears in the program, which matters on
    runtimes whose complex support is unreliable (CLAUDE.md) and lets XLA
    lay out the planes without interleaving.
    """
    h0r, h0i, h0cr, h0ci = h0_planes
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    # h̃ = h0·e^{iφ} + h0*·e^{−iφ}, expanded (matches ops/fused_spectrum_fft)
    htr = (h0r + h0cr) * c + (h0ci - h0i) * s
    hti = (h0i + h0ci) * c + (h0r - h0cr) * s
    return coeffs * htr[None, :, :], coeffs * hti[None, :, :]


def assemble_spectra(h0, h0_conj, phase, coeffs) -> jnp.ndarray:
    """Packed time-evolved spectra [5, N, N] complex.

    h̃(k) = h0·e^{iφ} + h0*·e^{−iφ} (FFTMesh.cs:188, Spectrum.shader:44-45),
    then each channel multiplies by its coefficient grid. One fused elementwise
    pass — the XLA equivalent of the reference's Dispersion + Spectrum +
    SpectrumHeight blits.
    """
    pv = jnp.cos(phase) + 1j * jnp.sin(phase)
    h = h0 * pv + h0_conj * jnp.conj(pv)
    return coeffs.astype(h.dtype) * h[None, :, :]
