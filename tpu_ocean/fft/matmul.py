"""DFT-as-matmul FFT backends for the MXU (TPU systolic array).

Gather-heavy butterfly networks map poorly onto TPU lanes; matrix units map
perfectly. Two formulations of the unnormalized inverse DFT along an axis:

* ``direct``    — Y = X @ Fᵀ with F[k,n] = e^{+2πi kn/N}: one big matmul,
                  O(N²) per row but at full MXU utilization. Any N.
* ``four-step`` — Cooley-Tukey split N = N1·N2 (Bailey's algorithm; see
                  PAPERS.md transpose-free FFT literature):
                      view x as A[n2, n1]           (reshape)
                      B = F_{N2} @ A                (matmul)
                      C = B ⊙ T,  T[k2,n1] = e^{+2πi n1 k2/N}   (twiddle)
                      D = C @ F_{N1}ᵀ               (matmul)
                      X[k2 + N2·k1] = D[k2, k1]     (transpose + reshape)
                  O(N(N1+N2)) per row — ~N/(N1+N2)× fewer FLOPs than direct
                  while still being two dense matmuls.

Complex arithmetic is carried as explicit (re, im) float32 pairs: TPU dots are
real, and the split form lets us run 4 real matmuls per complex matmul at
controlled precision (HIGHEST ⇒ ~1e-6 relative error vs float64).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _einsum_f32_precision(precision):
    """Large-N einsum tier for 'float32': HIGHEST → HIGH.

    Measured at 4096² (BASELINE.md): the step costs 36.4 ms at einsum
    HIGHEST vs 16.5 ms at DEFAULT — the 6-pass f32 emulation dominates.
    HIGH (native 3-pass bf16x3, ~1e-6 rel) matches the fp32-accumulation
    error floor that bounds large-N accuracy anyway, at half the MXU cost.
    The kernels' explicit bf16x3 sentinel (pallas_fft.B3 — Mosaic rejects
    lax HIGH inside kernels, so they hand-roll the same decomposition) maps
    to native HIGH here. Oracle-parity sizes (≤256²) keep true HIGHEST via
    the kernels (~1e-7)."""
    if precision == jax.lax.Precision.HIGHEST or precision == "bf16x3":
        return jax.lax.Precision.HIGH
    return precision


def ifft1d_planes_lastaxis(re, im, inverse: bool = True,
                           precision=jax.lax.Precision.HIGHEST):
    """Real-plane unnormalized (inverse) DFT along the LAST axis of
    [C, M, N] — the large-N row pass twin of ifft1d_planes_axis2 (see its
    docstring for why large N runs on einsums)."""
    from tpu_ocean.fft.pallas_fft import _tables_np

    precision = _einsum_f32_precision(precision)
    c, m, n = re.shape
    n1, n2, f2r, f2i, twr, twi, f1r, f1i = _tables_np(n, inverse)
    ar = re.reshape(c, m, n2, n1)
    ai = im.reshape(c, m, n2, n1)

    def dot(eq, a, b):
        return jnp.einsum(eq, a, b, precision=precision,
                          preferred_element_type=jnp.float32)

    cr = dot("ks,cmst->cmkt", f2r, ar) - dot("ks,cmst->cmkt", f2i, ai)
    ci = dot("ks,cmst->cmkt", f2r, ai) + dot("ks,cmst->cmkt", f2i, ar)
    twr_b = twr[None, None, :, :]
    twi_b = twi[None, None, :, :]
    cr, ci = cr * twr_b - ci * twi_b, cr * twi_b + ci * twr_b
    # X[c, m, k1, k2] = Σ_t F1[k1, t] · C[c, m, k2, t]
    dr = dot("lt,cmkt->cmlk", f1r, cr) - dot("lt,cmkt->cmlk", f1i, ci)
    di = dot("lt,cmkt->cmlk", f1r, ci) + dot("lt,cmkt->cmlk", f1i, cr)
    return dr.reshape(c, m, n), di.reshape(c, m, n)


def ifft1d_planes_axis2(re, im, inverse: bool = True,
                        precision=jax.lax.Precision.HIGHEST):
    """Real-plane unnormalized (inverse) DFT along axis -2 of [C, M, N].

    The large-N column pass (N > 2048, where Mosaic's transposed store
    needs a 128-lane row block that exceeds 16 MB VMEM — see
    pallas_fft.ifft2_planes_auto): the row pass leaves [C, M, N]
    non-transposed and this four-step einsum contracts axis -2 directly —
    XLA fuses the implied transpose into the MXU contraction and tiles HBM
    itself, so no explicit N²-sized transpose ever materializes. All arithmetic is real (4 real
    dots per complex dot), keeping the program complex-free for the
    real-state path. Tables are tiny (≤128², embedded constants are fine at
    this size — the CLAUDE.md embedding hazard is about N² grids)."""
    from tpu_ocean.fft.pallas_fft import _tables_np

    precision = _einsum_f32_precision(precision)
    c, m, n = re.shape
    n1, n2, f2r, f2i, twr, twi, f1r, f1i = _tables_np(m, inverse)
    ar = re.reshape(c, n2, n1, n)
    ai = im.reshape(c, n2, n1, n)

    def dot(eq, a, b):
        return jnp.einsum(eq, a, b, precision=precision,
                          preferred_element_type=jnp.float32)

    # stage 1: C[c, k2, t, i] = Σ_s F2[k2, s] · A[c, s, t, i]
    cr = dot("ks,csti->ckti", f2r, ar) - dot("ks,csti->ckti", f2i, ai)
    ci = dot("ks,csti->ckti", f2r, ai) + dot("ks,csti->ckti", f2i, ar)
    twr_b = twr[None, :, :, None]
    twi_b = twi[None, :, :, None]
    cr, ci = cr * twr_b - ci * twi_b, cr * twi_b + ci * twr_b
    # stage 2: X[c, k1, k2, i] = Σ_t F1[k1, t] · C[c, k2, t, i]
    dr = dot("lt,ckti->clki", f1r, cr) - dot("lt,ckti->clki", f1i, ci)
    di = dot("lt,ckti->clki", f1r, ci) + dot("lt,ckti->clki", f1i, cr)
    # transformed index = k1·n2 + k2 ⇔ [k1, k2] row-major (pallas_fft tables)
    return dr.reshape(c, m, n), di.reshape(c, m, n)


def _split_n(n: int):
    """Balanced factorization n = n1·n2 with n1 ≥ n2 (powers of two split
    exactly; otherwise the largest divisor ≤ sqrt(n))."""
    n2 = int(np.sqrt(n))
    while n2 > 1 and n % n2 != 0:
        n2 -= 1
    return n // n2, n2


@functools.lru_cache(maxsize=64)
def _dft_tables(n: int, inverse: bool):
    sign = +1.0 if inverse else -1.0
    k = np.arange(n)
    f = np.exp(sign * 2j * np.pi * np.outer(k, k) / n)
    return f


@functools.lru_cache(maxsize=64)
def _four_step_tables(n: int, inverse: bool):
    n1, n2 = _split_n(n)
    sign = +1.0 if inverse else -1.0
    f1 = _dft_tables(n1, inverse)
    f2 = _dft_tables(n2, inverse)
    k2 = np.arange(n2)[:, None]
    n1i = np.arange(n1)[None, :]
    tw = np.exp(sign * 2j * np.pi * k2 * n1i / n)
    return n1, n2, f1, f2, tw


def _cmul_matmul(ar, ai, br, bi, precision):
    """(ar + i·ai) @ (br + i·bi) as 4 real matmuls."""
    rr = jnp.matmul(ar, br, precision=precision) - jnp.matmul(ai, bi, precision=precision)
    ri = jnp.matmul(ar, bi, precision=precision) + jnp.matmul(ai, br, precision=precision)
    return rr, ri


def fft_matmul_1d(x: jnp.ndarray, inverse: bool = True,
                  mode: str = "four_step",
                  precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Unnormalized (i)DFT along the LAST axis via MXU matmuls."""
    n = x.shape[-1]
    re = jnp.real(x).astype(jnp.float32)
    im = jnp.imag(x).astype(jnp.float32)

    if mode == "direct" or n < 16 or _split_n(n)[1] == 1:
        f = _dft_tables(n, inverse)
        fr = jnp.asarray(f.real, dtype=jnp.float32)
        fi = jnp.asarray(f.imag, dtype=jnp.float32)
        # Y = X @ Fᵀ (F symmetric, so @F works; keep transpose explicit anyway)
        rr, ri = _cmul_matmul(re, im, fr.T, fi.T, precision)
        return rr + 1j * ri

    n1, n2, f1, f2, tw = _four_step_tables(n, inverse)
    batch = x.shape[:-1]
    a_re = re.reshape(batch + (n2, n1))
    a_im = im.reshape(batch + (n2, n1))

    # B = F_{N2} @ A  — contract over n2: einsum('ks,...st->...kt')
    f2r = jnp.asarray(f2.real, dtype=jnp.float32)
    f2i = jnp.asarray(f2.imag, dtype=jnp.float32)
    def lmat(mr, mi, xr, xi):
        rr = (jnp.einsum("ks,...st->...kt", mr, xr, precision=precision)
              - jnp.einsum("ks,...st->...kt", mi, xi, precision=precision))
        ri = (jnp.einsum("ks,...st->...kt", mr, xi, precision=precision)
              + jnp.einsum("ks,...st->...kt", mi, xr, precision=precision))
        return rr, ri
    b_re, b_im = lmat(f2r, f2i, a_re, a_im)

    # C = B ⊙ twiddle
    twr = jnp.asarray(tw.real, dtype=jnp.float32)
    twi = jnp.asarray(tw.imag, dtype=jnp.float32)
    c_re = b_re * twr - b_im * twi
    c_im = b_re * twi + b_im * twr

    # D = C @ F_{N1}ᵀ — contract over n1
    f1r = jnp.asarray(f1.real, dtype=jnp.float32)
    f1i = jnp.asarray(f1.imag, dtype=jnp.float32)
    d_re, d_im = _cmul_matmul(c_re, c_im, f1r.T, f1i.T, precision)

    # X[k2 + N2·k1] = D[k2, k1] → transpose to [k1, k2] then flatten
    d_re = jnp.swapaxes(d_re, -1, -2).reshape(batch + (n,))
    d_im = jnp.swapaxes(d_im, -1, -2).reshape(batch + (n,))
    return d_re + 1j * d_im


def ifft2_matmul(x: jnp.ndarray, mode: str = "four_step",
                 precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Unnormalized inverse FFT over the last two axes via MXU matmuls."""
    x = fft_matmul_1d(x, inverse=True, mode=mode, precision=precision)
    x = jnp.swapaxes(x, -1, -2)
    x = fft_matmul_1d(x, inverse=True, mode=mode, precision=precision)
    return jnp.swapaxes(x, -1, -2)


def fft2_matmul(x: jnp.ndarray, mode: str = "four_step",
                precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    x = fft_matmul_1d(x, inverse=False, mode=mode, precision=precision)
    x = jnp.swapaxes(x, -1, -2)
    x = fft_matmul_1d(x, inverse=False, mode=mode, precision=precision)
    return jnp.swapaxes(x, -1, -2)
