"""Fused Pallas 2-D (inverse) FFT — the hand-tuned TPU kernel for C8/C9.

The reference's Stockham butterfly pass (Stockham.shader:31-57) is a
gather-network: per output texel it reads two strided inputs and a twiddle.
Gathers map poorly onto TPU lanes; the MXU maps perfectly. So the TPU-native
kernel re-expresses each 1-D transform as Bailey's four-step factorization
N = N1·N2 (same math as fft/matmul.py, see its docstring):

    A[s, t] = x[s·N1 + t]                    s ∈ [0,N2), t ∈ [0,N1)
    C[k2, t]  = Σ_s F2[k2, s] · A[s, t]       (MXU, contract s)
    C ⊙= T,   T[k2, t] = e^{±2πi·t·k2/N}
    X[k2 + N2·k1] = Σ_t F1[k1, t] · C[k2, t]  (MXU, contract t)

What Pallas buys over the XLA einsum chain is *fusion*: one HBM read and one
HBM write per axis pass. A block of R rows is DMA'd to VMEM, runs the whole
chain on-chip, and is stored TRANSPOSED — so the column pass is the same
kernel applied again, and the row↔column turn (the reference's
_HORIZONTAL→_VERTICAL flip, OceanRenderer.cs:256-260) never materializes a
separate 2·N²·C·8-byte transpose pass in HBM.

Mosaic layout rules shape the implementation (probed on the target toolchain):
lane-dim splits/merges are unsupported, so the (N,)→(N2, N1) view happens in
HBM before the call; dot_general must contract a non-minor rhs dim, so both
contractions use a 2-D lhs table against the rhs middle axis; N1 is pinned to
128 (the lane width) whenever N divides, making step 2 a full-width MXU op.

Complex data is carried as separate (re, im) float32 planes: TPU dots are
real, and a complex matmul is 4 real MXU ops at controlled precision.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split_lanes(n: int):
    """(n1, n2) with n = n2·n1; n1 = 128 (lane width) when possible."""
    if n % 128 == 0:
        return 128, n // 128
    # small n: largest divisor ≤ n/2 as n1 (still exact, interp/test sizes)
    n1 = n // 2
    while n1 > 1 and n % n1 != 0:
        n1 -= 1
    return n1, n // n1


@functools.lru_cache(maxsize=32)
def _tables_np(n: int, inverse: bool):
    n1, n2 = _split_lanes(n)
    sign = +1.0 if inverse else -1.0
    w1 = np.exp(sign * 2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    w2 = np.exp(sign * 2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    tw = np.exp(sign * 2j * np.pi * np.outer(np.arange(n2), np.arange(n1)) / n)
    f32 = np.float32
    return (n1, n2,
            w2.real.astype(f32), w2.imag.astype(f32),     # F2 [k2, s]
            tw.real.astype(f32), tw.imag.astype(f32),     # T  [k2, t]
            w1.real.astype(f32), w1.imag.astype(f32))     # F1 [k1, t]


def _dot_mid(m, x, precision=lax.Precision.HIGHEST):
    """[a, b] · [r, b, t] contracting b (rhs middle) → [a, r, t].

    Default precision=HIGHEST: the MXU's default f32 path truncates to bf16
    passes (~4e-3 rel error at N=1024 — measured); HIGHEST selects the bf16x3
    decomposition, restoring ~1e-7 parity with jnp.fft at ~3× the MXU cost
    (the kernel stays bandwidth-dominated, so wall-clock impact is small).
    OceanConfig(precision='bfloat16') passes DEFAULT for the fast mode.
    """
    return lax.dot_general(m, x, dimension_numbers=(((1,), (1,)), ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=precision)


def _fft_block_kernel(f2r_ref, f2i_ref, twr_ref, twi_ref, f1r_ref, f1i_ref,
                      re_ref, im_ref, ore_ref, oim_ref, *, n1, n2,
                      precision=lax.Precision.HIGHEST):
    """(1, R, N2, N1) row block → 1-D transforms → transposed (1, N, R) store."""
    _, r, _, _ = re_ref.shape
    n = n1 * n2
    ar = re_ref[:].reshape(r, n2, n1)
    ai = im_ref[:].reshape(r, n2, n1)

    # C[k2, r, t] = Σ_s F2[k2, s] A[r, s, t]
    f2r, f2i = f2r_ref[:], f2i_ref[:]
    cr = _dot_mid(f2r, ar, precision) - _dot_mid(f2i, ai, precision)
    ci = _dot_mid(f2r, ai, precision) + _dot_mid(f2i, ar, precision)

    # twiddle, broadcast over the row axis
    twr = twr_ref[:][:, None, :]
    twi = twi_ref[:][:, None, :]
    cr, ci = cr * twr - ci * twi, cr * twi + ci * twr

    # reorient so t is the middle (contractable) axis: [k2, t, r]
    cr = cr.transpose(0, 2, 1)
    ci = ci.transpose(0, 2, 1)

    # D[k1, k2, r] = Σ_t F1[k1, t] C[k2, t, r]
    f1r, f1i = f1r_ref[:], f1i_ref[:]
    dr = _dot_mid(f1r, cr, precision) - _dot_mid(f1i, ci, precision)
    di = _dot_mid(f1r, ci, precision) + _dot_mid(f1i, cr, precision)

    # X[n] with n = k2 + N2·k1 ⇔ [k1, k2] row-major; minor axis stays r.
    ore_ref[:] = dr.reshape(1, n, r)
    oim_ref[:] = di.reshape(1, n, r)


# Transposed-store VMEM ceilings (see _pick_block_rows). Verified on
# hardware (v5e, 16 MB VMEM): both the pure FFT pass (2 input planes per
# block) and the fused assembly pass (5 planes after the in-kernel
# wavevector rebuild) compile+run at 2048 with the 128-row lane-aligned
# block, and OOM at 4096. Beyond MAX_PALLAS_N the k1-TILED variant takes
# over (stage 1 into persistent scratch, k1-tile stores, VMEM-modeled row
# block — see _pick_block_rows_tiled); past MAX_TILED_N even the tiled
# row block underruns the sublane floor and the solver falls back to the
# einsum path, which XLA tiles through HBM.
MAX_PALLAS_N = 2048
MAX_FUSED_N = 2048
MAX_TILED_N = 16384
MAX_FUSED_TILED_N = 16384


def _pick_block_rows(n_rows: int, n: int, vmem_budget=4 * 1024 * 1024):
    """Row block dividing n_rows under the VMEM budget (~8 live/double-
    buffered (R, N) f32 planes).

    The transposed store makes R the output's LANE dimension, so Mosaic
    requires R % 128 == 0 (or R == n_rows for tiny grids). Beyond
    N = MAX_FUSED_N the 128-row block no longer fits VMEM — callers fall back
    to the unfused einsum path there (pallas_supported())."""
    r = 256
    while r > 8 and (r * n * 4 * 8 > vmem_budget or n_rows % r != 0):
        r //= 2
    if r < 128 and n_rows % 128 == 0:
        r = 128   # lane alignment beats the budget heuristic
    while n_rows % r != 0 and r > 1:
        r //= 2
    return r


def pallas_supported(n: int, fused: bool = False) -> bool:
    """True when a transposed-store kernel (plain ≤2048, k1-tiled beyond)
    fits VMEM at side N."""
    if fused:
        return n <= MAX_FUSED_N or (n <= MAX_FUSED_TILED_N
                                    and _pick_block_rows_tiled(n, n,
                                                               fused=True) > 0)
    return n <= MAX_PALLAS_N or (n <= MAX_TILED_N
                                 and _pick_block_rows_tiled(n, n) > 0)


def _pick_block_rows_tiled(n_rows: int, n: int, fused: bool = False,
                           vmem_budget=11 * 1024 * 1024) -> int:
    """Row block for the k1-tiled kernels, from a live-bytes model.

    Per row of block, live VMEM ≈ (plain kernel)
        2 planes × N × 4 B × 2   (double-buffered input refs)
      + 2 × N × 4                (ar/ai values materialized for stage 1)
      + 2 × N × 4                (cr/ci persistent scratch)
    = 24·N bytes/row; the fused kernel streams 5 input planes and builds
    ~6 assembly temps: ≈ (5·2 + 6 + 2)·N·4 = 72·N bytes/row. Output k1
    tiles and twiddle tables are small. Returns the largest divisor of
    ``n_rows`` under budget (multiple of 32 so the transposed store's minor
    dim keeps at least a quarter-lane), or 0 when none fits.
    """
    per_row = (72 if fused else 24) * n
    r = 128
    while r >= 32 and r * per_row > vmem_budget:
        r //= 2
    while r >= 32 and n_rows % r != 0:
        r //= 2
    return r if r >= 32 else 0


def fft1d_transposed_auto(re, im, inverse: bool,
                          precision=lax.Precision.HIGHEST):
    """[C, M, N] → transposed [C, N, M]: plain transposed-store kernel when
    it fits VMEM, the k1-tiled variant beyond (N > MAX_PALLAS_N)."""
    n = re.shape[-1]
    if n <= MAX_PALLAS_N:
        return _fft1d_transposed(re, im, inverse, precision)
    return _fft1d_transposed_tiled(re, im, inverse, precision)


def _fft1d_transposed(re, im, inverse: bool,
                      precision=lax.Precision.HIGHEST):
    """Batched 1-D transform along the last axis of [C, M, N]; returns
    [C, N, M] (transposed within each channel)."""
    c, m, n = re.shape
    n1, n2, f2r, f2i, twr, twi, f1r, f1i = _tables_np(n, inverse)
    r = _pick_block_rows(m, n)

    # the (N,) → (N2, N1) split is free in HBM; lane splits are not in VMEM
    re = re.reshape(c, m, n2, n1)
    im = im.reshape(c, m, n2, n1)

    kernel = functools.partial(_fft_block_kernel, n1=n1, n2=n2,
                               precision=precision)
    table = lambda shape: pl.BlockSpec(shape, lambda ci, bi: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_block = pl.BlockSpec((1, r, n2, n1), lambda ci, bi: (ci, bi, 0, 0),
                            memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((1, n, r), lambda ci, bi: (ci, 0, bi),
                             memory_space=pltpu.VMEM)

    ore, oim = pl.pallas_call(
        kernel,
        grid=(c, m // r),
        in_specs=[table((n2, n2)), table((n2, n2)),
                  table((n2, n1)), table((n2, n1)),
                  table((n1, n1)), table((n1, n1)),
                  in_block, in_block],
        out_specs=[out_block, out_block],
        out_shape=[jax.ShapeDtypeStruct((c, n, m), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=int(8 * c * m * n * (n1 + n2)),
            bytes_accessed=int(2 * 2 * c * m * n * 4),
            transcendentals=0),
        interpret=jax.default_backend() == "cpu",  # tests: fake-CPU meshes
    )(f2r, f2i, twr, twi, f1r, f1i, re, im)
    return ore, oim


def ifft2_pallas(x: jnp.ndarray, inverse: bool = True,
                 precision=lax.Precision.HIGHEST) -> jnp.ndarray:
    """Unnormalized inverse FFT over the last two axes of [..., N, N].

    Two fused passes; each transforms rows and stores transposed, so after
    the second pass the orientation is restored and both axes are done.
    """
    orig_shape = x.shape
    n0, n = x.shape[-2], x.shape[-1]
    re = jnp.real(x).astype(jnp.float32).reshape(-1, n0, n)
    im = jnp.imag(x).astype(jnp.float32).reshape(-1, n0, n)
    re, im = fft1d_transposed_auto(re, im, inverse, precision)  # axis -1 done
    re, im = fft1d_transposed_auto(re, im, inverse, precision)  # both done
    out = re + 1j * im
    return out.reshape(orig_shape)


def fft2_pallas(x: jnp.ndarray) -> jnp.ndarray:
    return ifft2_pallas(x, inverse=False)


# ---------------------------------------------------------------------------
# Large-N variant: k1-tiled stores. The transposed store of a full row
# (N × 128-lane block) pressures VMEM; here the output is tiled along k1
# (contiguous n-ranges since n = k1·N2 + k2): stage 1 + twiddle run once per
# row block into persistent VMEM scratch (grid revisits reuse it), and each
# inner grid step emits one k1 tile via a small MXU dot against the matching
# F1 row slice.
#
# VMEM envelope (v5e, 16 MB): at N = 4096 the r = 128 row block needs ~20 MB
# (double-buffered input refs + stage-1 values + scratch); the row block
# picker (_pick_block_rows_tiled) models the live bytes and drops r below
# the lane width instead — Mosaic pads the transposed store's minor dim, a
# bandwidth tax the VMEM wall forces. r = 64 keeps 4096² resident in ~8.5 MB.
# ---------------------------------------------------------------------------

def _fft_block_kernel_tiled(f2r_ref, f2i_ref, twr_ref, twi_ref,
                            f1r_ref, f1i_ref, re_ref, im_ref,
                            ore_ref, oim_ref, cr_s, ci_s,
                            *, n1, n2, ktile, precision):
    _, r, _, _ = re_ref.shape
    kt = pl.program_id(2)

    @pl.when(kt == 0)
    def _():
        # stage 1 one k2-row at a time: a full [n2, r, n1] intermediate plus
        # its transpose would add ~8 MB of transient VMEM at N=4096; the
        # per-row loop keeps temps at one [r, n1] tile
        ar = re_ref[:].reshape(r, n2, n1)
        ai = im_ref[:].reshape(r, n2, n1)

        def k2_row(s2, _):
            f2r = f2r_ref[pl.ds(s2, 1)]          # [1, s]
            f2i = f2i_ref[pl.ds(s2, 1)]
            cr = (_dot_mid(f2r, ar, precision)
                  - _dot_mid(f2i, ai, precision))  # [1, r, t]
            ci = (_dot_mid(f2r, ai, precision)
                  + _dot_mid(f2i, ar, precision))
            twr = twr_ref[pl.ds(s2, 1)][:, None, :]
            twi = twi_ref[pl.ds(s2, 1)][:, None, :]
            cr, ci = cr * twr - ci * twi, cr * twi + ci * twr
            cr_s[pl.ds(s2, 1)] = cr.transpose(0, 2, 1)   # [1, t, r]
            ci_s[pl.ds(s2, 1)] = ci.transpose(0, 2, 1)
            return 0

        lax.fori_loop(0, n2, k2_row, 0)

    f1r, f1i = f1r_ref[:], f1i_ref[:]     # [ktile, t] row slice
    cr = cr_s[:]
    ci = ci_s[:]
    # D[k1_tile, k2, r] = Σ_t F1[k1, t] C[k2, t, r]
    dr = _dot_mid(f1r, cr, precision) - _dot_mid(f1i, ci, precision)
    di = _dot_mid(f1r, ci, precision) + _dot_mid(f1i, cr, precision)
    ore_ref[:] = dr.reshape(1, ktile * n2, r)
    oim_ref[:] = di.reshape(1, ktile * n2, r)


def _fft1d_transposed_tiled(re, im, inverse: bool,
                            precision=lax.Precision.HIGHEST,
                            ktile: int = 16):
    """Large-N twin of _fft1d_transposed (same contract: [C, M, N] →
    transposed [C, N, M])."""
    c, m, n = re.shape
    n1, n2, f2r, f2i, twr, twi, f1r, f1i = _tables_np(n, inverse)
    while n1 % ktile != 0 and ktile > 1:
        ktile //= 2
    r = _pick_block_rows_tiled(m, n)
    if r == 0:
        raise ValueError(f"tiled kernel row block underruns the sublane "
                         f"floor at N={n} (M={m})")

    re = re.reshape(c, m, n2, n1)
    im = im.reshape(c, m, n2, n1)

    kernel = functools.partial(_fft_block_kernel_tiled, n1=n1, n2=n2,
                               ktile=ktile, precision=precision)
    table = lambda shape: pl.BlockSpec(shape, lambda ci, bi, kt: (0, 0),
                                       memory_space=pltpu.VMEM)
    f1_block = pl.BlockSpec((ktile, n1), lambda ci, bi, kt: (kt, 0),
                            memory_space=pltpu.VMEM)
    in_block = pl.BlockSpec((1, r, n2, n1), lambda ci, bi, kt: (ci, bi, 0, 0),
                            memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((1, ktile * n2, r),
                             lambda ci, bi, kt: (ci, kt, bi),
                             memory_space=pltpu.VMEM)

    ore, oim = pl.pallas_call(
        kernel,
        grid=(c, m // r, n1 // ktile),
        in_specs=[table((n2, n2)), table((n2, n2)),
                  table((n2, n1)), table((n2, n1)),
                  f1_block, f1_block,
                  in_block, in_block],
        out_specs=[out_block, out_block],
        out_shape=[jax.ShapeDtypeStruct((c, n, m), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((n2, n1, r), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=int(8 * c * m * n * (n1 + n2)),
            bytes_accessed=int(2 * 2 * c * m * n * 4),
            transcendentals=0),
        interpret=jax.default_backend() == "cpu",
    )(f2r, f2i, twr, twi, f1r, f1i, re, im)
    return ore, oim
