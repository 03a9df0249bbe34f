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

import contextlib
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


#: manual 3-pass bf16 tier (VERDICT r3 #2a). Mosaic's dot_general accepts
#: only DEFAULT (one bf16 pass, ~4e-3 rel) and HIGHEST
#: (#tpu.contract_precision<fp32> — the full fp32-emulation pass stack;
#: lax.Precision.HIGH raises NotImplementedError, probed r3). The classic
#: bf16x3 middle ground is therefore hand-rolled: split each f32 operand
#: into hi + lo bf16 halves and keep the three largest cross terms
#: (hi·hi + hi·lo + lo·hi ≈ 1e-6 rel — the fp32-accumulation floor that
#: bounds large-N accuracy anyway, matmul._einsum_f32_precision), each a
#: native single-pass bf16 MXU dot.
B3 = "bf16x3"

#: grid sides STRICTLY ABOVE this would run the kernels' f32 (HIGHEST) tier
#: as manual bf16x3. DISABLED by default — measured on v5e at 1024² packed
#: (bench/probe_precision_tier.py, r3): B3 is SLOWER than HIGHEST
#: (0.736 vs 0.450 ms/step) even though its accuracy holds (~1e-5 field
#: delta): the per-dot bf16 split (2 casts + 1 subtract on full stage
#: tensors, ×9 dots) plus the bf16 relayouts cost ~0.29 ms of VPU time
#: against ≤0.15 ms of recoverable MXU time (DEFAULT measures 0.300
#: ms/step, bounding the total pass-count sensitivity). Kept as an explicit
#: precision sentinel for toolchains whose dot lowering accepts HIGH
#: natively (this Mosaic rejects it, so nothing cheaper than the manual
#: split exists here).
KERNEL_B3_THRESHOLD = 1 << 30


def kernel_precision(n: int, precision):
    """Map the requested MXU precision to the kernel tier for side ``n``
    (see KERNEL_B3_THRESHOLD). Callers hand the RESULT only to the Pallas
    kernels; einsum helpers keep receiving lax.Precision values."""
    if precision == lax.Precision.HIGHEST and n > KERNEL_B3_THRESHOLD:
        return B3
    return precision


def _split_bf16(x):
    """x (f32) → (hi, lo) bf16 with hi + lo ≈ x to ~2⁻¹⁶ relative."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot_mid(m, x, precision=lax.Precision.HIGHEST):
    """[a, b] · [r, b, t] contracting b (rhs middle) → [a, r, t].

    precision=HIGHEST (parity tier): Mosaic's fp32 contraction emulation
    (~1e-7 vs jnp.fft). precision=B3: manual 3-pass bf16 split (~1e-6, half
    the MXU passes — see B3 above). OceanConfig(precision='bfloat16')
    passes DEFAULT (single pass, ~4e-3) for the fast mode.
    """
    dims = (((1,), (1,)), ((), ()))
    if precision == B3:
        mh, ml = _split_bf16(m)
        xh, xl = _split_bf16(x)

        def d(a, b):
            return lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32,
                                   precision=lax.Precision.DEFAULT)

        return d(mh, xh) + d(mh, xl) + d(ml, xh)
    return lax.dot_general(m, x, dimension_numbers=dims,
                           preferred_element_type=jnp.float32,
                           precision=precision)


#: grid sides STRICTLY ABOVE this (with n1 == 128) would run stage 2 of the
#: transposed-store kernels as a THREE-FACTOR four-step: the 128-point DFT
#: against F1 itself Bailey-split 128 = 8·16, cutting the stage-2
#: contraction depth 128 → 8 + 16 at one extra in-VMEM twiddle. DISABLED by
#: default — measured on v5e at 1024² packed (r3,
#: bench/PROBE_r3_three_factor.json): 0.524 vs 0.448 ms/step despite the
#: 4.25× MAC cut, because the MXU here is pass-fixed-cost bound, not
#: MAC-throughput bound — depth-8/16 dots waste the 128-deep systolic fill,
#: and the rank-4 reshape/twiddle adds VPU work. (Same verdict family as
#: the bf16x3 tier and the r=256 block probe: DEFAULT precision bounds the
#: whole step's MXU-pass sensitivity at ~0.15 ms and none of the
#: restructurings recover it without costing more elsewhere.) The path
#: stays implemented + tested: on MXU generations with cheaper small-dot
#: issue it is one constant away.
THREE_FACTOR_THRESHOLD = 1 << 30
_SPLIT_W, _SPLIT_U = 8, 16           # 128 = W·U; t = w·U + u, k1 = a·W + b


@functools.lru_cache(maxsize=8)
def _split3_tables_np(n1: int, inverse: bool):
    """Tables for the in-kernel 3-factor split of the n1-point DFT:
    F1[k1, t] with k1 = a·W + b, t = w·U + u factorizes as

        B[b, u]   = Σ_w F_W[b, w] · c[w, u]          (contract the W digit)
        X[a·W+b]  = Σ_u F_U[a, u] · TW[b, u] · B[b, u]

    with F_W/F_U the small DFT tables and TW[b, u] = e^{±2πi·u·b/n1}. The
    identity needs W·U = n1 (ω^{a·W·w·U} = 1) and holds for any digit pair;
    (8, 16) keeps both factors MXU-friendly."""
    assert n1 == _SPLIT_W * _SPLIT_U
    sign = +1.0 if inverse else -1.0
    w, u = _SPLIT_W, _SPLIT_U
    fw = np.exp(sign * 2j * np.pi * np.outer(np.arange(w), np.arange(w)) / w)
    fu = np.exp(sign * 2j * np.pi * np.outer(np.arange(u), np.arange(u)) / u)
    tw = np.exp(sign * 2j * np.pi * np.outer(np.arange(w), np.arange(u)) / n1)
    f32 = np.float32
    return (fw.real.astype(f32), fw.imag.astype(f32),
            tw.real.astype(f32), tw.imag.astype(f32),
            fu.real.astype(f32), fu.imag.astype(f32))


def _use_split3(n: int, n1: int) -> bool:
    return n > THREE_FACTOR_THRESHOLD and n1 == _SPLIT_W * _SPLIT_U


def _dot4(m, x, contract_dim: int, precision):
    """2-D [a, b] · rank-4 x contracting x's dim ``contract_dim`` (probed
    legal on this Mosaic for dims 1 and 2 with a 128-lane minor dim)."""
    return lax.dot_general(
        m, x, dimension_numbers=(((1,), (contract_dim,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def _gauss4(mr, mi, xr, xi, dim: int, precision):
    """Gauss 3-dot complex product on the rank-4 contraction (tables are
    trace-time constants, so mr+mi folds)."""
    ms = mr + mi
    t1 = _dot4(mr, xr, dim, precision)
    t2 = _dot4(mi, xi, dim, precision)
    t3 = _dot4(ms, xr + xi, dim, precision)
    return t1 - t2, t3 - t1 - t2


def _stage2_split3(cr, ci, fwr, fwi, twr, twi, fur, fui, precision):
    """Three-factor stage 2: [k2, t, r] (t = w·U + u) → [k1, k2, r] with
    k1 = a·W + b in natural order — drop-in for the plain F1 Gauss dot.
    Two Gauss contractions of depth W and U plus one in-VMEM twiddle
    replace the depth-n1 contraction (see THREE_FACTOR_THRESHOLD)."""
    k2, t, r = cr.shape
    w_, u_ = fwr.shape[0], fur.shape[0]
    cr = cr.reshape(k2, w_, u_, r)        # sublane split (probed legal)
    ci = ci.reshape(k2, w_, u_, r)
    br, bi = _gauss4(fwr, fwi, cr, ci, 1, precision)    # [b, k2, u, r]
    tr = twr[:, None, :, None]
    ti = twi[:, None, :, None]
    br, bi = br * tr - bi * ti, br * ti + bi * tr
    dr, di = _gauss4(fur, fui, br, bi, 2, precision)    # [a, b, k2, r]
    return (dr.reshape(u_ * w_, k2, r),   # k1 = a·W + b row-major merge
            di.reshape(u_ * w_, k2, r))


def _gauss_cmul(mr, mi, ms, xr, xi, precision):
    """Complex matrix·tensor via Gauss's 3-multiplication identity.

    (Mr + iMi)(xr + i xi): t1 = Mr·xr, t2 = Mi·xi, t3 = (Mr+Mi)·(xr+xi)
    → re = t1 − t2, im = t3 − t1 − t2. One fewer MXU contraction than the
    4-dot form (the dominant cost at precision=HIGHEST, where every dot is
    a multi-pass bf16 decomposition); the extra adds ride the VPU. ``ms``
    is the PRECOMPUTED (Mr + Mi) — the DFT factors are trace-time tables,
    so the sum costs nothing per step. Measured: flagship transform
    0.407 → 0.342 ms at 1024² packed, full step 0.478 → 0.420
    (BASELINE.md; bench/STAGE_BREAKDOWN_r2_1024_packed_gauss.json). The
    trade: t3 − t1 − t2 cancels ~1 ulp harder than the 4-dot form — parity
    tests hold except isolated near-flat normal texels (~1e-4, bounded in
    tests/test_packing._assert_fields_close)."""
    t1 = _dot_mid(mr, xr, precision)
    t2 = _dot_mid(mi, xi, precision)
    t3 = _dot_mid(ms, xr + xi, precision)
    return t1 - t2, t3 - t1 - t2


def _fft_block_kernel(f2r_ref, f2i_ref, f2s_ref, twr_ref, twi_ref,
                      f1r_ref, f1i_ref, f1s_ref,
                      re_ref, im_ref, ore_ref, oim_ref, *, n1, n2,
                      precision=lax.Precision.HIGHEST):
    """(1, R, N2, N1) row block → 1-D transforms → transposed (1, N, R) store."""
    _, r, _, _ = re_ref.shape
    n = n1 * n2
    ar = re_ref[:].reshape(r, n2, n1)
    ai = im_ref[:].reshape(r, n2, n1)

    # B3 applies to stage 2 ONLY: it carries n1/(n1+n2) ≈ 94% of the MAC
    # work at 1024 (F1 is n1×n1 vs F2's n2×n2), and the bf16 split
    # temporaries of a full-B3 kernel blow the 16 MB VMEM stack at 1024
    # (probed: 18.21 M scoped allocation, compile-time OOM)
    p1 = lax.Precision.HIGHEST if precision == B3 else precision

    # C[k2, r, t] = Σ_s F2[k2, s] A[r, s, t]   (Gauss 3-dot complex product)
    cr, ci = _gauss_cmul(f2r_ref[:], f2i_ref[:], f2s_ref[:], ar, ai,
                         p1)

    # twiddle, broadcast over the row axis
    twr = twr_ref[:][:, None, :]
    twi = twi_ref[:][:, None, :]
    cr, ci = cr * twr - ci * twi, cr * twi + ci * twr

    # reorient so t is the middle (contractable) axis: [k2, t, r]
    cr = cr.transpose(0, 2, 1)
    ci = ci.transpose(0, 2, 1)

    # D[k1, k2, r] = Σ_t F1[k1, t] C[k2, t, r]
    dr, di = _gauss_cmul(f1r_ref[:], f1i_ref[:], f1s_ref[:], cr, ci,
                         precision)

    # X[n] with n = k2 + N2·k1 ⇔ [k1, k2] row-major; minor axis stays r.
    ore_ref[:] = dr.reshape(1, n, r)
    oim_ref[:] = di.reshape(1, n, r)


def _fft_block_kernel_split3(f2r_ref, f2i_ref, f2s_ref, twr_ref, twi_ref,
                             fwr_ref, fwi_ref, t3r_ref, t3i_ref,
                             fur_ref, fui_ref,
                             re_ref, im_ref, ore_ref, oim_ref, *, n1, n2,
                             precision=lax.Precision.HIGHEST):
    """_fft_block_kernel with stage 2 three-factored (THREE_FACTOR_THRESHOLD):
    the F1 table refs are replaced by the (F_W, TW, F_U) factor tables."""
    _, r, _, _ = re_ref.shape
    n = n1 * n2
    ar = re_ref[:].reshape(r, n2, n1)
    ai = im_ref[:].reshape(r, n2, n1)
    p1 = lax.Precision.HIGHEST if precision == B3 else precision
    cr, ci = _gauss_cmul(f2r_ref[:], f2i_ref[:], f2s_ref[:], ar, ai, p1)
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


# Transposed-store VMEM ceiling (see _pick_block_rows). Verified on
# hardware (v5e, 16 MB VMEM): both the pure FFT pass (2 input planes per
# block) and the fused assembly pass (5 planes after the in-kernel
# wavevector rebuild) compile+run at 2048 with the 128-row lane-aligned
# block, and OOM at 4096. Beyond the ceiling ifft2_planes_auto switches to
# the einsum four-step — see its docstring for why the hand kernel is
# physically out of moves there (a k1-tiled variant was built, probed on
# hardware, and deleted: Mosaic requires 128-lane transposed stores, a
# 128-row block needs ≥17 MB at N=4096, and sub-128 row blocks make the
# rank-3 stage-2 dot lowering illegal — "unsupported shape cast").
MAX_PALLAS_N = 2048
MAX_FUSED_N = 2048
#: smallest N whose C2R half route compiles on Mosaic: the fold length
#: M = N/2 must fill the 128-lane vector width once it lands on the lane
#: axis of the transposed store (probed r4: N ∈ {64, 128} → "infer-vector-
#: layout: unsupported shape cast"; 256 compiles). Below it
#: ifft2_planes_half mirrors the conjugate rows and rides the full
#: transform — same result, dispatch-bound sizes anyway. Hardware-only
#: (like the n % 128 route in ifft2_planes_auto): interpret mode keeps the
#: real kernels so the CPU suite's small-N parity tests still exercise them.
HALF_MIN_PALLAS_N = 256
#: natural-regime half route: run the column pass (length M = N/2, which
#: the C2R fold keeps ≤ MAX_PALLAS_N up to N = 4096) on the fused
#: transposed-store kernel instead of the einsum chain — see the branch in
#: ifft2_planes_half. Toggle for the hardware A/B probe.
HALF_NAT_COLUMN_KERNEL = True

#: 8192² HALF-channel column: M = N/2 = 4096 exceeds the kernel envelope,
#: but a radix-2 DIT over two M/2 = 2048 kernel columns fits — a DIFFERENT
#: comparison than COLUMN_RADIX2_KERNEL below (there the alternative was a
#: DIRECT kernel column and DIT lost +4.1%; here it replaces the einsum
#: chain's HBM intermediates and WINS on hardware: 58.97 vs 64.21 ms
#: full-step at 8192², −8.2%, same-process A/B tiny-K ladders, residual
#: 2.6e-4 (bench/PROBE_r5_half_radix2_8192.json) — the first f32 8192²
#: step under 60 ms.
HALF_COLUMN_RADIX2 = True

#: large-N FULL column pass: radix-2 decimation-in-time splits the length-N
#: column DFT into two length-N/2 transforms — which fit the fused
#: transposed-store kernel at N = 4096 where the full column does not —
#: plus one fused elementwise twiddle/butterfly. The same idea that won
#: +2.6% on the half channel (PROBE_r4_half_nat_column), applied to the
#: packed channels. DISABLED by default — measured NEGATIVE on v5e at
#: 4096² (bench/PROBE_r4_column_radix2.json: packed 17.07 vs 16.40,
#: shipping half config 13.75 vs 13.44): the DIT's strided even/odd
#: split, the pre-kernel transposes, and the butterfly add ~3 full-plane
#: HBM passes, while the einsum column already fuses its transpose INTO
#: the MXU contraction (matmul.ifft1d_planes_axis2) — the half channel's
#: engine swap wins only because the C2R fold hands the kernel a
#: half-length column with ONE swap and no split/butterfly. Kept
#: implemented + tested (the r3 convention): on parts with cheaper HBM
#: gathers it is one constant away.
COLUMN_RADIX2_KERNEL = False


def _ifft1d_axis2_radix2(re, im, inverse: bool, precision):
    """Length-M DFT along axis -2 of [C, M, N] as a radix-2 DIT over two
    length-M/2 sub-transforms (caller guarantees 256 | M and
    M/2 ≤ 2^k·MAX_PALLAS_N for a small k — each level halves until the
    transposed-store kernel fits, so M = 8192 runs 4 kernel columns at
    2048 under two butterfly levels):

        X[k]       = E[k] + ω^k·O[k]        ω = e^{±2πi/M}
        X[k + M/2] = E[k] − ω^k·O[k]

    E/O are the even/odd input rows' DFT_{M/2}; the twiddle butterfly is
    one fused elementwise pass XLA folds into the concat stores."""
    c, m, n = re.shape
    h = m // 2
    if h > MAX_PALLAS_N:
        er, ei = _ifft1d_axis2_radix2(re[:, 0::2], im[:, 0::2],
                                      inverse, precision)       # [C, M/2, N]
        orr, oi = _ifft1d_axis2_radix2(re[:, 1::2], im[:, 1::2],
                                       inverse, precision)
    else:
        er, ei = _fft1d_transposed(jnp.swapaxes(re[:, 0::2], -1, -2),
                                   jnp.swapaxes(im[:, 0::2], -1, -2),
                                   inverse, precision)          # [C, M/2, N]
        orr, oi = _fft1d_transposed(jnp.swapaxes(re[:, 1::2], -1, -2),
                                    jnp.swapaxes(im[:, 1::2], -1, -2),
                                    inverse, precision)
    sign = +1.0 if inverse else -1.0
    w = np.exp(sign * 2j * np.pi * np.arange(h) / m)   # host numpy constant
    wr = np.asarray(w.real, np.float32)[None, :, None]
    wi = np.asarray(w.imag, np.float32)[None, :, None]
    tr = wr * orr - wi * oi
    ti = wr * oi + wi * orr
    return (jnp.concatenate([er + tr, er - tr], axis=-2),
            jnp.concatenate([ei + ti, ei - ti], axis=-2))


@contextlib.contextmanager
def transposed_store_cap(n: int):
    """TEST/DRYRUN-ONLY: temporarily lower the transposed-store ceilings so
    a tiny grid routes through the large-N NATURAL-store + einsum-column
    regime (VERDICT r3 #5: the driver's CPU dryrun must exercise both
    regimes without monkeypatching library internals). Affects traces
    performed inside the context only — solvers built and traced inside
    keep the large-regime program, which is the point."""
    global MAX_PALLAS_N, MAX_FUSED_N
    import tpu_ocean.ops.fused_spectrum_fft as fsf
    old = (MAX_PALLAS_N, MAX_FUSED_N, fsf.MAX_FUSED_N)
    MAX_PALLAS_N = MAX_FUSED_N = n
    fsf.MAX_FUSED_N = n        # by-value module import (fsf line ~52)
    try:
        yield
    finally:
        MAX_PALLAS_N, MAX_FUSED_N = old[0], old[1]
        fsf.MAX_FUSED_N = old[2]


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


def half_column_pass(vr, vi, m: int, inverse: bool, precision):
    """The half channel's COLUMN transform (length ``m`` = N/2 along axis
    -2) with the measurement-backed engine dispatch — ONE implementation
    for the single-chip, sharded, and fused half routes (it was
    triplicated and drifted once before r5):

      * kernel column (transposed-store, axes swapped) when m fits the
        envelope and is lane-legal — PROBE_r4_half_nat_column, −2.7%;
      * radix-2 DIT over two kernel columns in the 8192² regime —
        PROBE_r5_half_radix2_8192, −8.2%;
      * einsum chain otherwise.
    """
    if (HALF_NAT_COLUMN_KERNEL and m <= MAX_PALLAS_N
            and m % 128 == 0):
        return _fft1d_transposed(jnp.swapaxes(vr, -1, -2),
                                 jnp.swapaxes(vi, -1, -2),
                                 inverse, precision)
    if (HALF_COLUMN_RADIX2 and m % 256 == 0
            and m // 2 <= MAX_PALLAS_N):
        return _ifft1d_axis2_radix2(vr, vi, inverse, precision)
    from tpu_ocean.fft.matmul import ifft1d_planes_axis2
    return ifft1d_planes_axis2(vr, vi, inverse, precision)


def transposed_rows_legal(n_rows: int, n: int) -> bool:
    """Mosaic lane rule for the TRANSPOSED store on hardware: the block
    the picker chooses for an ``n_rows`` batch must be a 128-multiple or
    the whole batch (sub-128 partial blocks → "unsupported shape cast").
    Full grids always satisfy this (n_rows = N with 128 | N); SHARDED
    batches of N/D rows need not (e.g. N = 1280, D = 4 → 320 rows →
    r = 64) — solver_dist validates with this predicate (review finding,
    r5)."""
    r = _pick_block_rows(n_rows, n)
    return r % 128 == 0 or r == n_rows


def pallas_supported(n: int, fused: bool = False) -> bool:
    """True when the solver can build a pallas-flavored pipeline at side N:
    the fused transposed-store kernels below MAX_PALLAS_N/MAX_FUSED_N, the
    einsum four-step beyond (ifft2_planes_auto switches internally)."""
    if n < 16 or n % 2:
        return False
    if fused and n > MAX_FUSED_N and n % 8:
        return False      # assemble_rowfft_natural needs 8-divisible rows
    return True


def ifft2_planes_auto(re, im, inverse: bool = True,
                      precision=lax.Precision.HIGHEST):
    """Full 2-D unnormalized (inverse) transform on (re, im) f32 planes
    [C, N, N] → [C, N, N], all-real, any even N ≥ 16.

    N ≤ MAX_PALLAS_N: two fused transposed-store Pallas passes (the
    row↔column turn never touches HBM). Beyond, the hand kernel is
    physically out of moves on this hardware (probed on v5e):
      * the transposed store requires a 128-lane row block (Mosaic rule),
        whose working set is ≥24·N·128 B ≈ 17 MB at N = 4096 — over the
        16 MB VMEM;
      * sub-128 row blocks make every rank-3 stage-2 dot illegal (Mosaic
        lowers them via a lane-merging reshape that needs a 128-wide minor
        dim — observed "unsupported shape cast").
    So large N runs the same four-step math as real-plane einsums on both
    axes (matmul.ifft1d_planes_lastaxis / _axis2): XLA stages HBM tiles
    itself and fuses elementwise producers (spectrum assembly) into the
    first contraction — exactly the structure VMEM forces anyway."""
    n = re.shape[-1]
    if n % 128 and jax.default_backend() != "cpu":
        # Mosaic's lane rule cuts BOTH ways: the transposed store needs the
        # 128-wide n1 factor, and _split_lanes can only supply it when
        # 128 | N. At N = 64 the kernel's lane-merging reshape
        # (vector<…x32> → flat) is rejected on hardware ("unsupported
        # shape cast", probed r4) even though interpret mode accepts it —
        # so every non-128-multiple rides the einsum four-step on both
        # axes (tiny grids are dispatch-bound; the kernel's HBM fusion
        # buys nothing there).
        from tpu_ocean.fft.matmul import (ifft1d_planes_lastaxis,
                                          ifft1d_planes_axis2)
        re, im = ifft1d_planes_lastaxis(re, im, inverse, precision)
        return ifft1d_planes_axis2(re, im, inverse, precision)
    if n <= MAX_PALLAS_N:
        re, im = _fft1d_transposed(re, im, inverse, precision)
        return _fft1d_transposed(re, im, inverse, precision)
    from tpu_ocean.fft.matmul import ifft1d_planes_axis2
    # row pass: the natural-store fused kernel (one HBM round trip);
    # column pass: einsum (a full column bundle exceeds VMEM), or — when
    # N/2 still fits the kernel envelope — the radix-2 DIT split over two
    # transposed-store kernel calls (COLUMN_RADIX2_KERNEL, probed r4)
    re, im = fft1d_natural_large(re, im, inverse, precision)
    m = re.shape[-2]
    if (COLUMN_RADIX2_KERNEL and m % 256 == 0
            and m // 2 <= 4 * MAX_PALLAS_N):
        # recursion in _ifft1d_axis2_radix2 halves until the kernel fits
        # (≤ 3 butterfly levels at the 4× bound). Default OFF for the FULL
        # channels: measured LOSS both at 4096² (+4.1% vs the direct
        # kernel column, PROBE_r4_column_radix2) and at 8192² (+9.5% vs
        # the einsum chain, 64.48 vs 58.90 ms —
        # bench/PROBE_r5_full_radix2_8192.json: two strided split levels
        # on the [2, 8192, 8192] packed planes out-cost the einsum
        # intermediates, unlike the HALF channel's single level on half
        # the rows, which WINS — HALF_COLUMN_RADIX2 above).
        return _ifft1d_axis2_radix2(re, im, inverse, precision)
    return ifft1d_planes_axis2(re, im, inverse, precision)


def _fft1d_transposed(re, im, inverse: bool,
                      precision=lax.Precision.HIGHEST):
    """Batched 1-D transform along the last axis of [C, M, N]; returns
    [C, N, M] (transposed within each channel).

    Differentiable (VERDICT r4 weak #4): Pallas kernels carry no autodiff
    rule, but this whole function is a LINEAR map whose matrix (the
    four-step-factorized DFT) is symmetric — so its VJP is the
    opposite-direction transform of the axis-swapped cotangents (for
    Y = T(W·X) with Wᵀ = W: X̄ = W̄·T(Ȳ) = T(G(T(Ȳ))) where G is this
    function with ``not inverse``; W̄ = conj W is exactly the flipped
    ``inverse`` table). Reverse-mode gradients therefore ride the SAME
    hand kernels, at kernel speed, exact to the transform's own fp floor —
    adjoint inversion runs on the shipping pipeline, not a jnp fallback.
    """
    return _fft1d_transposed_diff(re, im, bool(inverse), precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fft1d_transposed_diff(re, im, inverse, precision):
    return _fft1d_transposed_impl(re, im, inverse, precision)


def _fft1d_transposed_fwd(re, im, inverse, precision):
    return _fft1d_transposed_impl(re, im, inverse, precision), None


def _fft1d_transposed_bwd(inverse, precision, _res, ct):
    ctr, cti = ct
    gr, gi = _fft1d_transposed_impl(jnp.swapaxes(ctr, -1, -2),
                                    jnp.swapaxes(cti, -1, -2),
                                    not inverse, precision)
    return jnp.swapaxes(gr, -1, -2), jnp.swapaxes(gi, -1, -2)


_fft1d_transposed_diff.defvjp(_fft1d_transposed_fwd, _fft1d_transposed_bwd)


def _fft1d_transposed_impl(re, im, inverse: bool,
                           precision=lax.Precision.HIGHEST):
    c, m, n = re.shape
    precision = kernel_precision(n, precision)
    n1, n2, f2r, f2i, twr, twi, f1r, f1i = _tables_np(n, inverse)
    r = _pick_block_rows(m, n)

    # the (N,) → (N2, N1) split is free in HBM; lane splits are not in VMEM
    re = re.reshape(c, m, n2, n1)
    im = im.reshape(c, m, n2, n1)

    table = lambda shape: pl.BlockSpec(shape, lambda ci, bi: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_block = pl.BlockSpec((1, r, n2, n1), lambda ci, bi: (ci, bi, 0, 0),
                            memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((1, n, r), lambda ci, bi: (ci, 0, bi),
                             memory_space=pltpu.VMEM)

    if _use_split3(n, n1):
        kernel = functools.partial(_fft_block_kernel_split3, n1=n1, n2=n2,
                                   precision=precision)
        w_, u_ = _SPLIT_W, _SPLIT_U
        stage2_specs = [table((w_, w_)), table((w_, w_)),
                        table((w_, u_)), table((w_, u_)),
                        table((u_, u_)), table((u_, u_))]
        stage2_args = _split3_tables_np(n1, inverse)
        flops = int(6 * c * m * n * (n2 + w_ + u_))
    else:
        kernel = functools.partial(_fft_block_kernel, n1=n1, n2=n2,
                                   precision=precision)
        stage2_specs = [table((n1, n1))] * 3
        stage2_args = (f1r, f1i, f1r + f1i)
        flops = int(6 * c * m * n * (n1 + n2))     # Gauss: 3 dots per stage

    ore, oim = pl.pallas_call(
        kernel,
        grid=(c, m // r),
        in_specs=[table((n2, n2)), table((n2, n2)), table((n2, n2)),
                  table((n2, n1)), table((n2, n1))]
                 + stage2_specs + [in_block, in_block],
        out_specs=[out_block, out_block],
        out_shape=[jax.ShapeDtypeStruct((c, n, m), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(2 * 2 * c * m * n * 4),
            transcendentals=0),
        interpret=jax.default_backend() == "cpu",  # tests: fake-CPU meshes
    )(f2r, f2i, f2r + f2i, twr, twi, *stage2_args, re, im)
    return ore, oim


# ---------------------------------------------------------------------------
# Large-N row pass: natural-orientation store. The transposed store dies at
# N ≥ 4096 (VMEM/lane wall, ifft2_planes_auto), but a NATURAL-store fused
# row pass is legal at any N — three Mosaic behaviors probed OK on v5e:
#   1. rank-3 LHS dots may contract their MINOR dim against a 2-D rhs
#      (stage 2: [k2, r, t] · F1ᵀ[t, k1] → [k2, r, k1]);
#   2. the (1, 2, 0) transpose [k2, r, k1] → [r, k1, k2] lowers;
#   3. a 4-D (c, m, n1, n2) output with block (1, r, n1, n2) is legal for
#      ANY r ≥ 8 (last dim == full n2), and the HBM reshape to (c, m, n)
#      lands index k1·n2 + k2 — the four-step's output order — for free.
# One HBM read + one write per plane for the row axis; the column pass
# stays einsum (its working set is a full 4096-long column bundle ≳ VMEM).
# ---------------------------------------------------------------------------

def _rowfft_core(ar, ai, f2r, f2i, twr, twi, f1tr, f1ti, precision):
    """[r, n2(s), n1(t)] spectrum planes → natural-order row FFT
    [r, n1(k1), n2(k2)] (flattens to index k1·n2+k2). Shared by the plain
    and fused (assembly-in-kernel) large-N row kernels. Both stages use the
    Gauss 3-dot complex product (see _gauss_cmul); the summed tables are
    built in-kernel from the passed factors — they are tiny trace-time
    constants and Mosaic folds the adds."""
    # stage 1: C[k2, r, t] = Σ_s F2[k2, s] A[r, s, t]. B3 → stage 2 only
    # (same VMEM-stack reasoning as _fft_block_kernel; stage 1 is ~6% of
    # the MACs at 1024)
    p1 = lax.Precision.HIGHEST if precision == B3 else precision
    cr, ci = _gauss_cmul(f2r, f2i, f2r + f2i, ar, ai, p1)
    twr_b = twr[:, None, :]
    twi_b = twi[:, None, :]
    cr, ci = cr * twr_b - ci * twi_b, cr * twi_b + ci * twr_b

    def d(a, b):   # rank-3 lhs, minor-dim contraction (probed legal)
        dims = (((2,), (0,)), ((), ()))
        if precision == B3:
            ah, al = _split_bf16(a)
            bh, bl = _split_bf16(b)

            def dd(u, v):
                return lax.dot_general(u, v, dimension_numbers=dims,
                                       preferred_element_type=jnp.float32,
                                       precision=lax.Precision.DEFAULT)

            return dd(ah, bh) + dd(ah, bl) + dd(al, bh)
        return lax.dot_general(a, b, dimension_numbers=dims,
                               preferred_element_type=jnp.float32,
                               precision=(lax.Precision.DEFAULT
                                          if precision == lax.Precision.DEFAULT
                                          else lax.Precision.HIGHEST))

    # stage 2: D[k2, r, k1] = Σ_t C[k2, r, t] F1ᵀ[t, k1] (Gauss again)
    t1 = d(cr, f1tr)
    t2 = d(ci, f1ti)
    t3 = d(cr + ci, f1tr + f1ti)
    dr = t1 - t2
    di = t3 - t1 - t2
    return dr.transpose(1, 2, 0), di.transpose(1, 2, 0)   # [r, k1, k2]


def _rowfft_block_kernel_natural(f2r_ref, f2i_ref, twr_ref, twi_ref,
                                 f1tr_ref, f1ti_ref, re_ref, im_ref,
                                 ore_ref, oim_ref, *, n1, n2, precision):
    _, r, _, _ = re_ref.shape
    ar = re_ref[:].reshape(r, n2, n1)
    ai = im_ref[:].reshape(r, n2, n1)
    dr, di = _rowfft_core(ar, ai, f2r_ref[:], f2i_ref[:], twr_ref[:],
                          twi_ref[:], f1tr_ref[:], f1ti_ref[:], precision)
    ore_ref[:] = dr[None]
    oim_ref[:] = di[None]


def _pick_block_rows_natural(n_rows: int, n: int, planes: int,
                             vmem_budget=10 * 1024 * 1024) -> int:
    """Row block for the natural-store kernels: live bytes ≈
    (2·planes input refs (double-buffered) + ~10 stage temps + 4 out) ·
    r·n·4. Any divisor ≥ 8 is layout-legal. Returns 0 when no r ≥ 8
    divides n_rows — callers must fall back (a grid of n_rows // r would
    silently leave the trailing rows unwritten)."""
    per_row = (2 * planes + 14) * n * 4
    r = 128
    while r > 8 and (r * per_row > vmem_budget or n_rows % r != 0):
        r //= 2
    return r if n_rows % r == 0 else 0


def fft1d_natural_large(re, im, inverse: bool,
                        precision=lax.Precision.HIGHEST):
    """[C, M, N] → row transform along the last axis, natural orientation
    out ([C, M, N]); the any-N Pallas row pass (see section comment).

    Differentiable via the same linear-adjoint rule as _fft1d_transposed
    (symmetric DFT matrix; no axis swap here): the VJP is this function
    with the opposite ``inverse`` flag on the cotangents."""
    return _fft1d_natural_large_diff(re, im, bool(inverse), precision)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fft1d_natural_large_diff(re, im, inverse, precision):
    return _fft1d_natural_large_impl(re, im, inverse, precision)


def _fft1d_natural_large_fwd(re, im, inverse, precision):
    return _fft1d_natural_large_impl(re, im, inverse, precision), None


def _fft1d_natural_large_bwd(inverse, precision, _res, ct):
    return _fft1d_natural_large_impl(ct[0], ct[1], not inverse, precision)


_fft1d_natural_large_diff.defvjp(_fft1d_natural_large_fwd,
                                 _fft1d_natural_large_bwd)


def _fft1d_natural_large_impl(re, im, inverse: bool,
                              precision=lax.Precision.HIGHEST):
    c, m, n = re.shape
    r = _pick_block_rows_natural(m, n, planes=2)
    if r == 0:
        # no r ≥ 8 divides the row count: einsum row pass (same math)
        from tpu_ocean.fft.matmul import ifft1d_planes_lastaxis
        return ifft1d_planes_lastaxis(re, im, inverse, precision)
    precision = kernel_precision(n, precision)
    n1, n2, f2r, f2i, twr, twi, f1r, f1i = _tables_np(n, inverse)

    re = re.reshape(c, m, n2, n1)
    im = im.reshape(c, m, n2, n1)

    kernel = functools.partial(_rowfft_block_kernel_natural, n1=n1, n2=n2,
                               precision=precision)
    table = lambda shape: pl.BlockSpec(shape, lambda ci, bi: (0, 0),
                                       memory_space=pltpu.VMEM)
    in_block = pl.BlockSpec((1, r, n2, n1), lambda ci, bi: (ci, bi, 0, 0),
                            memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((1, r, n1, n2), lambda ci, bi: (ci, bi, 0, 0),
                             memory_space=pltpu.VMEM)

    ore, oim = pl.pallas_call(
        kernel,
        grid=(c, m // r),
        in_specs=[table((n2, n2)), table((n2, n2)),
                  table((n2, n1)), table((n2, n1)),
                  table((n1, n1)), table((n1, n1)),
                  in_block, in_block],
        out_specs=[out_block, out_block],
        out_shape=[jax.ShapeDtypeStruct((c, m, n1, n2), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=int(6 * c * m * n * (n1 + n2)),   # Gauss: 3 dots/stage
            bytes_accessed=int(2 * 2 * c * m * n * 4),
            transcendentals=0),
        interpret=jax.default_backend() == "cpu",
    )(f2r, f2i, twr, twi, f1r.T.copy(), f1i.T.copy(), re, im)
    return ore.reshape(c, m, n), oim.reshape(c, m, n)


# ---------------------------------------------------------------------------
# Half-spectrum (C2R) route — the per-transform half of the Hermitian
# symmetry (VERDICT r3 #1). A Hermitian spectrum S[k1,k2] = conj(S[-k1,-k2])
# transforms to a REAL field, so the full complex 2-D pipeline computes
# twice the information it keeps. This route harvests it:
#
#   1. row pass on spectral rows k1 = 0..N/2-1 only (+ the Nyquist row via a
#      one-row einsum): x̂[k1, n2] for the top half. By Hermitian symmetry
#      x̂[N-k1, n2] = conj(x̂[k1, n2]), so the bottom half is never computed.
#   2. column pass as the classic C2R even/odd fold (the same identity the
#      reference's Stockham two-channel packing uses one level shallower,
#      Stockham.shader:53-54): with M = N/2 and Y[k] = x̂[k, n2],
#
#          v[m]  = x[2m, n2] + i·x[2m+1, n2]
#                = Σ_{k=0}^{M-1} V[k] e^{+2πi mk/M},
#          V[k]  = P[k] + i·w[k]·Q[k],   w[k] = e^{+2πi k/N},
#          P     = Y + conj(G),  Q = Y − conj(G),
#          G[k]  = Y[M−k]  (G[0] = Y[M], the Nyquist plane).
#
#      One length-M complex transform per column instead of length-N, then
#      the outputs interleave as even/odd spatial rows.
#
# Cost per Hermitian channel ≈ half a full channel on BOTH passes — and the
# column pass's stage intermediates (the measured 4096² HBM bottleneck,
# BASELINE.md r3 probes) halve with it. Composes with pack_channels: the
# last packed channel carries a single real field (A = 0 in
# evolve.packed_coefficients), so its spectrum is exactly Hermitian.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _c2r_twiddles_np(m: int, inverse: bool):
    """w[k] = e^{±2πi k / (2m)} for the C2R even/odd fold."""
    sign = +1.0 if inverse else -1.0
    w = np.exp(sign * 2j * np.pi * np.arange(m) / (2 * m))
    return w.real.astype(np.float32), w.imag.astype(np.float32)


def _c2r_combine(yr, yi, nyqr, nyqi, inverse: bool, axis: int):
    """V[k] = (Y + conj(G)) + i·w·(Y − conj(G)) along ``axis`` (the k1
    axis of the half row-pass output); nyq* are the Nyquist planes shaped
    with a size-1 dim at ``axis``. Pure XLA elementwise + flip — runs
    between the two Pallas passes."""
    m = yr.shape[axis]
    wc_np, ws_np = _c2r_twiddles_np(m, inverse)
    shape = [1] * yr.ndim
    shape[axis] = m
    wc = jnp.asarray(wc_np).reshape(shape)
    ws = jnp.asarray(ws_np).reshape(shape)
    ax = axis % yr.ndim
    gr = jnp.concatenate(
        [nyqr, jnp.flip(lax.slice_in_dim(yr, 1, None, axis=ax), ax)], ax)
    gi = jnp.concatenate(
        [nyqi, jnp.flip(lax.slice_in_dim(yi, 1, None, axis=ax), ax)], ax)
    pr, pi = yr + gr, yi - gi
    qr, qi = yr - gr, yi + gi
    return (pr - wc * qi - ws * qr,
            pi + wc * qr - ws * qi)


def ifft2_planes_half(re, im, inverse: bool = True,
                      precision=lax.Precision.HIGHEST):
    """Half-spectrum 2-D inverse transform: (re, im) [C, N/2+1, N] — rows
    k1 = 0..N/2 of a HERMITIAN spectrum — → REAL spatial fields [C, N, N]
    (one f32 array; the Im part is identically zero and never computed).
    Unnormalized, same conventions as ifft2_planes_auto. Both regimes:
    transposed-store Pallas ≤ MAX_PALLAS_N, natural-store + einsum column
    beyond."""
    if not inverse:
        raise NotImplementedError("the C2R fold is derived for the inverse "
                                  "transform (the solver's only direction)")
    c, mp1, n = re.shape
    m = mp1 - 1
    if 2 * m != n:
        raise ValueError(f"half-spectrum input must carry N/2+1 rows; "
                         f"got {mp1} for N={n}")
    if (n < HALF_MIN_PALLAS_N or n % 256) and jax.default_backend() != "cpu":
        # Mosaic rejects the transposed-store pass when the fold length
        # M = N/2 lands on the LANE axis below the 128-lane vector width
        # ("infer-vector-layout: unsupported shape cast", probed r4 at
        # N ∈ {64, 128}; N ≥ 256 compiles) — and at ANY transform length
        # not divisible by 128 (the non-128 lane split, probed r4). The
        # C2R fold runs kernels at BOTH lengths N (row pass) and M = N/2
        # (column pass), so the gate must demand 128 | N/2, i.e.
        # N % 256 == 0: at N ≡ 128 (mod 256) — e.g. 384, the solver's
        # N % 16 check accepts it and no reroute fires — the M-length
        # kernels are illegal on hardware (review finding, r5; the r4
        # ADVICE fix only checked N itself). Reconstruct the conjugate
        # rows — H[N−k1, (N−k2)%N] = conj H[k1, k2] — and ride the full
        # transform, whose auto route handles every N (kernels at
        # N % 128 == 0, einsum four-step otherwise): ≤ 256² the step is
        # dispatch-bound anyway, and N ≡ 128 (mod 256) grids keep the
        # full-length kernels.
        mir_r = jnp.roll(jnp.flip(re[:, 1:m], axis=(-2, -1)), 1, axis=-1)
        mir_i = jnp.roll(jnp.flip(im[:, 1:m], axis=(-2, -1)), 1, axis=-1)
        fr, _ = ifft2_planes_auto(jnp.concatenate([re, mir_r], axis=1),
                                  jnp.concatenate([im, -mir_i], axis=1),
                                  inverse, precision)
        return fr
    from tpu_ocean.fft.matmul import (ifft1d_planes_lastaxis,
                                      ifft1d_planes_axis2)
    # Nyquist spectral row: one-row transform (2·N² MACs — noise)
    nyr, nyi = ifft1d_planes_lastaxis(re[:, m:, :], im[:, m:, :],
                                      inverse, precision)       # [C, 1, N]
    if n <= MAX_PALLAS_N:
        # transposed regime: k1 lands on the LANE axis after pass 1
        yr, yi = _fft1d_transposed(re[:, :m], im[:, :m], inverse,
                                   precision)                   # [C, N, M]
        vr, vi = _c2r_combine(yr, yi,
                              jnp.swapaxes(nyr, -1, -2),
                              jnp.swapaxes(nyi, -1, -2), inverse, axis=-1)
        xr, xi = _fft1d_transposed(vr, vi, inverse, precision)  # [C, M, N]
    else:
        # natural regime: k1 stays on axis -2; column pass at length M
        yr, yi = fft1d_natural_large(re[:, :m], im[:, :m], inverse,
                                     precision)                 # [C, M, N]
        vr, vi = _c2r_combine(yr, yi, nyr, nyi, inverse, axis=-2)
        # measurement-backed column-engine dispatch, shared with the
        # sharded and fused half routes (half_column_pass)
        xr, xi = half_column_pass(vr, vi, m, inverse, precision)
    # x[2m] = Re v[m], x[2m+1] = Im v[m]: interleave as even/odd rows
    return jnp.stack([xr, xi], axis=2).reshape(c, n, n)


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
    re, im = ifft2_planes_auto(re, im, inverse, precision)
    out = re + 1j * im
    return out.reshape(orig_shape)


def fft2_pallas(x: jnp.ndarray) -> jnp.ndarray:
    return ifft2_pallas(x, inverse=False)
