"""Pure-JAX radix-2 Stockham FFT (components C8/C9).

The reference runs one fragment pass per butterfly stage, scheduled from the
CPU with ping-pong render targets (Stockham.shader:31-57 driven by
OceanRenderer.cs:216-316 — 4·log2 N blits per frame). Here the whole stage
chain is an unrolled traced loop over precomputed gather indices and twiddles:
no host round trips, no double buffers (XLA handles liveness), and the 5
spectrum channels batch through as leading dimensions.

Per stage with sub-transform size S (S = 2, 4, ..., N), each output element i
combines (Stockham.shader:42-51):

    even_idx(i) = floor(i/S)·(S/2) + (i mod S/2)
    out[i]      = in[even_idx(i)] + W(i) · in[even_idx(i) + N/2]
    W(i)        = e^{±2πi·i/S}     (− forward, GetTwiddle FFTCommon.cginc:116-119;
                                    + inverse, the oracle's e^{+ik·x} convention)

This is the self-sorting (no bit reversal) Stockham autosort network: after
log2 N stages the result is the unnormalized (inverse) DFT in natural order.
Complex data is carried as (real, imag) float pairs — TPU vector units have no
complex type, and splitting lets XLA fuse the twiddle multiplies.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _stage_tables(n: int, inverse: bool):
    """Per-stage (even_idx int32[n], twiddle complex128[n]) trace-time tables."""
    assert n & (n - 1) == 0 and n >= 2, f"stockham needs power-of-two N, got {n}"
    stages = []
    idx = np.arange(n)
    sign = +1.0 if inverse else -1.0
    s = 2
    while s <= n:
        even = (idx // s) * (s // 2) + (idx % (s // 2))
        ang = sign * 2.0 * np.pi * (idx % s) / s
        stages.append((even.astype(np.int32), np.exp(1j * ang)))
        s *= 2
    return tuple(stages)


def fft_stockham_1d(x: jnp.ndarray, inverse: bool = True) -> jnp.ndarray:
    """Unnormalized (i)DFT along the LAST axis; any leading batch dims.

    x: complex array [..., N], N a power of two.
    """
    n = x.shape[-1]
    re = jnp.real(x)
    im = jnp.imag(x)
    for even_idx, tw in _stage_tables(n, inverse):
        ei = jnp.asarray(even_idx)
        oi = ei + n // 2
        er, eim = jnp.take(re, ei, axis=-1), jnp.take(im, ei, axis=-1)
        orr, oim = jnp.take(re, oi, axis=-1), jnp.take(im, oi, axis=-1)
        twr = jnp.asarray(tw.real, dtype=re.dtype)
        twi = jnp.asarray(tw.imag, dtype=re.dtype)
        # out = even + W·odd, complex multiply in split form
        re = er + twr * orr - twi * oim
        im = eim + twr * oim + twi * orr
    return re + 1j * im


def ifft2_stockham(x: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized inverse FFT over the last two axes (matches
    fft.reference.ifft2_unnorm). The reference's _HORIZONTAL → _VERTICAL
    keyword flip (Stockham.shader:25, OceanRenderer.cs:256-260) becomes a
    transpose between the two 1-D passes."""
    x = fft_stockham_1d(x, inverse=True)          # along axis -1
    x = jnp.swapaxes(x, -1, -2)
    x = fft_stockham_1d(x, inverse=True)
    return jnp.swapaxes(x, -1, -2)


def fft2_stockham(x: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized forward FFT2 — the GPU path's twiddle sign
    (GetTwiddle: −2π·ratio)."""
    x = fft_stockham_1d(x, inverse=False)
    x = jnp.swapaxes(x, -1, -2)
    x = fft_stockham_1d(x, inverse=False)
    return jnp.swapaxes(x, -1, -2)
