"""Wavevector and coordinate grid builders (L1 math, component C1/C17).

Two wavevector conventions coexist in the reference and both are supported:

* ``centered`` — the CPU oracle's layout: k_n = 2π(n − N/2)/L, equivalently
  π(2n − N)/L (FFTMesh.cs:144-145,201,204). Index n runs 0..N-1, k runs from
  −πN/L to π(N−2)/L monotonically.

* ``fft`` — the GPU shaders' layout (FFTCommon.cginc:58-67): for pixel n the
  shader computes n' = n + 0.5 (texel center), subtracts 0.5, then wraps
  signed at N/2, giving k_n = 2π·wrap(n)/L with wrap(n) = n if n < N/2 else
  n − N — exactly numpy's fftfreq ordering.

Coordinate grids replicate the reference mesh generator (OceanRenderer.cs:172-207,
FFTMesh.cs:101-139): x_i = (i − N/2)·w, plus a half-cell offset when N is even.

Axis convention everywhere in this package: the FIRST array axis indexes x
(reference loop variable i), the SECOND indexes z (loop variable j), matching
the oracle's ``index = i * resolution + j`` layout (FFTMesh.cs:110).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpu_ocean.config import PI


def wavenumbers_1d(n: int, length: float, layout: str = "centered") -> np.ndarray:
    """1-D wavenumber array k_i for grid side ``n`` and patch length ``length``.

    Computed in float64 numpy at trace time (these are compile-time constants
    under jit); cast at use sites.
    """
    idx = np.arange(n, dtype=np.float64)
    if layout == "centered":
        k = 2.0 * PI * (idx - n / 2.0) / length      # FFTMesh.cs:201
    elif layout == "fft":
        wrapped = np.where(idx < n / 2.0, idx, idx - n)  # FFTCommon.cginc:63-64
        k = 2.0 * PI * wrapped / length
    else:
        raise ValueError(f"bad layout {layout!r}")
    return k


def wavevector_grid(n: int, length: float, layout: str = "centered"):
    """(kx, kz, k_mag) as [N, N] float64 numpy arrays, axis0 = x, axis1 = z."""
    k = wavenumbers_1d(n, length, layout)
    kx = k[:, None] * np.ones((1, n))
    kz = np.ones((n, 1)) * k[None, :]
    k_mag = np.sqrt(kx * kx + kz * kz)
    return kx, kz, k_mag


def coordinate_1d(n: int, unit_width: float) -> np.ndarray:
    """Reference mesh coordinates: x_i = (i − N/2)·w (+ w/2 for even N).

    FFTMesh.cs:107,111-112 — the half-cell offset keeps even grids centered
    on the origin.
    """
    idx = np.arange(n, dtype=np.float64)
    x = (idx - n // 2) * unit_width
    if n % 2 == 0:
        x = x + unit_width / 2.0
    return x


def coordinate_grid(n: int, unit_width: float):
    """(x, z) position grids, [N, N] float64, axis0 = x, axis1 = z."""
    c = coordinate_1d(n, unit_width)
    x = c[:, None] * np.ones((1, n))
    z = np.ones((n, 1)) * c[None, :]
    return x, z


def centered_ifft_factors(n: int, length: float, unit_width: float):
    """Pre/post modulation vectors turning a standard unnormalized IFFT into
    the oracle's centered direct sum  h(x_i) = Σ_n H_n · e^{i k_n x_i}.

    With k_n = 2π(n − N/2)/L, x_i = (i − N/2 + η)·w, w = L/N and η the even-N
    half-cell offset (0.5 for even N, FFTMesh.cs:112):

        k_n x_i = (2π/N)(n − N/2)(i − N/2 + η)

    which factorizes into e^{2πi·ni/N} (the IFFT kernel) times a per-n
    premodulation, a per-i postmodulation and a constant:

        pre(n)  = e^{−2πi n (N/2 − η)/N}
        post(i) = e^{−iπ i} · e^{iπ(N/2 − η)} = (−1)^i · e^{iπ(N/2 − η)}

    Requires length == n * unit_width for the DFT to land exactly on the
    oracle's sample points; callers enforce that.

    Returns (pre[n] complex128, post[n] complex128) so that
        h = post ⊗ post · IFFT2_unnorm(pre ⊗ pre · H).
    """
    # x_i = (i − ⌊N/2⌋)·w (+ w/2 for even N, coordinate_1d) is
    # (i − (N/2 − ½))·w for BOTH parities: even N adds the half cell
    # explicitly, odd N gets it from the floor (⌊N/2⌋ = N/2 − ½). η is
    # therefore ½ unconditionally — the old odd-N η = 0 landed the IFFT
    # half a cell off the oracle's sample points (64% rel err at N = 9;
    # review finding, r5 — only even N was ever tested or shipped).
    eta = 0.5
    shift = n / 2.0 - eta
    idx = np.arange(n, dtype=np.float64)
    pre = np.exp(-2j * np.pi * idx * shift / n)
    post = np.exp(-1j * np.pi * idx) * np.exp(1j * np.pi * shift)
    return pre, post


def as_jnp(arr: np.ndarray, dtype=jnp.float32):
    """Cast a trace-time numpy constant into a jnp array of ``dtype``."""
    return jnp.asarray(arr, dtype=dtype)
