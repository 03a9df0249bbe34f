"""Physical diagnostics of the simulated sea state (SURVEY.md §5.5's metric
layer, extended with the oceanographic quantities a production consumer
monitors — none exist in the reference).

All functions are pure jnp over OceanFields/arrays and jit/shard_map safe.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpu_ocean.config import G


def significant_wave_height(height: jnp.ndarray) -> jnp.ndarray:
    """Hs ≈ 4·σ(η) — the standard spectral estimate from surface variance."""
    return 4.0 * jnp.std(height)


def surface_variance(height: jnp.ndarray) -> jnp.ndarray:
    return jnp.var(height)


def foam_coverage(foam: jnp.ndarray) -> jnp.ndarray:
    """Fraction of the surface breaking (foam coverage > ½)."""
    return jnp.mean((foam > 0.5).astype(jnp.float32))


#: deprecated alias — the function never measured wave steepness (Hs·k/2);
#: it is the foam-coverage fraction (review finding, r5). Kept one round
#: for import compatibility.
steepness = foam_coverage


def omnidirectional_spectrum(height: jnp.ndarray, length: float,
                             nbins: int = 0):
    """(k_bins, E(k)): azimuthally-integrated variance density from the
    heightfield — the observable to compare against the Phillips input.
    Returns host numpy (analysis utility, not for the hot loop)."""
    h = np.asarray(height, dtype=np.float64)
    n = h.shape[0]
    hk = np.fft.fft2(h) / (n * n)
    e2 = np.abs(hk) ** 2
    k1 = 2 * np.pi * np.fft.fftfreq(n, d=length / n)
    kx, kz = np.meshgrid(k1, k1, indexing="ij")
    km = np.sqrt(kx ** 2 + kz ** 2)
    nbins = nbins or n // 2
    k_edges = np.linspace(0, km.max() + 1e-12, nbins + 1)
    which = np.digitize(km.ravel(), k_edges) - 1
    e = np.bincount(which.clip(0, nbins - 1), weights=e2.ravel(),
                    minlength=nbins)
    widths = np.diff(k_edges)
    centers = 0.5 * (k_edges[1:] + k_edges[:-1])
    return centers, e / np.maximum(widths, 1e-300)


def peak_period(height: jnp.ndarray, length: float) -> float:
    """T_p from the spectral peak wavenumber via deep-water dispersion."""
    k, e = omnidirectional_spectrum(height, length)
    kp = float(k[1:][np.argmax(e[1:])])   # skip the DC bin
    if kp <= 0:
        return float("inf")
    return float(2 * np.pi / np.sqrt(G * kp))


def energy_budget(fields) -> dict:
    """Scalar summary block for the observability stream."""
    return {
        "hs": float(significant_wave_height(fields.height)),
        "var": float(surface_variance(fields.height)),
        "foam_cover": float(foam_coverage(fields.foam)),
        "max_disp": float(jnp.max(jnp.sqrt(fields.disp_x ** 2
                                           + fields.disp_z ** 2))),
        "min_jacobian": float(jnp.min(fields.jacobian)),
    }
