"""Unit tests for wavevector / coordinate grids (C1, C17)."""

import numpy as np
import pytest

from tpu_ocean import grids
from tpu_ocean.config import PI


def test_centered_wavenumbers_match_reference_formula():
    # k = π(2n − N)/L (FFTMesh.cs:144-145) == 2π(n − N/2)/L (FFTMesh.cs:201)
    n, length = 16, 25.0
    k = grids.wavenumbers_1d(n, length, "centered")
    expected = np.array([PI * (2 * i - n) / length for i in range(n)])
    np.testing.assert_allclose(k, expected, rtol=1e-12)


def test_fft_wavenumbers_match_shader_wrap():
    # GetWave (FFTCommon.cginc:58-67): texel n+0.5, minus 0.5, signed wrap at N/2.
    n, length = 8, 10.0
    k = grids.wavenumbers_1d(n, length, "fft")

    def shader_wave(texel_n):
        nn = texel_n + 0.5 - 0.5
        nn = nn if nn < n * 0.5 else nn - n
        return 2 * PI * nn / length

    expected = np.array([shader_wave(i) for i in range(n)])
    np.testing.assert_allclose(k, expected, rtol=1e-12)
    # ... which is exactly numpy's fftfreq ordering
    np.testing.assert_allclose(k, 2 * np.pi * np.fft.fftfreq(n, d=length / n),
                               rtol=1e-6)


@pytest.mark.parametrize("n", [12, 13])
def test_coordinates_match_reference_mesh(n):
    # x = (i − N/2)·w + (w/2 iff N even) (FFTMesh.cs:107,112)
    w = 1.5
    x = grids.coordinate_1d(n, w)
    half = n // 2
    expected = np.array([(i - half) * w + (w / 2 if n % 2 == 0 else 0.0)
                         for i in range(n)])
    np.testing.assert_allclose(x, expected, rtol=1e-12)
    if n % 2 == 0:
        # even grids are symmetric about the origin
        np.testing.assert_allclose(x, -x[::-1], atol=1e-12)


@pytest.mark.parametrize("n", [8, 16])
def test_centered_ifft_factors_reproduce_direct_sum(n):
    """post·IFFT(pre·H) must equal Σ H e^{i k x} at the oracle's positions."""
    rng = np.random.default_rng(0)
    w = 0.7
    length = n * w
    h = rng.normal(size=n) + 1j * rng.normal(size=n)

    k = grids.wavenumbers_1d(n, length, "centered")
    x = grids.coordinate_1d(n, w)
    direct = np.array([np.sum(h * np.exp(1j * k * xi)) for xi in x])

    pre, post = grids.centered_ifft_factors(n, length, w)
    via_fft = post * (np.fft.ifft(pre * h) * n)
    np.testing.assert_allclose(via_fft, direct, rtol=1e-9, atol=1e-9)


def test_centered_ifft_factors_odd_n():
    """η = ½ for BOTH parities: odd N's floor already centers the mesh at
    (i − N/2 + ½)·w, so the old odd-N η = 0 put the IFFT half a cell off
    the oracle's sample points (64% rel err at N = 9 — review finding,
    r5). Exactness pinned at both parities."""
    from tpu_ocean.grids import centered_ifft_factors, coordinate_1d
    for n in (8, 9, 13, 16):
        w = 1.0
        length = n * w
        rng = np.random.default_rng(0)
        h = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        k = 2 * np.pi * (np.arange(n) - n / 2) / length
        x = coordinate_1d(n, w)
        direct = np.array([np.sum(h * np.exp(1j * k * xi)) for xi in x])
        pre, post = centered_ifft_factors(n, length, w)
        via = post * np.fft.ifft(pre * h) * n
        assert np.abs(via - direct).max() < 1e-10 * np.abs(direct).max(), n
