"""Mathematical property tests for every FFT backend: linearity, unitarity
(Parseval up to the unnormalized factor), impulse/DC responses, and
round-trip with the forward transform."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_ocean.fft import get_ifft2
from tpu_ocean.fft.stockham import fft2_stockham
from tpu_ocean.fft.matmul import fft2_matmul
from tpu_ocean.fft.pallas_fft import fft2_pallas

BACKENDS = ["reference", "stockham", "matmul", "pallas"]
N = 32


def _rand(seed, shape=(2, N, N)):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


@pytest.mark.parametrize("backend", BACKENDS)
def test_linearity(backend):
    f = get_ifft2(backend, N)
    a, b = _rand(0), _rand(1)
    lhs = np.asarray(f(jnp.asarray(2.0 * a + 3.0 * b)))
    rhs = 2.0 * np.asarray(f(jnp.asarray(a))) + 3.0 * np.asarray(f(jnp.asarray(b)))
    np.testing.assert_allclose(lhs, rhs, atol=1e-3)


@pytest.mark.parametrize("backend", BACKENDS)
def test_dc_impulse(backend):
    f = get_ifft2(backend, N)
    # spectrum = delta at k=0 → constant field of 1 (unnormalized inverse)
    x = np.zeros((1, N, N), np.complex64)
    x[0, 0, 0] = 1.0
    out = np.asarray(f(jnp.asarray(x)))
    np.testing.assert_allclose(out, 1.0 + 0j, atol=1e-5)
    # constant spectrum → N² spike at the origin
    y = np.ones((1, N, N), np.complex64)
    out = np.asarray(f(jnp.asarray(y)))
    assert abs(out[0, 0, 0] - N * N) < 1e-2
    assert np.abs(out[0, 1:, 1:]).max() < 1e-2


@pytest.mark.parametrize("backend", BACKENDS)
def test_parseval(backend):
    """Σ|F|² = N² Σ|X|² for the unnormalized inverse transform."""
    f = get_ifft2(backend, N)
    x = _rand(2, (1, N, N))
    out = np.asarray(f(jnp.asarray(x)))
    np.testing.assert_allclose(np.sum(np.abs(out) ** 2),
                               N * N * np.sum(np.abs(x) ** 2), rtol=1e-5)


@pytest.mark.parametrize("fwd,name", [
    (fft2_stockham, "stockham"),
    (fft2_matmul, "matmul"),
    (fft2_pallas, "pallas"),
])
def test_roundtrip_forward_inverse(fwd, name):
    """ifft2(fft2(x)) == N²·x for each backend pair."""
    inv = get_ifft2(name, N)
    x = _rand(3, (1, N, N))
    back = np.asarray(inv(jnp.asarray(np.asarray(fwd(jnp.asarray(x))))))
    np.testing.assert_allclose(back, N * N * x, atol=1e-2)
