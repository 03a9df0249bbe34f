"""Validate the vectorized oracle against a literal scalar-loop
transliteration of FFTMesh.cs at tiny N (the O(N⁴) double loop, verbatim)."""

import numpy as np

from tpu_ocean.config import G, PI, EPSILON, FFT_MESH_DEMO
from tpu_ocean.oracle import Oracle, _smoothstep01


def _scalar_oracle(cfg, h0, h0_conj, t):
    """Direct, unvectorized port of FFTMesh.cs Displacement/EvaluateWaves."""
    n = cfg.resolution
    length = cfg.length
    w0 = 2 * PI / length
    half = n // 2

    def x_of(i):
        return (i - half) * cfg.unit_width + (cfg.unit_width / 2 if n % 2 == 0 else 0.0)

    def dispersion(i, j):
        kx = PI * (2 * i - n) / length
        kz = PI * (2 * j - n) / length
        return np.floor(np.sqrt(G * np.hypot(kx, kz)) / w0) * w0

    def htilde(t, i, j):
        om = dispersion(i, j) * t
        c0 = np.cos(om) + 1j * np.sin(om)
        return h0[i, j] * c0 + h0_conj[i, j] * np.conj(c0)

    height = np.zeros((n, n))
    dx = np.zeros((n, n))
    dz = np.zeros((n, n))
    normals = np.zeros((n, n, 3))
    for vi in range(n):
        for vj in range(n):
            x, z = x_of(vi), x_of(vj)
            h = 0.0 + 0.0j
            d = np.zeros(2)
            nvec = np.zeros(3)
            for i in range(n):
                kx = 2 * PI * (i - n / 2.0) / length
                for j in range(n):
                    kz = 2 * PI * (j - n / 2.0) / length
                    k_len = np.hypot(kx, kz)
                    k_dot_x = kx * x + kz * z
                    hc = htilde(t, i, j) * (np.cos(k_dot_x) + 1j * np.sin(k_dot_x))
                    h += hc
                    nvec += np.array([-kx * hc.imag, 0.0, -kz * hc.imag])
                    if k_len < EPSILON:
                        continue
                    d += np.array([kx / k_len * hc.imag, -kz / k_len * hc.imag])
            height[vi, vj] = h.real
            dx[vi, vj] = d[0]
            dz[vi, vj] = d[1]
            nr = np.array([0.0, 1.0, 0.0]) - nvec
            normals[vi, vj] = nr / np.linalg.norm(nr)
    return height, dx, dz, normals


def test_oracle_matches_scalar_loop():
    cfg = FFT_MESH_DEMO.replace(resolution=8, length=8.39)
    rng = np.random.default_rng(42)
    n = cfg.resolution
    h0 = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    h0c = rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n))
    h0 *= 0.01
    h0c *= 0.01
    t = 1.37

    oracle = Oracle(cfg, h0=h0, h0_conj=h0c)
    f = oracle.fields(t)
    eh, edx, edz, en = _scalar_oracle(cfg, h0, h0c, t)

    np.testing.assert_allclose(f.height, eh, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(f.disp_x, edx, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(f.disp_z, edz, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(f.normal, en, rtol=1e-9, atol=1e-12)


def test_oracle_foam_formula():
    """Foam replicates FFTMesh.cs:253-276 one-sided differences."""
    cfg = FFT_MESH_DEMO.replace(resolution=6, length=6.0)
    rng = np.random.default_rng(1)
    n = cfg.resolution
    h0 = 0.05 * (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    h0c = 0.05 * (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    oracle = Oracle(cfg, h0=h0, h0_conj=h0c)
    f = oracle.fields(0.5)

    hds = np.stack([f.disp_x, f.disp_z], axis=-1)
    for i in range(n):
        for j in range(n):
            ddx = (0.5 * (hds[i, j] - hds[i + 1, j]) if i != n - 1
                   else np.zeros(2))
            ddy = (0.5 * (hds[i, j] - hds[i, j + 1]) if j != n - 1
                   else np.zeros(2))
            jac = (1 + ddx[0]) * (1 + ddy[1]) - ddx[1] * ddy[0]
            noise = 0.3 * np.hypot(abs(f.normal[i, j, 0]), abs(f.normal[i, j, 2]))
            turb = max(1 - jac + noise, 0.0)
            np.testing.assert_allclose(f.jacobian[i, j], jac, rtol=1e-9)
            np.testing.assert_allclose(f.foam[i, j], _smoothstep01(np.array(turb)),
                                       rtol=1e-9)


def test_oracle_quantized_dispersion_periodicity():
    """With quantized ω every mode completes integer cycles over T = L."""
    cfg = FFT_MESH_DEMO.replace(resolution=8, length=8.0)
    rng = np.random.default_rng(3)
    n = cfg.resolution
    h0 = 0.01 * (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    h0c = 0.01 * (rng.normal(size=(n, n)) + 1j * rng.normal(size=(n, n)))
    oracle = Oracle(cfg, h0=h0, h0_conj=h0c)
    f0 = oracle.fields(0.25)
    f1 = oracle.fields(0.25 + cfg.length)  # period T = 2π/ω₀ = L
    np.testing.assert_allclose(f0.height, f1.height, rtol=1e-7, atol=1e-12)
