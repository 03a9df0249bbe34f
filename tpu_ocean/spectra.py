"""Phillips spectrum, Gaussian h0 sampling and dispersion relations (C2-C4).

All functions are pure and shape-polymorphic over the wavevector arrays, so
they fuse into the surrounding jitted step. Wavevector grids are trace-time
numpy constants from :mod:`tpu_ocean.grids`.

Reference formulas:
  * Phillips  — FFTCommon.cginc:69-85 (GPU, damping 0.01) and
                FFTMesh.cs:149-166 (CPU, damping 0.001):
                P(k) = A · exp(−1/(|k|²l²)) / |k|⁴ · (k̂·ŵ)² · exp(−|k|²l²d²),
                l = |w|²/g, zero below EPSILON.
  * h0        — h̃₀(k) = (ξ₁ + iξ₂)·sqrt(P(k)/2) with ξ ~ N(0,1)
                (FFTMesh.cs:168-176 via Box–Muller; FFTCommon.cginc:87-99 via a
                frac(sin(dot)) hash — reproduced here only for GPU-parity).
  * dispersion — capillary: ω = sqrt(g|k|(1 + |k|²/370²)) (FFTCommon.cginc:106-114);
                 quantized: ω = floor(sqrt(g|k|)/ω₀)·ω₀, ω₀ = 2π/L, which makes
                 the motion exactly periodic in time (FFTMesh.cs:141-147).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from tpu_ocean.config import G, PI, EPSILON


# ---------------------------------------------------------------------------
# Phillips spectrum (C2)
# ---------------------------------------------------------------------------

def phillips(kx, kz, amplitude: float, wind, damping: float, g: float = G):
    """Phillips spectrum P(k) over wavevector arrays.

    Works on numpy or jnp inputs; returns the same family. ``amplitude`` is the
    final Phillips A (callers apply any amplitude_scale beforehand).
    """
    xp = jnp if isinstance(kx, jnp.ndarray) else np
    wx, wz = float(wind[0]), float(wind[1])
    w_len = np.sqrt(wx * wx + wz * wz)
    l = w_len * w_len / g                       # largest wave from wind speed
    l2 = l * l
    big_l2 = l2 * damping * damping             # suppression of tiny waves

    k_mag = xp.sqrt(kx * kx + kz * kz)
    k2 = k_mag * k_mag
    k4 = k2 * k2
    # (k̂ · ŵ)² directional factor
    k_dot_w = (kx * wx + kz * wz) / xp.maximum(k_mag * w_len, 1e-30)
    k_dot_w2 = k_dot_w * k_dot_w

    safe_k2 = xp.maximum(k2, 1e-30)
    safe_k4 = xp.maximum(k4, 1e-30)
    p = (
        amplitude
        * xp.exp(-1.0 / (safe_k2 * l2))
        / safe_k4
        * k_dot_w2
        * xp.exp(-safe_k2 * big_l2)
    )
    return xp.where(k_mag < EPSILON, xp.zeros_like(p), p)


def jonswap(kx, kz, amplitude: float, wind, fetch: float = 100e3,
            gamma: float = 3.3, g: float = G, length: float = None,
            spreading: float = 2.0, depth: float = None):
    """JONSWAP directional wavenumber spectrum (beyond the reference — see
    docs/roadmap.md #8; Hasselmann et al. 1973).

    Converted from the frequency form via deep-water dispersion ω = √(gk):
        Ψ(k) = S(ω(k)) · (dω/dk) / k · D(θ),   dω/dk = g/(2ω)
    with the cos² directional spreading D(θ) = (2/π)·cos²(θ−θ_wind) for
    downwind directions (zero upwind), peak frequency from the fetch-limited
    relation ω_p = 22·(g²/(U·F))^{1/3}, and α = 0.076·(U²/(F·g))^{0.22}.
    With ``length`` given, the per-mode variance includes the mode area
    Δk² = (2π/L)² so the synthesized surface has the PHYSICAL variance of
    the JONSWAP sea state (Hs ≈ 4σ in meters) at amplitude = 1; without it
    the raw density is returned (unit-agnostic gain, like the Phillips
    path).

    ``spreading`` is the cosine exponent s in D(θ) ∝ cosˢ(θ−θ_wind)
    (normalized over the downwind half-plane; 2 = the classic cos² model,
    larger = narrower directional lobe). ``depth`` (meters) applies the
    TMA/Kitaigorodskii finite-depth attenuation Φ(ω, h) (Bouws et al. 1985,
    the standard 2-branch approximation) for shallow-water sea states.
    """
    xp = jnp if isinstance(kx, jnp.ndarray) else np
    wx, wz = float(wind[0]), float(wind[1])
    u = float(np.hypot(wx, wz)) or 1e-6
    f = max(float(fetch), 1.0)
    alpha = 0.076 * (u * u / (f * g)) ** 0.22
    omega_p = 22.0 * (g * g / (u * f)) ** (1.0 / 3.0)

    k_mag = xp.sqrt(kx * kx + kz * kz)
    safe_k = xp.maximum(k_mag, 1e-12)
    omega = xp.sqrt(g * safe_k)
    sigma = xp.where(omega <= omega_p, 0.07, 0.09)
    rr = xp.exp(-((omega - omega_p) ** 2)
                / (2.0 * sigma * sigma * omega_p * omega_p))
    s_w = (alpha * g * g / xp.maximum(omega, 1e-12) ** 5
           * xp.exp(-1.25 * (omega_p / xp.maximum(omega, 1e-12)) ** 4)
           * gamma ** rr)
    # polar→cartesian wavenumber density with dω/dk = g/(2ω)
    psi = s_w * (g / (2.0 * xp.maximum(omega, 1e-12))) / safe_k

    cos_t = (kx * wx + kz * wz) / (safe_k * u)
    # cos^s over the downwind half-plane; normalization
    # ∫_{-π/2}^{π/2} cosˢθ dθ = √π·Γ((s+1)/2)/Γ(s/2+1)
    import math
    norm = (math.sqrt(math.pi) * math.gamma((spreading + 1.0) / 2.0)
            / math.gamma(spreading / 2.0 + 1.0))
    spread = xp.where(cos_t > 0.0,
                      xp.maximum(cos_t, 0.0) ** spreading / norm, 0.0)

    p = amplitude * psi * spread

    if depth is not None:
        # TMA finite-depth factor, Kitaigorodskii 2-branch approximation:
        # Φ ≈ ω*²/2 for ω* ≤ 1, 1 − (2 − ω*)²/2 for 1 < ω* < 2, 1 beyond,
        # with ω* = ω·sqrt(h/g)
        ws = omega * np.sqrt(max(float(depth), 1e-6) / g)
        phi = xp.where(ws <= 1.0, 0.5 * ws * ws,
                       xp.where(ws < 2.0, 1.0 - 0.5 * (2.0 - ws) ** 2, 1.0))
        p = p * phi
    if length is not None:
        dk = 2.0 * PI / float(length)
        p = p * (dk * dk)
    return xp.where(k_mag < EPSILON, xp.zeros_like(p), p)


def spectrum_fn(model: str):
    """'phillips' (the reference's, default) or 'jonswap'."""
    if model == "phillips":
        return phillips
    if model == "jonswap":
        return jonswap
    raise ValueError(f"bad spectrum model {model!r}")


# ---------------------------------------------------------------------------
# h0 sampling (C3)
# ---------------------------------------------------------------------------

def sample_h0(key: jax.Array, phillips_spec) -> jax.Array:
    """h̃₀(k) = (ξ₁ + iξ₂)·sqrt(P(k)/2), ξ ~ N(0,1) via jax.random.

    The reference RNGs (Unity Random.value / shader hash) are platform-bound
    and non-reproducible; this replaces them with counter-based jax.random so
    the same seed yields identical h0 on every device and host (SURVEY.md §4.5).
    """
    spec = jnp.asarray(phillips_spec, dtype=jnp.float32)
    noise = jax.random.normal(key, spec.shape + (2,), dtype=jnp.float32)
    scale = jnp.sqrt(spec / 2.0)
    return (noise[..., 0] + 1j * noise[..., 1]).astype(jnp.complex64) * scale


def sample_h0_planes(key: jax.Array, phillips_spec):
    """(re, im) f32 planes of sample_h0 — identical draw (same key, same
    noise layout, bit-equal values) with complex64 never formed. Exists for
    the all-real step path (solver.OceanStateReal): on runtimes whose
    complex support is unreliable, even one eager complex op in the process
    can poison later transfers (CLAUDE.md)."""
    spec = jnp.asarray(phillips_spec, dtype=jnp.float32)
    noise = jax.random.normal(key, spec.shape + (2,), dtype=jnp.float32)
    scale = jnp.sqrt(spec / 2.0)
    return noise[..., 0] * scale, noise[..., 1] * scale


def _spectrum_pair(kx, kz, amplitude, wind, damping, length,
                   model: str, jonswap_kw):
    """(P(k), P(−k)) under the selected spectrum model — the ONE dispatch
    shared by all three h0-pair samplers (it was triplicated before r5;
    `jonswap_kw` is also scrubbed of a duplicate 'length' key, which would
    have raised TypeError on the call)."""
    spec = spectrum_fn(model)
    if model == "phillips":
        return (spec(kx, kz, amplitude, wind, damping),
                spec(-kx, -kz, amplitude, wind, damping))
    kw = dict(jonswap_kw or {})
    kw.pop("length", None)
    return (spec(kx, kz, amplitude, wind, length=length, **kw),
            spec(-kx, -kz, amplitude, wind, length=length, **kw))


def h0_pair_fft_planes(key: jax.Array, n: int, length: float,
                       amplitude: float, wind, damping: float,
                       model: str = "phillips", jonswap_kw: dict = None):
    """(h0_re, h0_im, h0c_re, h0c_im) — h0_pair_fft with the conjugation
    expressed as an imag-plane negation, complex64 never formed."""
    from tpu_ocean.grids import wavevector_grid

    kx, kz, _ = wavevector_grid(n, length, "fft")
    p_pos, p_neg = _spectrum_pair(kx, kz, amplitude, wind, damping, length,
                                  model, jonswap_kw)
    k1, k2 = jax.random.split(key)
    r1, i1 = sample_h0_planes(k1, p_pos)
    r2, i2 = sample_h0_planes(k2, p_neg)
    return r1, i1, r2, -i2


def h0_pair_centered(key: jax.Array, n: int, length: float, amplitude: float,
                     wind, damping: float, model: str = "phillips",
                     jonswap_kw: dict = None):
    """(h0, h0conj) in the oracle's centered layout (FFTMesh.cs:114-116).

    h0 is drawn at P(k_{n,m}); the conjugate partner is drawn INDEPENDENTLY at
    the mirrored formula evaluation P(k_{N−n,N−m}) = P(−k) and conjugated —
    matching ``vertConj[i] = conj(htilde0(N−i, N−j))``. Independence (rather
    than a Hermitian pairing) is a property of the reference that makes the
    complex field non-Hermitian; the solver therefore keeps complex IFFTs and
    extracts Re/Im parts per field (SURVEY.md §3.3).
    """
    from tpu_ocean.grids import wavevector_grid

    kx, kz, _ = wavevector_grid(n, length, "centered")
    # k at index (N−n, N−m): π(2(N−n)−N)/L = −k_n exactly.
    p_pos, p_neg = _spectrum_pair(kx, kz, amplitude, wind, damping, length,
                                  model, jonswap_kw)
    k1, k2 = jax.random.split(key)
    h0 = sample_h0(k1, p_pos)
    h0_conj = jnp.conj(sample_h0(k2, p_neg))
    return h0, h0_conj


def h0_pair_fft(key: jax.Array, n: int, length: float, amplitude: float,
                wind, damping: float, model: str = "phillips",
                jonswap_kw: dict = None):
    """(h0, h0conj) in the GPU shaders' FFT-ordered layout.

    InitialSpectrum.shader:42-53 evaluates Phillips at texel coordinate
    n' = n + 0.5 and its "mirror" N − n', which after GetWave's −0.5 offset
    lands on wrap(N − n − 1) — one texel off a true conjugate mirror. That
    off-by-one is a reference quirk; we implement the corrected mirror
    P(−k) (identical for every index except the k=0 row/col, where P=0 anyway
    in centered layout, and negligible at FFT ordering's Nyquist row).
    """
    from tpu_ocean.grids import wavevector_grid

    kx, kz, _ = wavevector_grid(n, length, "fft")
    p_pos, p_neg = _spectrum_pair(kx, kz, amplitude, wind, damping, length,
                                  model, jonswap_kw)
    k1, k2 = jax.random.split(key)
    h0 = sample_h0(k1, p_pos)
    h0_conj = jnp.conj(sample_h0(k2, p_neg))
    return h0, h0_conj


# ---------------------------------------------------------------------------
# GPU-parity hash RNG (FFTCommon.cginc:37-41,87-99) — optional bit-level
# emulation of the shader path, useful for replaying the Unity demo exactly.
# ---------------------------------------------------------------------------

def uv_random(u, v, salt: float, random: float):
    """frac(sin(dot(uv + (salt, random), (12.9898, 78.233))) * 43758.5453)."""
    xp = jnp if isinstance(u, jnp.ndarray) else np
    uu = u + salt
    vv = v + random
    return xp.mod(xp.sin(uu * 12.9898 + vv * 78.233) * 43758.5453, 1.0)


def h_tilde0_hash(u, v, r1: float, r2: float, phillips_spec):
    """Shader-path h0: Box–Muller over the UVRandom hash, rand clamped to
    [0.01, 1] (FFTCommon.cginc:87-99)."""
    xp = jnp if isinstance(u, jnp.ndarray) else np
    rand1 = xp.clip(uv_random(u, v, 10.612, r1), 0.01, 1.0)
    rand2 = xp.clip(uv_random(u, v, 11.899, r2), 0.01, 1.0)
    x = xp.sqrt(-2.0 * xp.log(rand1))
    y = 2.0 * PI * rand2
    re = x * xp.cos(y)
    im = x * xp.sin(y)
    amp = xp.sqrt(phillips_spec / 2.0)
    return (re * amp) + 1j * (im * amp)


# ---------------------------------------------------------------------------
# Dispersion relations (C4)
# ---------------------------------------------------------------------------

def dispersion_capillary(k_mag, g: float = G, k_m: float = 370.0):
    """ω(k) = sqrt(g|k|(1 + |k|²/k_m²)) — continuous, with the capillary
    correction term (FFTCommon.cginc:106-114; k_m = 370 rad/m)."""
    xp = jnp if isinstance(k_mag, jnp.ndarray) else np
    return xp.sqrt(g * k_mag * (1.0 + (k_mag * k_mag) / (k_m * k_m)))


def dispersion_quantized(k_mag, length: float, g: float = G):
    """ω(k) = floor(sqrt(g|k|)/ω₀)·ω₀ with ω₀ = 2π/L — quantized so every mode
    has an integer number of periods in T = L (FFTMesh.cs:141-147)."""
    xp = jnp if isinstance(k_mag, jnp.ndarray) else np
    w0 = 2.0 * PI / length
    return xp.floor(xp.sqrt(g * k_mag) / w0) * w0


def dispersion(k_mag, mode: str, length: float, g: float = G):
    if mode == "capillary":
        return dispersion_capillary(k_mag, g)
    if mode == "quantized":
        return dispersion_quantized(k_mag, length, g)
    raise ValueError(f"bad dispersion mode {mode!r}")


# ---------------------------------------------------------------------------
# GPU shader-hash h0 (bit-faithful reimplementation of the HLSL path)
# ---------------------------------------------------------------------------

def uv_random_f32(uv_x, uv_y, salt: float, random: float):
    """Strict-float32 twin of :func:`uv_random` (every intermediate held in
    f32, like the shader ALU) — used by the texel-exact
    :func:`h0_pair_gpu_hash` path. Same caveat as the reference: a
    screen-space hash, uniform-ish on [0,1), not statistically clean.
    """
    f32 = np.float32
    x = (np.asarray(uv_x, f32) + f32(salt))
    y = (np.asarray(uv_y, f32) + f32(random))
    d = (x * f32(12.9898) + y * f32(78.233)).astype(f32)
    v = (np.sin(d, dtype=f32) * f32(43758.5453)).astype(f32)
    return (v - np.floor(v)).astype(f32)


def h0_pair_gpu_hash(n: int, length: float, amplitude: float, wind,
                     seed1: float, seed2: float, damping: float = 0.01):
    """(h0, h0_conj) exactly as the InitialSpectrum pass computes them
    (InitialSpectrum.shader:42-54 + hTilde0, FFTCommon.cginc:87-99), in
    float32 numpy:

      * texel-center uv = (i + 0.5)/N per axis; the shader's n = uv·N = i+0.5
        feeds GetWave's −0.5 offset (the fft layout in grids.py)
      * h0     = hTilde0(uv, seed1/2, seed2·2, Phillips(n, m))
      * h0conj = conj(hTilde0(uv, seed1, seed2, Phillips(N−n, N−m)))
      * hTilde0 draws rand1/rand2 from uv_random with salts 10.612 / 11.899,
        clamps to [0.01, 1], then Box–Muller × sqrt(P/2)

    The reference binds seed1/seed2 from Unity's Random.value
    (OceanRenderer.cs:147-148); pass any floats here for reproducibility.
    """
    f32 = np.float32
    idx = np.arange(n, dtype=f32)
    uv1 = (idx + f32(0.5)) / f32(n)
    ux, uy = np.meshgrid(uv1, uv1, indexing="ij")
    nn = ux * f32(n)      # = i + 0.5, the shader's n
    mm = uy * f32(n)

    def _phillips_shader(pn, pm):
        # Phillips via GetWave's wrapped k (FFTCommon.cginc:58-85), float32
        a = pn - f32(0.5)
        b = pm - f32(0.5)
        a = np.where(a < n * 0.5, a, a - f32(n)).astype(f32)
        b = np.where(b < n * 0.5, b, b - f32(n)).astype(f32)
        kx = f32(2 * PI) * a / f32(length)
        kz = f32(2 * PI) * b / f32(length)
        return np.asarray(phillips(kx.astype(np.float64),
                                   kz.astype(np.float64),
                                   amplitude, wind, damping), f32)

    def _htilde0(r1, r2, phi):
        rand1 = np.clip(uv_random_f32(ux, uy, 10.612, r1),
                        0.01, 1.0).astype(f32)
        rand2 = np.clip(uv_random_f32(ux, uy, 11.899, r2),
                        0.01, 1.0).astype(f32)
        x = np.sqrt(f32(-2.0) * np.log(rand1, dtype=f32)).astype(f32)
        y = (f32(2 * PI) * rand2).astype(f32)
        scale = np.sqrt(phi / f32(2.0)).astype(f32)
        return ((x * np.cos(y, dtype=f32)) * scale
                + 1j * (x * np.sin(y, dtype=f32)) * scale
                ).astype(np.complex64)

    phi1 = _phillips_shader(nn, mm)
    phi2 = _phillips_shader(f32(n) - nn, f32(n) - mm)
    h0 = _htilde0(f32(seed1) / 2, f32(seed2) * 2, phi1)
    h0_conj = np.conj(_htilde0(f32(seed1), f32(seed2), phi2))
    return h0, h0_conj
