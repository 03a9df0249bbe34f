"""Fused per-grid-point Gerstner wave-bank kernel (C13, BASELINE config 3).

The reference evaluates the bank per vertex in the pond vertex shader
(MistralWaterLib.cginc:71-125): for each point, a short loop over W trochoidal
waves of sin/cos accumulation. The TPU-native version streams (R, N) tiles of
the coordinate grid through the VPU while the whole wave bank lives in SMEM as
scalars — one HBM read per coordinate plane, one write per output field, all
W waves fused into a single pass (no [N, N, W] intermediate is ever
materialized, unlike the naive jnp broadcast in gerstner.gerstner_eval).

Math per wave w (gerstner_eval is the jnp twin and the parity target):
    φ_w   = f_w·(x·dx_w + z·dz_w) + ω_w·t
    off  += (s_w·a_w·dx_w·cos φ_w,  a_w·sin φ_w,  s_w·a_w·dz_w·cos φ_w)
    n    −= (dx_w·f_w·a_w·cos φ_w,  s_w·f_w·a_w·sin φ_w,  dz_w·f_w·a_w·cos φ_w)
with n = normalize((nx, 1+ny, nz)) in 'analytic' mode, or the reference's
flat-normal quirk (0,1,0) (MistralWaterLib.cginc:98) in 'flat' mode.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gerstner_kernel(bank_ref, t_ref, x_ref, z_ref,
                     ox_ref, oy_ref, oz_ref, nx_ref, ny_ref, nz_ref,
                     *, num_waves, normal_mode):
    x = x_ref[:]
    z = z_ref[:]
    t = t_ref[0]
    zero = jnp.zeros_like(x)

    def body(w, acc):
        # fori_loop (not a Python unroll) so each wave's phase/cos/sin temps
        # are reused — an unrolled 16-wave bank keeps ~3 (R, N) planes live
        # per wave and blows the 16 MB VMEM budget.
        ox, oy, oz, nx, ny, nz = acc
        amp = bank_ref[0, w]
        steep = bank_ref[1, w]
        dx = bank_ref[2, w]
        dz = bank_ref[3, w]
        freq = bank_ref[4, w]
        omega = bank_ref[5, w]
        phase = freq * (x * dx + z * dz) + omega * t
        c = jnp.cos(phase)
        s = jnp.sin(phase)
        ox = ox + steep * amp * dx * c
        oz = oz + steep * amp * dz * c
        oy = oy + amp * s
        if normal_mode == "analytic":
            nx = nx - dx * freq * amp * c
            nz = nz - dz * freq * amp * c
            ny = ny - steep * freq * amp * s
        return ox, oy, oz, nx, ny, nz

    ox, oy, oz, nx, ny, nz = jax.lax.fori_loop(
        0, num_waves, body, (zero, zero, zero, zero, zero, zero))
    ox_ref[:] = ox
    oy_ref[:] = oy
    oz_ref[:] = oz
    if normal_mode == "analytic":
        ny1 = 1.0 + ny
        inv = jax.lax.rsqrt(nx * nx + ny1 * ny1 + nz * nz)
        nx_ref[:] = nx * inv
        ny_ref[:] = ny1 * inv
        nz_ref[:] = nz * inv
    else:  # 'flat' — the reference overwrites the normal with up
        nx_ref[:] = zero
        ny_ref[:] = jnp.ones_like(x)
        nz_ref[:] = zero


def _pick_rows(m: int, n: int, budget=4 * 1024 * 1024):
    r = 256
    while r > 8 and (r * n * 4 * 10 > budget or m % r != 0):
        r //= 2
    while m % r != 0 and r > 1:
        r //= 2
    return r


def gerstner_pallas(bank, x, z, t, normal_mode: str = "analytic"):
    """Evaluate a WaveBank over coordinate grids x, z [M, N] at time t.

    Returns PondFields like gerstner.gerstner_eval (the jnp twin).
    """
    from tpu_ocean.gerstner import PondFields  # local import: avoid cycle

    w = len(bank)
    arrs = bank.as_arrays()
    packed = np.stack([arrs["amps"], arrs["steeps"], arrs["dirs_x"],
                       arrs["dirs_z"], arrs["freqs"], arrs["omegas"]])
    m, n = x.shape
    r = _pick_rows(m, n)

    kernel = functools.partial(_gerstner_kernel, num_waves=w,
                               normal_mode=normal_mode)
    plane = pl.BlockSpec((r, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(m // r,),
        in_specs=[
            pl.BlockSpec((6, w), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda i: (0,), memory_space=pltpu.SMEM),
            plane, plane,
        ],
        out_specs=[plane] * 6,
        out_shape=[jax.ShapeDtypeStruct((m, n), jnp.float32)] * 6,
        cost_estimate=pl.CostEstimate(
            flops=int(20 * w * m * n), bytes_accessed=int(8 * m * n * 4),
            transcendentals=int(2 * w * m * n)),
        interpret=jax.default_backend() == "cpu",
    )(jnp.asarray(packed, jnp.float32),
      jnp.asarray(t, jnp.float32).reshape(1),
      x.astype(jnp.float32), z.astype(jnp.float32))
    ox, oy, oz, nx, ny, nz = outs
    return PondFields(ox, oy, oz, jnp.stack([nx, ny, nz], axis=-1))
