"""Fused surface-fields stencil kernel: normals + Jacobian whitecaps (C10+C11).

The reference runs these as two separate full-screen passes
(OceanNormal.shader:39-56, WhiteCap.shader:33-45), each re-reading the
displacement/height textures with periodic wrap sampling. Here both stencils
run in ONE Pallas pass over row blocks:

  * row (x-axis) neighbors come from HALO reads: inputs stay in HBM
    (pl.ANY) and the kernel DMAs an 8-row halo band on each side of the
    block into VMEM scratch (Mosaic requires 8-sublane-aligned memory
    slices; only one halo row is consumed), with modular start indices for
    the periodic wraparound — the reference's repeat-mode texture
    addressing, hand-rolled;
  * column (z-axis) neighbors are lane rolls (pltpu.roll) of the resident
    block — periodic by construction since a full row is lane-resident.

Inputs: disp_x·chop, height, disp_z·chop (the displaced-position components,
OceanNormal's GetVec). Outputs: normal xyz, foam, jacobian — five planes,
one HBM read per input plane + halo rows, one write per output.

Pure-jnp twins: fields.normals_stencil + fields.whitecap_gpu (the parity
targets in tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _smoothstep01(t):
    t = jnp.clip(t, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


HALO = 8  # Mosaic memory slices must be 8-sublane aligned; 1 row is used


def _fields_kernel(dx_hbm, h_hbm, dz_hbm,
                   nx_ref, ny_ref, nz_ref, foam_ref, jac_ref,
                   dx_s, h_s, dz_s, sem,
                   *, r, n, m, texel):
    bi = pl.program_id(0)
    row0 = bi * r

    # Three 8-aligned copies per plane — body (r rows) plus an 8-row halo
    # band on each side, with modular (wrapped) start indices: DMA shapes
    # must be static and 8-row aligned, starts may be traced.
    def load3(plane_hbm, scratch, s0, s1, s2):
        # mod obscures divisibility from the compiler; all three starts are
        # multiples of 8 by construction (r and m are)
        up = pl.multiple_of(jnp.mod(row0 - HALO, m), HALO)
        dn = pl.multiple_of(jnp.mod(row0 + r, m), HALO)
        c0 = pltpu.make_async_copy(plane_hbm.at[pl.ds(up, HALO)],
                                   scratch.at[pl.ds(0, HALO)], sem.at[s0])
        c1 = pltpu.make_async_copy(plane_hbm.at[pl.ds(row0, r)],
                                   scratch.at[pl.ds(HALO, r)], sem.at[s1])
        c2 = pltpu.make_async_copy(plane_hbm.at[pl.ds(dn, HALO)],
                                   scratch.at[pl.ds(HALO + r, HALO)],
                                   sem.at[s2])
        c0.start()
        c1.start()
        c2.start()
        return c0, c1, c2

    copies = (load3(dx_hbm, dx_s, 0, 1, 2)
              + load3(h_hbm, h_s, 3, 4, 5)
              + load3(dz_hbm, dz_s, 6, 7, 8))
    for c in copies:
        c.wait()

    # full aligned loads; shifted row views are VALUE slices (sublane
    # rotations), not memory slices, so odd offsets are fine
    dx = dx_s[:]
    h = h_s[:]
    dz = dz_s[:]

    def mid(a):
        return a[HALO:HALO + r, :]

    def xm(a):   # row i-1
        return a[HALO - 1:HALO - 1 + r, :]

    def xp(a):   # row i+1
        return a[HALO + 1:HALO + 1 + r, :]

    # z-axis neighbors: lane roll of the interior (full row resident)
    def zm(a):
        return pltpu.roll(mid(a), 1, 1)

    def zp(a):   # pltpu.roll wants non-negative shifts: −1 ≡ n−1 (mod n)
        return pltpu.roll(mid(a), n - 1, 1)

    p = (mid(dx), mid(h), mid(dz))

    # ---- normals: 4 cross products of displaced-edge vectors
    # (OceanNormal.shader:39-56); "right" = +x neighbor, "top" = −z neighbor
    def edge(nb_dx, nb_h, nb_dz, ox, oz):
        return (nb_dx - p[0] + ox, nb_h - p[1], nb_dz - p[2] + oz)

    right = edge(xp(dx), xp(h), xp(dz), texel, 0.0)
    left = edge(xm(dx), xm(h), xm(dz), -texel, 0.0)
    top = edge(zm(dx), zm(h), zm(dz), 0.0, -texel)
    bottom = edge(zp(dx), zp(h), zp(dz), 0.0, texel)

    def cross(a, b):
        return (a[1] * b[2] - a[2] * b[1],
                a[2] * b[0] - a[0] * b[2],
                a[0] * b[1] - a[1] * b[0])

    c1 = cross(right, top)
    c2 = cross(top, left)
    c3 = cross(left, bottom)
    c4 = cross(bottom, right)
    nx = c1[0] + c2[0] + c3[0] + c4[0]
    ny = c1[1] + c2[1] + c3[1] + c4[1]
    nz = c1[2] + c2[2] + c3[2] + c4[2]
    inv = lax.rsqrt(nx * nx + ny * ny + nz * nz)
    nx, ny, nz = nx * inv, ny * inv, nz * inv

    # ---- whitecap (WhiteCap.shader:33-45): central diffs ÷8, J determinant
    ddx_x = -0.5 * (xm(dx) - xp(dx)) / 8.0
    ddx_z = -0.5 * (xm(dz) - xp(dz)) / 8.0
    ddy_x = -0.5 * (zm(dx) - zp(dx)) / 8.0
    ddy_z = -0.5 * (zm(dz) - zp(dz)) / 8.0
    jac = (1.0 + ddx_x) * (1.0 + ddy_z) - ddx_z * ddy_x
    noise = 0.3 * jnp.sqrt(nx * nx + nz * nz)
    turb = jnp.maximum(1.0 - jac + noise, 0.0)

    nx_ref[:] = nx
    ny_ref[:] = ny
    nz_ref[:] = nz
    foam_ref[:] = _smoothstep01(turb)
    jac_ref[:] = jac


#: ship the r5 halo-free kernel (see the v2 section below). Measured on the
#: v5e (bench/PROBE_r5_fields_v2_*.json, device-profiler per-call):
#:   1024²: 0.073 vs v1 0.114 ms   2048²: 0.207 vs 0.484
#:   4096²: 0.884 vs 2.111         8192²: see probe file
#: False restores the r4 halo-DMA kernel (kept for A/B and regression
#: hunts; identical outputs up to fp reassociation).
FIELDS_KERNEL_V2 = True


def fields_pallas(disp_x, height, disp_z, texel_size: float):
    """(normal [N,N,3], foam, jacobian) from chop-scaled displacements —
    fused twin of fields.normals_stencil + fields.whitecap_gpu.

    Differentiable (VERDICT r4 weak #4): the kernel itself carries no VJP
    rule, so the backward pass re-runs the OUTPUT-IDENTICAL jnp twins
    (normals_stencil + whitecap_gpu — the parity targets in
    tests/test_pallas_kernels.py) under jax.vjp. One extra XLA-fused
    stencil evaluation per backward step; the primal keeps kernel speed."""
    return _fields_pallas_diff(disp_x, height, disp_z,
                               float(texel_size))


def _fields_twin(disp_x, height, disp_z, texel_size):
    from tpu_ocean.fields import normals_stencil, whitecap_gpu
    nrm = normals_stencil(disp_x, height, disp_z, texel_size)
    foam, jac = whitecap_gpu(disp_x, disp_z, nrm)
    return nrm, foam, jac


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fields_pallas_diff(disp_x, height, disp_z, texel_size):
    return _fields_pallas_impl(disp_x, height, disp_z, texel_size)


def _fields_pallas_fwd(disp_x, height, disp_z, texel_size):
    return (_fields_pallas_impl(disp_x, height, disp_z, texel_size),
            (disp_x, height, disp_z))


def _fields_pallas_bwd(texel_size, res, cts):
    disp_x, height, disp_z = res
    _, pull = jax.vjp(
        lambda a, b, c: _fields_twin(a, b, c, texel_size),
        disp_x, height, disp_z)
    return pull(cts)


_fields_pallas_diff.defvjp(_fields_pallas_fwd, _fields_pallas_bwd)


def _fields_pallas_impl(disp_x, height, disp_z, texel_size: float):
    if FIELDS_KERNEL_V2:
        return fields_pallas_v2(disp_x, height, disp_z, texel_size)
    m, n = height.shape
    if m % 8 != 0:
        # the halo DMA starts must be 8-sublane aligned; a non-multiple grid
        # would wrap to misaligned rows (garbage on CPU, Mosaic error on TPU)
        raise ValueError(f"fields_pallas needs the grid side to be a "
                         f"multiple of 8 (got {m}); use the jnp stencil "
                         f"path (fields.normals_stencil/whitecap_gpu)")
    # VMEM budget: 3 halo scratch planes + their loaded values + 5 double-
    # buffered out blocks + ~15 live stencil temps ≈ 30·r·n·4 bytes
    # (measured: 17 MB at r=32, n=4096 with the previous 16× estimate)
    r = 128
    while r > 8 and (30 * r * n * 4 > 8 * 1024 * 1024 or m % r != 0):
        r //= 2

    kernel = functools.partial(_fields_kernel, r=r, n=n, m=m,
                               texel=np.float32(texel_size))
    hbm = pl.BlockSpec(memory_space=pl.ANY)
    out_block = pl.BlockSpec((r, n), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(m // r,),
        in_specs=[hbm, hbm, hbm],
        out_specs=[out_block] * 5,
        out_shape=[jax.ShapeDtypeStruct((m, n), jnp.float32)] * 5,
        scratch_shapes=[pltpu.VMEM((r + 2 * 8, n), jnp.float32)] * 3
                       + [pltpu.SemaphoreType.DMA((9,))],
        cost_estimate=pl.CostEstimate(
            flops=int(60 * m * n), bytes_accessed=int(8 * m * n * 4),
            transcendentals=0),
        interpret=jax.default_backend() == "cpu",
    )(disp_x.astype(jnp.float32), height.astype(jnp.float32),
      disp_z.astype(jnp.float32))
    nx, ny, nz, foam, jac = outs
    return jnp.stack([nx, ny, nz], axis=-1), foam, jac


# ---------------------------------------------------------------------------
# v2 kernel (r5, roadmap #17): halo-free blocking + the cross-product
# identity. The r4 kernel's 4096²/8192² cost sat ~3× above its HBM floor:
# r = 16 row blocks paid a 16-row halo DMA band per side (2× input traffic)
# plus ~15 live edge-vector temps that pinned r below 32 (probed:
# PROBE_r4_fields_vmem_4096). Two structural fixes:
#
#   1. cross(right,top) + cross(top,left) + cross(left,bottom) +
#      cross(bottom,right)  ==  cross(right−left, top−bottom)  (bilinearity;
#      EXACT up to fp reassociation). The displaced-position mids cancel in
#      the differences, so the whole stencil — normals AND the whitecap
#      central differences, which are the SAME differences ÷16 — derives
#      from 6 difference planes instead of 12 edge components + 3 mids.
#   2. the ±1-row x-neighbors come from TWO boundary rows per block,
#      gathered OUTSIDE the kernel by XLA ([m/r, 6, n] — 2/r extra input
#      traffic, vs the halo band's 2×) and a regular BlockSpec pipeline —
#      no manual DMA, no 8-row-aligned scratch copies.
#
# Spec: OceanNormal.shader:39-56 + WhiteCap.shader:33-45 (same jnp twins).
# ---------------------------------------------------------------------------


def _fields_kernel_v2(bnd_ref, dx_ref, h_ref, dz_ref,
                      nx_ref, ny_ref, nz_ref, foam_ref, jac_ref,
                      *, r, n, texel):
    b = bnd_ref[0]                       # (6, n): up rows 0-2, down rows 3-5

    def xdiff(a_ref, iu, idn):
        """a[i+1] − a[i−1] for the block's rows (boundary rows patch the
        block edges): the x-axis central difference of one plane."""
        a = a_ref[:]
        ext = jnp.concatenate([b[iu:iu + 1, :], a, b[idn:idn + 1, :]],
                              axis=0)    # (r+2, n) value concat (sublanes)
        return ext[2:, :] - ext[:-2, :]

    def zdiff(a_ref):
        """zm − zp: the z-axis (lane) central difference, periodic within
        the resident row."""
        a = a_ref[:]
        return pltpu.roll(a, 1, 1) - pltpu.roll(a, n - 1, 1)

    ddx = xdiff(dx_ref, 0, 3)            # (xp − xm) of disp_x
    ddh = xdiff(h_ref, 1, 4)
    ddz = xdiff(dz_ref, 2, 5)
    dzx = zdiff(dx_ref)                  # (zm − zp) of disp_x
    dzh = zdiff(h_ref)
    dzz = zdiff(dz_ref)

    # u = right − left, v = top − bottom; normal ∝ cross(u, v)
    ux = ddx + 2.0 * texel
    uy = ddh
    uz = ddz
    vx = dzx
    vy = dzh
    vz = dzz - 2.0 * texel
    nx = uy * vz - uz * vy
    ny = uz * vx - ux * vz
    nz = ux * vy - uy * vx
    inv = lax.rsqrt(nx * nx + ny * ny + nz * nz)
    nx, ny, nz = nx * inv, ny * inv, nz * inv

    # whitecap central differences are the same diffs ÷16
    # (WhiteCap.shader:36-37: −0.5·(bwd − fwd)/8)
    ddx_x = ddx * (1.0 / 16.0)
    ddx_z = ddz * (1.0 / 16.0)
    ddy_x = dzx * (-1.0 / 16.0)
    ddy_z = dzz * (-1.0 / 16.0)
    jac = (1.0 + ddx_x) * (1.0 + ddy_z) - ddx_z * ddy_x
    noise = 0.3 * jnp.sqrt(nx * nx + nz * nz)
    turb = jnp.maximum(1.0 - jac + noise, 0.0)

    nx_ref[:] = nx
    ny_ref[:] = ny
    nz_ref[:] = nz
    foam_ref[:] = _smoothstep01(turb)
    jac_ref[:] = jac


def fields_pallas_v2(disp_x, height, disp_z, texel_size: float,
                     block_rows: int = 0):
    """Halo-free fused fields stencil (see section comment). Same contract
    and outputs as fields_pallas; ``block_rows`` overrides the VMEM
    heuristic for hardware probes (0 = auto)."""
    m, n = height.shape
    if m % 8 != 0:
        raise ValueError(f"fields_pallas_v2 needs the grid side to be a "
                         f"multiple of 8 (got {m})")
    disp_x = disp_x.astype(jnp.float32)
    height = height.astype(jnp.float32)
    disp_z = disp_z.astype(jnp.float32)
    if block_rows:
        r = int(block_rows)
        if m % r:
            raise ValueError(f"block_rows {r} must divide {m}")
    else:
        # measured-fastest rows (bench/PROBE_r5_fields_v2_*.json, v5e
        # device traces): r = 16 at n ≤ 1024 (0.073 vs r32's 0.084 ms);
        # r = 32 from 2048 up while the ~22-live-plane VMEM estimate
        # (6 in-flight input + 10 output blocks + 6 diff temps) stays
        # under ~12 MB — r = 32 at 8192 (23 MB) is Mosaic-rejected,
        # r = 16 (4.21 ms vs r8's 5.94) is the 8192 pick
        r = 16 if n <= 1024 else 32
        while r > 8 and (22 * r * n * 4 > 12 * 1024 * 1024 or m % r != 0):
            r //= 2
    nb = m // r
    up = (np.arange(nb) * r - 1) % m
    dn = (np.arange(nb) * r + r) % m
    bnd = jnp.stack([disp_x[up], height[up], disp_z[up],
                     disp_x[dn], height[dn], disp_z[dn]],
                    axis=1)                              # [nb, 6, n]

    kernel = functools.partial(_fields_kernel_v2, r=r, n=n,
                               texel=np.float32(texel_size))
    bnd_block = pl.BlockSpec((1, 6, n), lambda bi: (bi, 0, 0),
                             memory_space=pltpu.VMEM)
    in_block = pl.BlockSpec((r, n), lambda bi: (bi, 0),
                            memory_space=pltpu.VMEM)
    out_block = pl.BlockSpec((r, n), lambda bi: (bi, 0),
                             memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[bnd_block, in_block, in_block, in_block],
        out_specs=[out_block] * 5,
        out_shape=[jax.ShapeDtypeStruct((m, n), jnp.float32)] * 5,
        cost_estimate=pl.CostEstimate(
            flops=int(40 * m * n), bytes_accessed=int(8 * m * n * 4),
            transcendentals=0),
        interpret=jax.default_backend() == "cpu",
    )(bnd, disp_x, height, disp_z)
    nx, ny, nz, foam, jac = outs
    return jnp.stack([nx, ny, nz], axis=-1), foam, jac
