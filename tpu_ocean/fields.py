"""Derived surface fields: normals and Jacobian whitecap foam (C10/C11).

Two normal paths, matching the reference's two derivations (SURVEY.md §2.1):

* ``spectral`` — exact slopes accumulated in spectral space, the oracle path:
  n = normalize((0,1,0) − Σ(−k)·Im[h̃e^{ikx}]) (FFTMesh.cs:212,218). The slope
  sums arrive here as the packed IFFT channels slope_x/slope_z.
* ``stencil`` — finite differences of displaced neighbor positions with
  periodic wrap, the GPU path (OceanNormal.shader:39-56): four cross products
  of edge vectors to the ±x/±z neighbors, averaged and normalized.

Foam paths:

* ``oracle`` — one-sided differences, zero at far boundaries (FFTMesh.cs:253-276).
* ``gpu``    — central differences with periodic wrap and the reference's ÷8
  display scaling (WhiteCap.shader:33-45).

On sharded grids the stencil variants swap jnp.roll for a ppermute halo
exchange (parallel/halo.py) — periodic boundary = ring wraparound (D6).
"""

from __future__ import annotations

import jax.numpy as jnp


def _smoothstep01(t):
    t = jnp.clip(t, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def normals_spectral(slope_x, slope_z):
    """normalize((−sx, 1, −sz)) from exact spectral slopes (FFTMesh.cs:218:
    nor = normalize(up − n) with n = (Σ−kx·Im, 0, Σ−kz·Im))."""
    one = jnp.ones_like(slope_x)
    n = jnp.stack([-slope_x, one, -slope_z], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def normals_stencil(disp_x, height, disp_z, texel_size: float, roll_fn=jnp.roll):
    """GPU finite-difference normals (OceanNormal.shader:39-56).

    Displaced position p = (dx, h, dz) at each texel; edge vectors to the four
    neighbors (with the rest-position offset ±texel_size on the stepped axis),
    four cross products averaged. Periodic wrap via roll_fn matches the
    shader's repeat-sampling; on sharded grids pass parallel.halo.make_roll_fn
    so the wrap becomes a ppermute ring (SURVEY.md D6). Axis0 = x, axis1 = z.
    """
    p = jnp.stack([disp_x, height, disp_z], axis=-1)          # [N, N, 3]

    def nb(axis, shift):
        return roll_fn(p, -shift, axis)

    ts = texel_size
    right = jnp.stack([jnp.full_like(height, ts), jnp.zeros_like(height),
                       jnp.zeros_like(height)], -1) + nb(0, 1) - p
    left = jnp.stack([jnp.full_like(height, -ts), jnp.zeros_like(height),
                      jnp.zeros_like(height)], -1) + nb(0, -1) - p
    # shader's "top" samples uv−texel on the second axis and offsets −texelSize
    # in world z (OceanNormal.shader:47-48)
    top = jnp.stack([jnp.zeros_like(height), jnp.zeros_like(height),
                     jnp.full_like(height, -ts)], -1) + nb(1, -1) - p
    bottom = jnp.stack([jnp.zeros_like(height), jnp.zeros_like(height),
                        jnp.full_like(height, ts)], -1) + nb(1, 1) - p

    n = (jnp.cross(right, top) + jnp.cross(top, left)
         + jnp.cross(left, bottom) + jnp.cross(bottom, right))
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def whitecap_oracle(disp_x, disp_z, normal, roll_fn=jnp.roll,
                    axis_offsets=(0, 0), global_sizes=None):
    """Jacobian foam, oracle convention (FFTMesh.cs:253-276).

    One-sided differences dD/dx = 0.5·(D[i] − D[i+1]) (zero on the last row),
    J = (1+dDdx.x)(1+dDdy.y) − dDdx.y·dDdy.x, turbulence 1 − J plus 0.3·|n.xz|,
    smoothstepped. Returns (foam, jacobian).

    On sharded grids pass roll_fn from parallel.halo plus each axis's global
    offset/size so the far-boundary zeroing (the reference's
    `if (i != resolution-1)`) lands on the GLOBAL last row, not each shard's.
    """
    if global_sizes is None:
        global_sizes = (disp_x.shape[0], disp_x.shape[1])

    def one_sided(d, axis):
        shifted = roll_fn(d, -1, axis)
        g = 0.5 * (d - shifted)
        idx = jnp.arange(d.shape[axis]) + axis_offsets[axis]
        mask = (idx < global_sizes[axis] - 1)
        mask = mask.reshape([-1 if a == axis else 1 for a in range(d.ndim)])
        return jnp.where(mask, g, 0.0)

    ddx_x = one_sided(disp_x, 0)
    ddx_z = one_sided(disp_z, 0)
    ddy_x = one_sided(disp_x, 1)
    ddy_z = one_sided(disp_z, 1)
    jacobian = (1.0 + ddx_x) * (1.0 + ddy_z) - ddx_z * ddy_x
    noise = 0.3 * jnp.sqrt(normal[..., 0] ** 2 + normal[..., 2] ** 2)
    turb = jnp.maximum(1.0 - jacobian + noise, 0.0)
    return _smoothstep01(turb), jacobian


def whitecap_gpu(disp_x, disp_z, normal, roll_fn=jnp.roll):
    """Jacobian foam, GPU convention (WhiteCap.shader:33-45).

    Central differences with periodic wrap and the reference's ÷8 display
    scaling (WhiteCap.shader:36-37; the 8 is the mesh-to-texture resolution
    ratio, OceanRenderer.cs:136). The shader's noise term reads the normal
    map's .xz channels (WhiteCap.shader:38). Returns (foam, jacobian).
    """
    def central(d, axis):
        fwd = roll_fn(d, -1, axis)
        bwd = roll_fn(d, 1, axis)
        return -0.5 * (bwd - fwd) / 8.0

    ddx_x = central(disp_x, 0)
    ddx_z = central(disp_z, 0)
    ddy_x = central(disp_x, 1)
    ddy_z = central(disp_z, 1)
    jacobian = (1.0 + ddx_x) * (1.0 + ddy_z) - ddx_z * ddy_x
    noise = 0.3 * jnp.sqrt(normal[..., 0] ** 2 + normal[..., 2] ** 2)
    turb = jnp.maximum(1.0 - jacobian + noise, 0.0)
    return _smoothstep01(turb), jacobian
