"""Width-1 halo exchange over a ppermute ring (component D6).

The reference's stencils wrap around the patch via repeat-mode texture
sampling (OceanNormal.shader:45-48, WhiteCap.shader:36-37) — a periodic
boundary. On a sharded grid the same semantics come from a neighbor-exchange
ring: `roll_sharded` reproduces jnp.roll's global periodic shift on an axis
that is split across mesh devices, sending exactly the `|shift|`-wide boundary
strip to the ring neighbor (the ring-attention analogue, SURVEY.md §5.7).

Must be called inside shard_map with the named axis in scope.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def roll_sharded(x: jnp.ndarray, shift: int, axis: int, axis_name: str):
    """Global periodic roll along a sharded axis.

    Equivalent to jnp.roll(global_x, shift, axis) evaluated on each shard.
    |shift| must not exceed the local shard extent (true for width-1 stencils
    on any practical decomposition).
    """
    if shift == 0:
        return x
    n_dev = lax.axis_size(axis_name)
    if n_dev == 1:
        return jnp.roll(x, shift, axis)
    local = x.shape[axis]
    assert abs(shift) <= local, (
        f"halo width {abs(shift)} exceeds local extent {local}")

    if shift > 0:
        # roll(+s): element i takes value from i−s; the first s local slots
        # need the LAST s rows of the left (lower-index) neighbor.
        strip = lax.slice_in_dim(x, local - shift, local, axis=axis)
        # send strip to the right neighbor == receive from the left
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        halo = lax.ppermute(strip, axis_name, perm)
        body = lax.slice_in_dim(x, 0, local - shift, axis=axis)
        return lax.concatenate([halo, body], dimension=axis)
    else:
        s = -shift
        strip = lax.slice_in_dim(x, 0, s, axis=axis)
        # send strip to the left neighbor == receive from the right
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]
        halo = lax.ppermute(strip, axis_name, perm)
        body = lax.slice_in_dim(x, s, local, axis=axis)
        return lax.concatenate([body, halo], dimension=axis)


def make_roll_fn(axis_name: str, sharded_axes: tuple):
    """A jnp.roll-compatible callable where listed axes use the ring.

    ``sharded_axes`` maps array axis → True if that axis is device-split.
    Positive/negative axis indices are normalized against the array rank.
    """
    def roll(x, shift, axis):
        ax = axis % x.ndim
        if ax in sharded_axes:
            return roll_sharded(x, shift, ax, axis_name)
        return jnp.roll(x, shift, ax)
    return roll
