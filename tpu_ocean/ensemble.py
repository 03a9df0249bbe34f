"""Ensemble (data-parallel) ocean solving — component D2.

The reference runs exactly one patch per GPU. On a TPU mesh, a batch of
independent ocean patches (an ensemble: different seeds, same physics) shards
trivially over a 'batch' axis — the DP analogue, no communication at all.
Combined with the 'shard' domain-decomposition axis (solver_dist), the mesh
('batch', 'shard') covers DP × SP for grids that are both many and large.

This module vmaps the single-patch step over a leading ensemble axis and lays
the state out with `NamedSharding(mesh, P('batch', ...))`; XLA partitions the
whole vmapped computation with zero collectives.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_ocean.config import OceanConfig
from tpu_ocean.solver import OceanSolver, OceanState


class EnsembleOceanSolver:
    """A batch of independent patches stepped in one jitted call.

    ``mesh`` needs a 'batch' axis; each member's state/fields get sharding
    P('batch') on the leading ensemble dimension.
    """

    def __init__(self, cfg: OceanConfig, mesh: Mesh, ensemble_size: int,
                 fft_backend: str = "reference"):
        if "batch" not in mesh.axis_names:
            raise ValueError("mesh needs a 'batch' axis (parallel.make_mesh)")
        n_batch = mesh.shape["batch"]
        if ensemble_size % n_batch != 0:
            raise ValueError(f"ensemble_size {ensemble_size} not divisible by "
                             f"batch axis size {n_batch}")
        self.cfg = cfg
        self.mesh = mesh
        self.ensemble_size = ensemble_size
        self._inner = OceanSolver(cfg, fft_backend=fft_backend)

        def spec(*tail):
            return NamedSharding(mesh, P("batch", *tail))

        state_shardings = OceanState(
            h0=spec(), h0_conj=spec(), phase=spec(), t=spec(), step=spec(),
            foam_accum=spec())
        # constants ride as a (replicated) jit argument — embedding them in
        # the program bloats it and re-fetching closures is unreliable
        vstep = jax.vmap(self._inner._step_impl, in_axes=(0, None, None))
        self._step_jit = jax.jit(vstep, donate_argnums=(0,),
                                 in_shardings=(state_shardings, None, None))

    def init(self, key: Optional[jax.Array] = None) -> OceanState:
        """Member i draws its own h0 from fold_in(key, i)."""
        if key is None:
            key = jax.random.PRNGKey(self.cfg.seed)
        keys = jax.random.split(key, self.ensemble_size)
        states = jax.vmap(self._inner.init)(keys)
        sh = NamedSharding(self.mesh, P("batch"))
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), states)

    def step(self, state: OceanState, dt: float = 1.0 / 60.0):
        """[E, ...] state → ([E, ...] state, [E, ...] fields)."""
        return self._step_jit(state, jnp.asarray(dt, jnp.float32),
                              self._inner._consts)
