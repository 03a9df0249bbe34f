"""Domain-decomposed ocean solver over a jax.sharding.Mesh (D1-D6).

One shard_map'ped, jitted step: spectrum assembly on X-sharded state, the
all_to_all 2-D IFFT (fft.distributed), then Z-sharded field extraction with
ppermute halo rings for the stencils. Semantically identical to
solver.OceanSolver — test_distributed.py asserts shard-exact agreement with
the single-device step (SURVEY.md §4.3).

Sharding layout (axis name 'shard'):
    state.h0 / h0_conj / phase : P('shard', None)   — rows (X) split
    fields.*                   : P(None, 'shard')   — columns (Z) split
An optional leading ensemble axis (D2) can be added by vmapping init/step and
meshing ('batch', 'shard'); the core step is written for one patch.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tpu_ocean.config import OceanConfig
from tpu_ocean import grids
from tpu_ocean.evolve import omega_grid, spectrum_coefficients, assemble_spectra
from tpu_ocean.spectra import h0_pair_centered, h0_pair_fft
from tpu_ocean.fft.distributed import ifft2_x_sharded
from tpu_ocean.fft.reference import centered_modulation
from tpu_ocean import fields as field_ops
from tpu_ocean.parallel.halo import make_roll_fn
from tpu_ocean.solver import OceanState, OceanFields


class DistributedOceanSolver:
    """Sharded twin of OceanSolver. ``mesh`` must contain a 'shard' axis."""

    def __init__(self, cfg: OceanConfig, mesh: Mesh,
                 fft_backend: str = "reference", overlap_chunks: int = 1):
        if "shard" not in mesh.axis_names:
            raise ValueError("mesh needs a 'shard' axis (parallel.make_mesh)")
        if fft_backend not in ("reference", "stockham", "matmul", "pallas"):
            raise ValueError(f"unknown distributed fft backend "
                             f"{fft_backend!r}")
        if fft_backend == "pallas":
            from tpu_ocean.fft.pallas_fft import pallas_supported
            if not pallas_supported(cfg.resolution):
                import warnings
                warnings.warn(f"pallas exceeds its VMEM cap at "
                              f"N={cfg.resolution}; falling back to 'matmul'")
                fft_backend = "matmul"
        n = cfg.resolution
        n_dev = mesh.shape["shard"]
        if n % n_dev != 0:
            raise ValueError(f"resolution {n} not divisible by shard={n_dev}")
        self.cfg = cfg
        self.mesh = mesh
        self.fft_backend = fft_backend
        # >1 splits the 5-channel transform so the all_to_all transpose of
        # one chunk overlaps the row butterflies of the next (SURVEY.md §5.8)
        if overlap_chunks > 1:
            if 5 % overlap_chunks != 0:
                raise ValueError(f"overlap_chunks must divide the 5-channel "
                                 f"batch (got {overlap_chunks}); use 1 or 5")
        self.overlap_chunks = overlap_chunks
        self.n_local = n // n_dev

        # trace-time constants (full-size; shard_map slices them via
        # in_specs). All REAL f32 device arrays passed as step arguments:
        # complex host→device transfers are unreliable on experimental TPU
        # runtimes and the modulation factors split into (re, im) pairs.
        self._omega = jnp.asarray(np.asarray(omega_grid(cfg), np.float32))
        self._coeffs = jnp.asarray(
            np.asarray(spectrum_coefficients(cfg).real, np.float32))
        if cfg.spectrum_layout == "centered":
            pre, post = centered_modulation(n, cfg.length, cfg.unit_width)
            x1d = grids.coordinate_1d(n, cfg.unit_width)
        else:
            pre = np.ones((n, n), np.complex64)
            post = np.ones((n, n), np.complex64)
            x1d = np.arange(n, dtype=np.float64) * (cfg.length / n)
        self._pre_re = jnp.asarray(np.asarray(pre.real, np.float32))
        self._pre_im = jnp.asarray(np.asarray(pre.imag, np.float32))
        self._post_re = jnp.asarray(np.asarray(post.real, np.float32))
        self._post_im = jnp.asarray(np.asarray(post.imag, np.float32))
        x0, z0 = np.meshgrid(x1d, x1d, indexing="ij")
        self._x0 = jnp.asarray(x0, jnp.float32)
        self._z0 = jnp.asarray(z0, jnp.float32)

        x_spec = P("shard", None)      # state layout: rows split
        z_spec = P(None, "shard")      # field layout: columns split
        state_specs = OceanState(h0=x_spec, h0_conj=x_spec, phase=x_spec,
                                 t=P(), step=P(),
                                 # foam accumulates in the fields' (Z-sharded)
                                 # orientation — it feeds/consumes them
                                 foam_accum=z_spec)
        field_specs = OceanFields(
            height=z_spec, disp_x=z_spec, disp_z=z_spec,
            pos_x=z_spec, pos_z=z_spec, normal=P(None, "shard", None),
            foam=z_spec, jacobian=z_spec)

        sharded_step = shard_map(
            self._step_local,
            mesh=mesh,
            in_specs=(state_specs, P(),            # state, dt
                      x_spec, P(None, "shard", None),  # omega, coeffs [5,N,N]
                      x_spec, x_spec,              # pre re/im (X-sharded)
                      z_spec, z_spec,              # post re/im (Z-sharded)
                      z_spec, z_spec),             # x0, z0
            out_specs=(state_specs, field_specs),
            # pallas_call outputs carry no vma annotation for the checker
            check_vma=fft_backend != "pallas",
        )
        # exposed for DP×SP composition (ensemble.EnsembleDistributedSolver
        # vmaps this over a leading member axis); vma checking cannot span
        # the vmap's spmd batch axis, so the composition twin disables it
        self._sharded_step = shard_map(
            self._step_local, mesh=mesh,
            in_specs=(state_specs, P(), x_spec, P(None, "shard", None),
                      x_spec, x_spec, z_spec, z_spec, z_spec, z_spec),
            out_specs=(state_specs, field_specs), check_vma=False)
        self._step_jit = jax.jit(sharded_step, donate_argnums=(0,))

    # -------------------------------------------------------------- init

    def init(self, key: Optional[jax.Array] = None,
             h0: Optional[jax.Array] = None,
             h0_conj: Optional[jax.Array] = None) -> OceanState:
        cfg = self.cfg
        n = cfg.resolution
        if h0 is None:
            if key is None:
                key = jax.random.PRNGKey(cfg.seed)
            pair_fn = (h0_pair_centered if cfg.spectrum_layout == "centered"
                       else h0_pair_fft)
            h0, h0_conj = pair_fn(key, n, cfg.length, cfg.phillips_amplitude,
                                  cfg.wind, cfg.damping,
                                  model=cfg.spectrum_model,
                                  jonswap_kw=cfg.jonswap_kw)
        x_sh = NamedSharding(self.mesh, P("shard", None))
        z_sh = NamedSharding(self.mesh, P(None, "shard"))
        rep = NamedSharding(self.mesh, P())
        return OceanState(
            h0=jax.device_put(jnp.asarray(h0, jnp.complex64), x_sh),
            h0_conj=jax.device_put(jnp.asarray(h0_conj, jnp.complex64), x_sh),
            phase=jax.device_put(jnp.zeros((n, n), jnp.float32), x_sh),
            t=jax.device_put(jnp.zeros((), jnp.float32), rep),
            step=jax.device_put(jnp.zeros((), jnp.int32), rep),
            # foam accumulates in the fields' (Z-sharded) orientation
            foam_accum=jax.device_put(jnp.zeros((n, n), jnp.float32), z_sh),
        )

    def reconfigure(self, state: OceanState, new_cfg: OceanConfig,
                    key=None):
        """Live parameter change (mirrors OceanSolver.reconfigure): new
        spectrum, phase preserved when the grid/layout is unchanged."""
        solver = DistributedOceanSolver(new_cfg, self.mesh,
                                        fft_backend=self.fft_backend,
                                        overlap_chunks=self.overlap_chunks)
        fresh = solver.init(key if key is not None
                            else jax.random.PRNGKey(new_cfg.seed))
        if (new_cfg.resolution == self.cfg.resolution
                and new_cfg.spectrum_layout == self.cfg.spectrum_layout):
            fresh = fresh._replace(phase=state.phase, t=state.t,
                                   step=state.step,
                                   foam_accum=state.foam_accum)
        return solver, fresh

    def step(self, state: OceanState, dt: float = 1.0 / 60.0):
        return self._step_jit(state, jnp.asarray(dt, jnp.float32),
                              self._omega, self._coeffs,
                              self._pre_re, self._pre_im,
                              self._post_re, self._post_im,
                              self._x0, self._z0)

    # ------------------------------------------------------ per-shard body

    def _step_local(self, state, dt, omega, coeffs,
                    pre_re, pre_im, post_re, post_im, x0, z0):
        cfg = self.cfg

        # --- evolution (X-sharded, pure elementwise: no comm) ---
        if cfg.evolution_mode == "absolute":
            t_new = state.t + dt / cfg.t_division
            phase = omega * t_new
            phase_state = state.phase
        else:
            from tpu_ocean.evolve import evolve_phase_accumulate
            phase = evolve_phase_accumulate(state.phase, omega,
                                            dt * cfg.dt_multiplier)
            phase_state = phase
            t_new = state.t + dt

        spectra = assemble_spectra(state.h0, state.h0_conj, phase, coeffs)

        # --- distributed transform: X-sharded in, Z-sharded out ---
        if cfg.spectrum_layout == "centered":
            spectra = spectra * (pre_re + 1j * pre_im)[None]
        f = ifft2_x_sharded(spectra, "shard", self.fft_backend,
                            overlap_chunks=self.overlap_chunks)
        if cfg.spectrum_layout == "centered":
            f = f * (post_re + 1j * post_im)[None]

        # --- field extraction (Z-sharded; stencils ride the halo ring) ---
        roll = make_roll_fn("shard", sharded_axes=(1,))
        height = jnp.real(f[0])
        disp_x = jnp.imag(f[1])
        disp_z = jnp.imag(f[2])
        slope_x = jnp.imag(f[3])
        slope_z = jnp.imag(f[4])
        chop = cfg.choppiness

        if cfg.normals_mode == "spectral":
            normal = field_ops.normals_spectral(slope_x, slope_z)
        else:
            normal = field_ops.normals_stencil(
                chop * disp_x, height, chop * disp_z,
                cfg.length / cfg.resolution, roll_fn=roll)

        z_off = lax.axis_index("shard") * self.n_local
        if cfg.spectrum_layout == "centered":
            foam, jac = field_ops.whitecap_oracle(
                disp_x, disp_z, normal, roll_fn=roll,
                axis_offsets=(0, z_off),
                global_sizes=(cfg.resolution, cfg.resolution))
        else:
            foam, jac = field_ops.whitecap_gpu(
                chop * disp_x, chop * disp_z, normal, roll_fn=roll)

        foam_accum = state.foam_accum
        if cfg.foam_decay > 0.0:
            foam_accum = jnp.maximum(
                foam, state.foam_accum
                * jnp.exp(-np.float32(cfg.foam_decay) * dt))
            foam = foam_accum

        new_state = OceanState(h0=state.h0, h0_conj=state.h0_conj,
                               phase=phase_state, t=t_new,
                               step=state.step + 1,
                               foam_accum=foam_accum)
        out = OceanFields(height=height, disp_x=disp_x, disp_z=disp_z,
                          pos_x=x0 - chop * disp_x, pos_z=z0 - chop * disp_z,
                          normal=normal, foam=foam, jacobian=jac)
        return new_state, out
