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
from tpu_ocean.fft.distributed import ifft2_x_sharded, ifft2_x_sharded_planes
from tpu_ocean.fft.reference import centered_modulation
from tpu_ocean import fields as field_ops
from tpu_ocean.parallel.halo import make_roll_fn
from tpu_ocean.solver import OceanState, OceanStateReal, OceanFields


class DistributedOceanSolver:
    """Sharded twin of OceanSolver. ``mesh`` must contain a 'shard' axis."""

    def __init__(self, cfg: OceanConfig, mesh: Mesh,
                 fft_backend: str = "reference", overlap_chunks: int = 1,
                 pallas_fields: bool = False,
                 real_state: bool = False,
                 pack_channels: Optional[bool] = None,
                 half_spectrum: bool = False):
        if "shard" not in mesh.axis_names:
            raise ValueError("mesh needs a 'shard' axis (parallel.make_mesh)")
        if fft_backend not in ("reference", "stockham", "matmul", "pallas",
                               "pallas_fused"):
            raise ValueError(f"unknown distributed fft backend "
                             f"{fft_backend!r}")
        # all-real sharded step (VERDICT r3 #3): the entire multi-chip
        # program — state, a2a transposes, transform, fields — stays f32, so
        # it is timeable/checkpointable on complex-hostile runtimes exactly
        # like OceanSolver(real_state=True). Same backend/layout constraints
        # as the single-device twin (solver.py:105-114): only the plane-based
        # pipelines compute in (re, im), and the centered modulation factors
        # are complex.
        if real_state:
            if fft_backend not in ("pallas", "pallas_fused"):
                raise ValueError("real_state supports the plane-based "
                                 "backends 'pallas'/'pallas_fused' only")
            if cfg.spectrum_layout != "fft":
                raise ValueError("real_state requires spectrum_layout='fft'")
        self.real_state = real_state
        # no size caps on the distributed pallas paths: below MAX_PALLAS_N /
        # MAX_FUSED_N they run the transposed-store kernels (zero HBM
        # transposes); beyond, the NATURAL-store row kernels + einsum column
        # pass take over internally (fft.distributed / _fused_transform) —
        # same a2a volume either way.
        if fft_backend == "pallas_fused" and cfg.spectrum_layout != "fft":
            raise ValueError("pallas_fused requires spectrum_layout='fft'")
        # fused stencil kernel on Z-sharded fields: local kernel + ring-halo
        # boundary-column correction (same constraints as OceanSolver)
        if pallas_fields and (cfg.normals_mode != "stencil"
                              or cfg.spectrum_layout != "fft"
                              or cfg.resolution % 8 != 0):
            raise ValueError("pallas_fields requires normals_mode='stencil', "
                             "spectrum_layout='fft', and a resolution "
                             "divisible by 8")
        n = cfg.resolution
        n_dev = mesh.shape["shard"]
        if n % n_dev != 0:
            raise ValueError(f"resolution {n} not divisible by shard={n_dev}")
        if (n % 128 and fft_backend in ("pallas", "pallas_fused")
                and jax.default_backend() != "cpu"):
            # ONLY the Pallas sharded paths ride the transposed-store
            # kernels directly; Mosaic's 128-lane rule rejects other N on
            # hardware (probed r4 single-chip — fail early with a real
            # message instead of the remote compiler's opaque HTTP 500).
            # The 'reference'/'stockham'/'matmul' sharded locals are
            # jnp.fft/einsum programs with no lane constraint and stay
            # constructible at any N % n_dev == 0 (ADVICE r4); the
            # single-patch OceanSolver routes such N through the einsum
            # four-step instead.
            raise ValueError(f"sharded Pallas transforms need resolution "
                             f"divisible by 128 on TPU hardware (got {n}); "
                             f"use a non-Pallas fft_backend or OceanSolver "
                             f"for this grid")
        from tpu_ocean.fft.pallas_fft import (transposed_rows_legal,
                                              MAX_PALLAS_N as _MAXP)
        if (fft_backend in ("pallas", "pallas_fused")
                and n <= _MAXP and jax.default_backend() != "cpu"):
            # TRANSPOSED regime only (beyond MAX_PALLAS_N the row pass is
            # the any-block natural-store kernel and the column is einsum):
            # the per-SHARD row batch (N/D rows) must satisfy the
            # transposed store's lane rule — the picked block must be a
            # 128-multiple or the whole batch. N = 1280/D = 4 passes every
            # N-level gate but yields 320-row shards → a 64-row block →
            # Mosaic "unsupported shape cast" on hardware (review finding,
            # r5). Fail fast with the real constraint.
            local = n // n_dev
            if not transposed_rows_legal(local, n):
                raise ValueError(
                    f"per-shard row batch N/D = {local} picks a sub-128 "
                    f"transposed-store block (Mosaic-illegal on hardware); "
                    f"choose D so N/D is a multiple of 128 or small enough "
                    f"to be a single block, or use a non-Pallas "
                    f"fft_backend")
            if half_spectrum and n_dev > 1 and not transposed_rows_legal(
                    n // (2 * n_dev), n):
                raise ValueError(
                    f"the mirror-balanced half route row-transforms "
                    f"N/(2D) = {n // (2 * n_dev)} rows per device, which "
                    f"picks a Mosaic-illegal sub-128 block on hardware; "
                    f"reduce D or drop half_spectrum")
        if pallas_fields and n // n_dev < 2:
            raise ValueError("pallas_fields needs ≥2 local columns per shard")
        self.cfg = cfg
        self.mesh = mesh
        self.fft_backend = fft_backend
        self.pallas_fields = pallas_fields
        self._mxu_precision = (jax.lax.Precision.DEFAULT
                               if cfg.precision == "bfloat16"
                               else jax.lax.Precision.HIGHEST)
        # stencil normals never read the slope spectra: transform only 3
        # channels (see OceanSolver._nch — explicit because DCE cannot see
        # into Pallas kernels; here it also cuts the a2a volume 40%)
        self._nch = 3 if cfg.normals_mode == "stencil" else 5
        # Hermitian channel packing (evolve.packed_coefficients), same
        # DEFAULT-OFF rule as OceanSolver (parity ledger) — shard-exact
        # parity with the single-device step requires BOTH solvers to pack
        # identically. Here packing also cuts the a2a transpose volume by
        # the same third.
        can_pack = cfg.spectrum_layout == "fft"
        if pack_channels is None:
            pack_channels = False
        elif pack_channels and not can_pack:
            raise ValueError("pack_channels requires spectrum_layout='fft'")
        self.pack_channels = bool(pack_channels)
        #: channels actually transformed / transposed (= _nch unless packed)
        self._pch = ((2 if self._nch == 3 else 3) if self.pack_channels
                     else self._nch)
        # Half-spectrum (C2R) route for the last packed channel, sharded:
        # fft.distributed.ifft2_x_sharded_half (mirror-balanced — every
        # device transforms N/(2D) rows, the a2a moves half that channel's
        # volume). Same flag constraints as OceanSolver, plus the mesh/row
        # divisibility the mirror scheme needs.
        if half_spectrum:
            if not self.pack_channels:
                raise ValueError("half_spectrum rides the last PACKED "
                                 "channel's Hermitian structure — it "
                                 "requires pack_channels=True")
            if not real_state or fft_backend != "pallas":
                raise ValueError("half_spectrum supports the plane-based "
                                 "real_state 'pallas' pipeline only")
            if cfg.resolution % 16 != 0 or cfg.resolution < 64:
                raise ValueError("half_spectrum needs resolution % 16 == 0 "
                                 "and >= 64 (the N/2-length column kernels)")
            if n % 256 and jax.default_backend() != "cpu":
                # the C2R fold runs kernels at length M = N/2; Mosaic's
                # 128-lane rule therefore needs 128 | N/2 on hardware
                # (review finding, r5 — N ≡ 128 mod 256, e.g. 384, passed
                # every earlier check and compile-failed). The sharded
                # route has no mirror fallback, so fail fast.
                raise ValueError(f"sharded half_spectrum needs resolution "
                                 f"divisible by 256 on TPU hardware (got "
                                 f"{n}: the fold-length N/2 kernels break "
                                 f"the 128-lane rule); drop half_spectrum "
                                 f"or use OceanSolver for this grid")
            if n_dev > 1 and (n_dev % 2 != 0
                              or (n // (2 * n_dev)) % 8 != 0):
                raise ValueError(
                    f"half_spectrum's mirror-balanced sharding needs an "
                    f"EVEN shard count with N/(2D) divisible by 8 (got "
                    f"D={n_dev}, N={n}) — see ifft2_x_sharded_half")
        self.half_spectrum = bool(half_spectrum)
        # >1 splits the channel batch so the all_to_all transpose of one
        # chunk overlaps the row butterflies of the next (SURVEY.md §5.8);
        # the fused backend chunks via per-channel-range kernel launches
        if overlap_chunks > 1:
            if self._pch % overlap_chunks != 0:
                raise ValueError(f"overlap_chunks must divide the "
                                 f"{self._pch}-channel transform batch (got "
                                 f"{overlap_chunks}); use 1 or {self._pch}")
        self.overlap_chunks = overlap_chunks
        self.n_local = n // n_dev

        # trace-time constants (full-size; shard_map slices them via
        # in_specs). All REAL f32 device arrays passed as step arguments:
        # complex host→device transfers are unreliable on experimental TPU
        # runtimes and the modulation factors split into (re, im) pairs.
        self._omega = jnp.asarray(np.asarray(omega_grid(cfg), np.float32))
        if self.pack_channels:
            from tpu_ocean.evolve import packed_coefficients
            # stacked [2P, N, N]: rows 0..P−1 = A, P..2P−1 = B (P = A − iB)
            self._coeffs = jnp.asarray(
                np.asarray(packed_coefficients(cfg, self._nch), np.float32))
        else:
            self._coeffs = jnp.asarray(
                np.asarray(spectrum_coefficients(cfg).real,
                           np.float32)[:self._nch])
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
        if real_state:
            state_specs = OceanStateReal(
                h0_re=x_spec, h0_im=x_spec, h0c_re=x_spec, h0c_im=x_spec,
                phase=x_spec, t=P(), step=P(), foam_accum=z_spec)
        else:
            state_specs = OceanState(h0=x_spec, h0_conj=x_spec, phase=x_spec,
                                     t=P(), step=P(),
                                     # foam accumulates in the fields'
                                     # (Z-sharded) orientation — it
                                     # feeds/consumes them
                                     foam_accum=z_spec)
        self._state_specs = state_specs
        self._x_spec, self._z_spec = x_spec, z_spec
        self._velocity_jit = None      # built lazily (serve hot path)
        field_specs = OceanFields(
            height=z_spec, disp_x=z_spec, disp_z=z_spec,
            pos_x=z_spec, pos_z=z_spec, normal=P(None, "shard", None),
            foam=z_spec, jacobian=z_spec)

        # pallas_call outputs carry no vma annotation for the checker
        uses_pallas = (fft_backend in ("pallas", "pallas_fused")
                       or pallas_fields)
        sharded_step = shard_map(
            self._step_local,
            mesh=mesh,
            in_specs=(state_specs, P(),            # state, dt
                      x_spec, P(None, "shard", None),  # omega, coeffs [C,N,N]
                      x_spec, x_spec,              # pre re/im (X-sharded)
                      z_spec, z_spec,              # post re/im (Z-sharded)
                      z_spec, z_spec),             # x0, z0
            out_specs=(state_specs, field_specs),
            check_vma=not uses_pallas,
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

    def symmetrize(self, state):
        """Hermitian projection of the h0 pair when packing (the exact twin
        of OceanSolver.symmetrize — see its docstring for the derivation,
        the f32-rounding parity argument, and the bitwise idempotence that
        makes applying it to resumed checkpoints safe)."""
        if not self.pack_channels:
            return state
        from tpu_ocean.evolve import hermitize_pair, hermitize_planes
        if isinstance(state, OceanStateReal):
            ar, ai, acr, aci = hermitize_planes(
                state.h0_re, state.h0_im, state.h0c_re, state.h0c_im)
            return state._replace(h0_re=ar, h0_im=ai, h0c_re=acr, h0c_im=aci)
        a, ac = hermitize_pair(state.h0, state.h0_conj)
        return state._replace(h0=a, h0_conj=ac)

    def init(self, key: Optional[jax.Array] = None,
             h0: Optional[jax.Array] = None,
             h0_conj: Optional[jax.Array] = None):
        cfg = self.cfg
        n = cfg.resolution
        x_sh = NamedSharding(self.mesh, P("shard", None))
        z_sh = NamedSharding(self.mesh, P(None, "shard"))
        rep = NamedSharding(self.mesh, P())
        if self.real_state:
            # complex-free init (solver.py:314-333): sample h0 directly as
            # (re, im) planes — bit-identical draw to h0_pair_fft — or split
            # an injected complex pair (parity tests). Planes shard like h0.
            if h0 is None:
                from tpu_ocean.spectra import h0_pair_fft_planes
                if key is None:
                    key = jax.random.PRNGKey(cfg.seed)
                r1, i1, r2, i2 = h0_pair_fft_planes(
                    key, n, cfg.length, cfg.phillips_amplitude, cfg.wind,
                    cfg.damping, model=cfg.spectrum_model,
                    jonswap_kw=cfg.jonswap_kw)
            else:
                h0 = jnp.asarray(h0, jnp.complex64)
                h0_conj = jnp.asarray(h0_conj, jnp.complex64)
                r1 = jnp.real(h0).astype(jnp.float32)
                i1 = jnp.imag(h0).astype(jnp.float32)
                r2 = jnp.real(h0_conj).astype(jnp.float32)
                i2 = jnp.imag(h0_conj).astype(jnp.float32)
            if self.pack_channels:
                from tpu_ocean.evolve import hermitize_planes
                r1, i1, r2, i2 = hermitize_planes(r1, i1, r2, i2)
            return OceanStateReal(
                h0_re=jax.device_put(r1, x_sh),
                h0_im=jax.device_put(i1, x_sh),
                h0c_re=jax.device_put(r2, x_sh),
                h0c_im=jax.device_put(i2, x_sh),
                phase=jax.device_put(jnp.zeros((n, n), jnp.float32), x_sh),
                t=jax.device_put(jnp.zeros((), jnp.float32), rep),
                step=jax.device_put(jnp.zeros((), jnp.int32), rep),
                foam_accum=jax.device_put(jnp.zeros((n, n), jnp.float32),
                                          z_sh),
            )
        if h0 is None:
            if key is None:
                key = jax.random.PRNGKey(cfg.seed)
            pair_fn = (h0_pair_centered if cfg.spectrum_layout == "centered"
                       else h0_pair_fft)
            h0, h0_conj = pair_fn(key, n, cfg.length, cfg.phillips_amplitude,
                                  cfg.wind, cfg.damping,
                                  model=cfg.spectrum_model,
                                  jonswap_kw=cfg.jonswap_kw)
        if self.pack_channels:
            # hermitize BEFORE sharding: negflip's reversed roll would
            # otherwise trigger resharding collectives on the fresh arrays
            from tpu_ocean.evolve import hermitize_pair
            h0, h0_conj = hermitize_pair(jnp.asarray(h0, jnp.complex64),
                                         jnp.asarray(h0_conj, jnp.complex64))
        return OceanState(
            h0=jax.device_put(jnp.asarray(h0, jnp.complex64), x_sh),
            h0_conj=jax.device_put(jnp.asarray(h0_conj, jnp.complex64), x_sh),
            phase=jax.device_put(jnp.zeros((n, n), jnp.float32), x_sh),
            t=jax.device_put(jnp.zeros((), jnp.float32), rep),
            step=jax.device_put(jnp.zeros((), jnp.int32), rep),
            # foam accumulates in the fields' (Z-sharded) orientation
            foam_accum=jax.device_put(jnp.zeros((n, n), jnp.float32), z_sh),
        )

    def shard_state(self, state):
        """device_put a host/unsharded state pytree onto this solver's mesh
        layout — the checkpoint-resume entry point (checkpoint.load_checkpoint
        returns host arrays; pass real_state=True there to get the
        OceanStateReal view this solver's real mode consumes)."""
        if isinstance(state, OceanStateReal) != self.real_state:
            raise ValueError("state representation does not match the "
                             "solver's real_state setting (load_checkpoint"
                             "(real_state=...) selects the view)")
        return jax.tree.map(
            lambda v, spec: jax.device_put(
                jnp.asarray(v), NamedSharding(self.mesh, spec)),
            state, self._state_specs)

    def reconfigure(self, state: OceanState, new_cfg: OceanConfig,
                    key=None):
        """Live parameter change (mirrors OceanSolver.reconfigure): new
        spectrum, phase preserved when the grid/layout is unchanged.
        Init-only changes (wind/amplitude/spectrum shape/seed) REUSE the
        compiled shard_map step — no retrace, no multi-chip recompile
        (minutes over a tunneled runtime) — exactly the single-device
        fast path; everything else rebuilds."""
        from tpu_ocean.solver import OceanSolver
        import dataclasses
        changed = {f.name for f in dataclasses.fields(new_cfg)
                   if getattr(new_cfg, f.name) != getattr(self.cfg, f.name)}
        if changed <= OceanSolver._INIT_ONLY_FIELDS:
            import copy
            solver = copy.copy(self)   # shares _step_jit + trace constants
            solver.cfg = new_cfg
            fresh = solver.init(key if key is not None
                                else jax.random.PRNGKey(new_cfg.seed))
            return solver, fresh._replace(phase=state.phase, t=state.t,
                                          step=state.step,
                                          foam_accum=state.foam_accum)
        solver = DistributedOceanSolver(new_cfg, self.mesh,
                                        fft_backend=self.fft_backend,
                                        overlap_chunks=self.overlap_chunks,
                                        pallas_fields=self.pallas_fields,
                                        real_state=self.real_state,
                                        pack_channels=(self.pack_channels
                                                       if new_cfg.spectrum_layout
                                                       == self.cfg.spectrum_layout
                                                       else None),
                                        half_spectrum=(
                                            self.half_spectrum
                                            if new_cfg.spectrum_layout
                                            == self.cfg.spectrum_layout
                                            else False))
        fresh = solver.init(key if key is not None
                            else jax.random.PRNGKey(new_cfg.seed))
        if (new_cfg.resolution == self.cfg.resolution
                and new_cfg.spectrum_layout == self.cfg.spectrum_layout):
            fresh = fresh._replace(phase=state.phase, t=state.t,
                                   step=state.step,
                                   foam_accum=state.foam_accum)
        return solver, fresh

    def step(self, state, dt: float = 1.0 / 60.0):
        return self._step_jit(state, jnp.asarray(dt, jnp.float32),
                              self._omega, self._coeffs,
                              self._pre_re, self._pre_im,
                              self._post_re, self._post_im,
                              self._x0, self._z0)

    def velocity(self, state, t: Optional[float] = None) -> jax.Array:
        """Distributed ∂h/∂t [N, N] (Z-sharded, like the fields) — the
        sharded twin of OceanSolver.velocity (VERDICT r3 #3: the serving /
        coupling output existed on every solver except this one). The
        iω-weighted spectrum algebra runs X-sharded and ALL-REAL
        (solver._velocity_real_impl's plane expansion), then the transform
        rides the same a2a decomposition as the step: plane-based
        (ifft2_x_sharded_planes) on the pallas backends — a real_state
        solver's velocity program is complex-free end to end — and the
        generic complex route on the others. Cached jitted shard_map: one
        trace per solver (serving hot path, ADVICE r2)."""
        if self.cfg.evolution_mode == "absolute":
            tt = state.t if t is None else jnp.asarray(t, jnp.float32)
        else:
            if t is not None:
                raise ValueError("phase mode accumulates incrementally: "
                                 "velocity is defined at the state's "
                                 "current phase (pass no t)")
            tt = state.t            # unused by the phase-mode closure
        if self._velocity_jit is None:
            uses_pallas = self.fft_backend in ("pallas", "pallas_fused")
            fn = shard_map(self._velocity_local, mesh=self.mesh,
                           in_specs=(self._state_specs, P(), self._x_spec,
                                     self._x_spec, self._x_spec,
                                     self._z_spec, self._z_spec),
                           out_specs=self._z_spec,
                           check_vma=not uses_pallas)
            self._velocity_jit = jax.jit(fn)
        return self._velocity_jit(state, tt, self._omega,
                                  self._pre_re, self._pre_im,
                                  self._post_re, self._post_im)

    def _velocity_local(self, state, tt, omega,
                        pre_re, pre_im, post_re, post_im):
        """Per-shard body of ``velocity``: ∂ₜh̃ planes on the local X rows,
        distributed transform, Re plane out ([X, N/D] per shard)."""
        cfg = self.cfg
        if cfg.evolution_mode == "absolute":
            phase = omega * tt
        else:
            phase = state.phase
        # phase mode advances φ by ω·dt·dt_multiplier per wall dt, so ∂h/∂t
        # carries that factor (see OceanSolver.velocity)
        rate = np.float32(cfg.dt_multiplier
                          if cfg.evolution_mode == "phase" else 1.0)
        if isinstance(state, OceanStateReal):
            a, b = state.h0_re, state.h0_im
            cc, d = state.h0c_re, state.h0c_im
        else:
            a, b = jnp.real(state.h0), jnp.imag(state.h0)
            cc, d = jnp.real(state.h0_conj), jnp.imag(state.h0_conj)
        cph = jnp.cos(phase)
        sph = jnp.sin(phase)
        # h0·e^{iφ} − h0*·e^{−iφ}, expanded; v_spec = i·rate·ω·(…)
        diff_re = (a - cc) * cph - (b + d) * sph
        diff_im = (b - d) * cph + (a + cc) * sph
        w = rate * omega
        vr, vi = -(w * diff_im), w * diff_re
        if self.fft_backend in ("pallas", "pallas_fused"):
            if self.half_spectrum:
                # v̂ is exactly Hermitian under the packed projection (the
                # same symmetry the step's half channel rides), so the
                # serving velocity plane gets the mirror-balanced sharded
                # C2R — half the transform rows AND half the a2a volume
                from tpu_ocean.fft.distributed import ifft2_x_sharded_half
                return ifft2_x_sharded_half(
                    vr[None], vi[None], "shard",
                    precision=self._mxu_precision)[0]
            re, _ = ifft2_x_sharded_planes(vr[None], vi[None], "shard",
                                           precision=self._mxu_precision)
            return re[0]
        vspec = (vr + 1j * vi)[None]
        if cfg.spectrum_layout == "centered":
            vspec = vspec * (pre_re + 1j * pre_im)[None]
        out = ifft2_x_sharded(vspec, "shard", self.fft_backend,
                              precision=self._mxu_precision)
        if cfg.spectrum_layout == "centered":
            out = out * (post_re + 1j * post_im)[None]
        return jnp.real(out[0])

    # ----------------------------------------------- fused pallas pipelines

    def _fused_transform(self, state, phase):
        """Complex-state wrapper over _fused_transform_planes."""
        pair = (jnp.real(state.h0), jnp.imag(state.h0),
                jnp.real(state.h0_conj), jnp.imag(state.h0_conj))
        re, im = self._fused_transform_planes(pair, phase)
        return re + 1j * im

    def _fused_transform_planes(self, pair, phase):
        """pallas_fused as a distributed local backend (VERDICT r1 #3):
        fused assembly+row-FFT over the shard's X rows — global kx comes
        from ``row_offset`` = shard_start, rebuilt in-kernel — then the
        kernel output rides an all_to_all and a local column pass finishes.
        ``overlap_chunks`` > 1 launches one fused kernel per channel range
        so each chunk's transpose overlaps the next chunk's row pass.

        Two regimes (same a2a volume either way):
          N ≤ MAX_FUSED_N — transposed-store kernel ([C, N, X/D]), a2a
          split=-2/concat=-1, transposed-store column pass (zero HBM
          transposes, fft.distributed layout chain);
          N beyond — natural-store kernel ([C, X/D, N], legal at any N),
          a2a split=-1/concat=-2 (the einsum path's transpose), einsum
          axis(-2) column pass. This lifts the round-1 cap: the distributed
          fused pipeline now runs at 4096² and above.
        """
        from tpu_ocean.config import EPSILON
        from tpu_ocean.ops.fused_spectrum_fft import (
            assemble_rowfft, assemble_rowfft_natural)
        from tpu_ocean.fft.pallas_fft import _fft1d_transposed, MAX_FUSED_N
        from tpu_ocean.fft.matmul import ifft1d_planes_axis2
        cfg = self.cfg
        dz_sign = -1.0 if cfg.oracle_sign_quirk else 1.0
        row_off = lax.axis_index("shard") * self.n_local
        large = cfg.resolution > MAX_FUSED_N
        row_fn = assemble_rowfft_natural if large else assemble_rowfft
        split_ax, concat_ax = (3, 2) if large else (2, 3)

        def chunk(ch_start, ch_count):
            re, im = row_fn(pair, phase, cfg.length, dz_sign,
                            precision=self._mxu_precision,
                            epsilon=EPSILON, row_offset=row_off,
                            ch_start=ch_start, ch_count=ch_count,
                            packed=self.pack_channels, nch_live=self._nch)
            if lax.axis_size("shard") > 1:
                both = jnp.stack([re, im])      # one collective per chunk
                both = lax.all_to_all(both, "shard", split_axis=split_ax,
                                      concat_axis=concat_ax, tiled=True)
                re, im = both[0], both[1]
            return re, im

        if self.overlap_chunks > 1:
            per = self._pch // self.overlap_chunks
            parts = [chunk(i * per, per) for i in range(self.overlap_chunks)]
            re = jnp.concatenate([p[0] for p in parts])
            im = jnp.concatenate([p[1] for p in parts])
        else:
            re, im = chunk(0, self._pch)
        if large:
            # [C, X full (kx spectral), N/D (z spatial)] → einsum column pass
            return ifft1d_planes_axis2(re, im, True, self._mxu_precision)
        # [C, N/D? ...] transposed layout: local rows fully resident
        return _fft1d_transposed(re, im, True, self._mxu_precision)

    def _fields_pallas_sharded(self, cdx, h, cdz, texel):
        """ops/fields_pallas on the local Z shard, then ring-halo correction
        of the two boundary columns: the kernel's z-neighbor lane rolls wrap
        around the LOCAL shard, so only columns 0 and n_local−1 read a wrong
        neighbor — recompute exactly those from 3-column strips whose outer
        column is the ppermute'd ring halo (D6), and splice them in."""
        from tpu_ocean.ops.fields_pallas import fields_pallas
        normal, foam, jac = fields_pallas(cdx, h, cdz, texel)
        n_dev = lax.axis_size("shard")
        if n_dev == 1:
            return normal, foam, jac

        fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        bwd = [(i, (i - 1) % n_dev) for i in range(n_dev)]

        def strips(p):
            halo_l = lax.ppermute(p[:, -1:], "shard", fwd)  # left nb's last
            halo_r = lax.ppermute(p[:, :1], "shard", bwd)   # right nb's first
            return (jnp.concatenate([halo_l, p[:, :2]], axis=1),
                    jnp.concatenate([p[:, -2:], halo_r], axis=1))

        sl, sr = zip(*(strips(p) for p in (cdx, h, cdz)))

        def stencil_mid(sx, sh, sz):
            # plain jnp.roll: periodic over the 3-column strip puts the halo
            # and the interior neighbor adjacent to the middle column; the
            # full-height axis 0 is globally periodic as-is
            nrm = field_ops.normals_stencil(sx, sh, sz, texel)
            fm, jc = field_ops.whitecap_gpu(sx, sz, nrm)
            return nrm[:, 1], fm[:, 1], jc[:, 1]

        nl, fl, jl = stencil_mid(*sl)
        nr, fr, jr = stencil_mid(*sr)
        normal = normal.at[:, 0].set(nl).at[:, -1].set(nr)
        foam = foam.at[:, 0].set(fl).at[:, -1].set(fr)
        jac = jac.at[:, 0].set(jl).at[:, -1].set(jr)
        return normal, foam, jac

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

        # --- distributed transform: X-sharded in, Z-sharded out ---
        if isinstance(state, OceanStateReal):
            # all-real pipeline: assembly, a2a transposes, and the column
            # pass all move (re, im) f32 planes — complex64 never appears
            # in the compiled multi-chip program (VERDICT r3 #3)
            pair = (state.h0_re, state.h0_im, state.h0c_re, state.h0c_im)
            if self.fft_backend == "pallas_fused":
                half = None
                re, im = self._fused_transform_planes(pair, phase)
            else:
                if self.pack_channels:
                    from tpu_ocean.evolve import assemble_spectra_packed_real
                    re, im = assemble_spectra_packed_real(pair, phase, coeffs)
                else:
                    from tpu_ocean.evolve import assemble_spectra_real
                    re, im = assemble_spectra_real(pair, phase, coeffs)
                if self.pack_channels and self.half_spectrum:
                    from tpu_ocean.fft.distributed import ifft2_x_sharded_half
                    half = ifft2_x_sharded_half(
                        re[-1:], im[-1:], "shard",
                        precision=self._mxu_precision)[0]   # [X, N/D] real
                    # the half channel is its own launch group, so chunking
                    # applies to the remaining full channels only
                    oc = (self.overlap_chunks
                          if (self._pch - 1) % self.overlap_chunks == 0
                          else 1)
                    re, im = ifft2_x_sharded_planes(
                        re[:-1], im[:-1], "shard", overlap_chunks=oc,
                        precision=self._mxu_precision)
                else:
                    half = None
                    re, im = ifft2_x_sharded_planes(
                        re, im, "shard", overlap_chunks=self.overlap_chunks,
                        precision=self._mxu_precision)
            if self.pack_channels:
                if half is not None:
                    height, disp_x = re[0], im[0]
                    disp_z = half if self._nch == 3 else re[1]
                    slope_x = im[1] if self._nch == 5 else None
                    slope_z = half if self._nch == 5 else None
                else:
                    height, disp_x, disp_z = re[0], im[0], re[1]
                    slope_x = im[1] if self._nch == 5 else None
                    slope_z = re[2] if self._nch == 5 else None
            else:
                height, disp_x, disp_z = re[0], im[1], im[2]
                slope_x = im[3] if self._nch == 5 else None
                slope_z = im[4] if self._nch == 5 else None
        else:
            if self.fft_backend == "pallas_fused":
                f = self._fused_transform(state, phase)
            else:
                if self.pack_channels:
                    from tpu_ocean.evolve import assemble_spectra_packed
                    spectra = assemble_spectra_packed(state.h0, state.h0_conj,
                                                      phase, coeffs)
                else:
                    spectra = assemble_spectra(state.h0, state.h0_conj, phase,
                                               coeffs)
                if cfg.spectrum_layout == "centered":
                    spectra = spectra * (pre_re + 1j * pre_im)[None]
                f = ifft2_x_sharded(spectra, "shard", self.fft_backend,
                                    overlap_chunks=self.overlap_chunks,
                                    precision=self._mxu_precision)
                if cfg.spectrum_layout == "centered":
                    f = f * (post_re + 1j * post_im)[None]
            if self.pack_channels:
                # packed channels: fields alternate Re/Im down the packed
                # list
                height = jnp.real(f[0])
                disp_x = jnp.imag(f[0])
                disp_z = jnp.real(f[1])
                slope_x = jnp.imag(f[1]) if self._nch == 5 else None
                slope_z = jnp.real(f[2]) if self._nch == 5 else None
            else:
                height = jnp.real(f[0])
                disp_x = jnp.imag(f[1])
                disp_z = jnp.imag(f[2])
                slope_x = jnp.imag(f[3]) if self._nch == 5 else None
                slope_z = jnp.imag(f[4]) if self._nch == 5 else None

        # --- field extraction (Z-sharded; stencils ride the halo ring) ---
        roll = make_roll_fn("shard", sharded_axes=(1,))
        chop = cfg.choppiness

        z_off = lax.axis_index("shard") * self.n_local
        if self.pallas_fields:
            normal, foam, jac = self._fields_pallas_sharded(
                chop * disp_x, height, chop * disp_z,
                cfg.length / cfg.resolution)
        else:
            if cfg.normals_mode == "spectral":
                normal = field_ops.normals_spectral(slope_x, slope_z)
            else:
                normal = field_ops.normals_stencil(
                    chop * disp_x, height, chop * disp_z,
                    cfg.length / cfg.resolution, roll_fn=roll)
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

        if isinstance(state, OceanStateReal):
            new_state = OceanStateReal(
                h0_re=state.h0_re, h0_im=state.h0_im,
                h0c_re=state.h0c_re, h0c_im=state.h0c_im,
                phase=phase_state, t=t_new, step=state.step + 1,
                foam_accum=foam_accum)
        else:
            new_state = OceanState(h0=state.h0, h0_conj=state.h0_conj,
                                   phase=phase_state, t=t_new,
                                   step=state.step + 1,
                                   foam_accum=foam_accum)
        out = OceanFields(height=height, disp_x=disp_x, disp_z=disp_z,
                          pos_x=x0 - chop * disp_x, pos_z=z0 - chop * disp_z,
                          normal=normal, foam=foam, jacobian=jac)
        return new_state, out
