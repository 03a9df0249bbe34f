"""LOD cascade scheduling — per-band update rates (roadmap #9).

Production ocean renderers do not refresh every cascade every frame: the long
patch (L ~ 1000 m) holds slow swell whose fastest temporal frequency is far
below the display rate, while the short patch (L ~ 17 m) carries capillary
chop that must tick at full rate. The reference has a single patch and no
LOD machinery (OceanRenderer.cs runs every texture every Update()); this
module is a beyond-reference subsystem layered on cascade.CascadeSolver.

TPU-native design
-----------------
Data-dependent "skip this band" control flow inside one jitted step would
compile to `select`s that still execute every band's FFT — no savings. The
idiomatic formulation makes the schedule STATIC:

* The frame sequence is periodic with period P = lcm(band periods). For each
  frame slot the set of refreshing bands is a compile-time constant, so the
  solver pre-builds one jitted sub-step per DISTINCT subset (at most P, in
  practice 2-3: {all}, {fast bands}). Each sub-step gathers the refreshing
  bands with static indices — the FFT batch really shrinks (a [2,5,N,N]
  IFFT instead of [B,5,N,N]) — and scatters fresh per-band field planes into
  a cached [B,5,N,N] buffer carried in the state.
* Held bands keep their cached planes; their PHASE is not advanced either —
  on their next refresh they accumulate the full elapsed dt·(period) in one
  evolve, so the band trajectory is identical to stepping it every frame
  with the same total time (phase accumulation is linear in dt: evolve.py).
  init() primes every band's planes at t = 0 (the "last refresh" all bands
  share), so step f ∈ {1, 2, ...} refreshes band b iff f % period_b == 0,
  always advancing by exactly period_b·dt.
* The cross-band combine (Σ over B) + normals/foam runs every frame from
  the cached planes — O(B·N²) elementwise, cheap next to the FFTs.

Refresh periods default to the band's temporal Nyquist margin: the fastest
resolvable wave has k_max = π·N/L, ω_max = sqrt(g·k_max·(1+(k_max/k_cap)²))
(capillary dispersion, spectra.py), and a band stays temporally well
sampled while refresh_dt ≤ oversample·(2π/ω_max). Long patches therefore
earn large periods and short ones period 1, without any camera heuristics;
`periods_for_distance` layers a simple camera-distance cap on top (distant
cameras cannot resolve short bands' motion, so their periods stretch).

Reference anchors (behavioral, for parity audit): the per-band step math is
cascade.CascadeSolver._step_impl (itself FFTMesh.cs:223-276 parity); the
combine contract matches CascadeSolver (effective post-choppiness
displacements).
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from tpu_ocean.config import OceanConfig, G
from tpu_ocean.cascade import CascadeSolver, CascadeState


def band_max_omega(cfg: OceanConfig) -> float:
    """Fastest temporal frequency resolved by a band's grid (rad/s)."""
    k_max = math.pi * cfg.resolution / cfg.length
    w2 = G * k_max
    if cfg.dispersion_mode == "capillary":
        # spectra.dispersion_capillary: ω² = g·k·(1 + (k/370)²)
        w2 *= 1.0 + (k_max / 370.0) ** 2
    return math.sqrt(w2)


def nyquist_periods(cfgs: Sequence[OceanConfig], dt: float,
                    oversample: float = 8.0,
                    max_period: int = 8) -> List[int]:
    """Per-band refresh periods keeping each band temporally oversampled.

    Band b may be refreshed every p frames while p·dt ≤ oversample⁻¹·2π/ω_max
    — i.e. its fastest wave still advances < 1/oversample of a cycle between
    refreshes. Clamped to [1, max_period] and rounded down to a power of two
    so lcm(periods) (= the schedule length) stays small.
    """
    out = []
    for c in cfgs:
        limit = (2.0 * math.pi / band_max_omega(c)) / (oversample * dt)
        p = max(1, min(max_period, int(limit)))
        p = 2 ** int(math.log2(p))          # power of two → tiny lcm
        out.append(p)
    return out


def periods_for_distance(cfgs: Sequence[OceanConfig], dt: float,
                         camera_distance: float,
                         reference_distance: float = 100.0,
                         oversample: float = 8.0,
                         max_period: int = 8) -> List[int]:
    """Camera-driven LOD: distant cameras stretch short bands' periods.

    At ``reference_distance`` the schedule equals ``nyquist_periods``; each
    doubling of distance doubles the allowed period of every band whose patch
    length is below the camera's resolvable scale (∝ distance), capped at
    ``max_period``. Long bands dominate the distant silhouette and keep
    their physics-derived rates.
    """
    base = nyquist_periods(cfgs, dt, oversample, max_period)
    if camera_distance <= reference_distance:
        return base
    stretch = int(camera_distance / reference_distance)
    stretch = 2 ** int(math.log2(max(1, stretch)))
    out = []
    for c, p in zip(cfgs, base):
        if c.length < camera_distance:      # band finer than the eye resolves
            p = min(max_period, p * stretch)
            p = 2 ** int(math.log2(p))
        out.append(p)
    return out


class LODState(NamedTuple):
    cascade: "CascadeState | CascadeStateReal"  # shared band state (phase
                              # NOT advanced for held bands; real-plane
                              # twin when real_state=True)
    planes: jax.Array         # [B, C, N, N] f32 cached per-band field planes
                              # (C = live channels: 3 stencil / 5 spectral —
                              # always the EXTRACTED planes, independent of
                              # whether the refresh transform was packed)
    frame: int                # HOST-side frame counter — the schedule slot is
                              # dispatch-time static; a device scalar here
                              # would force a per-frame scalar pull (hangs on
                              # the tunneled runtime, CLAUDE.md hard rules)


class LODCascadeSolver:
    """CascadeSolver with a static per-band refresh schedule.

    ``periods[b]`` = refresh band b every that many frames (power of two).
    ``step`` dispatches the pre-jitted sub-step for the current frame slot's
    refresh subset; a band refreshing after p held frames advances its phase
    by the full p·dt it slept, so every band's trajectory is EXACTLY the
    all-bands-every-frame trajectory sampled at its refresh frames.
    """

    def __init__(self, cfgs: Sequence[OceanConfig],
                 periods: Optional[Sequence[int]] = None,
                 fft_backend: str = "reference",
                 display_length: Optional[float] = None,
                 dt: float = 1.0 / 60.0,
                 pack_channels: bool = False,
                 real_state: bool = False,
                 pallas_fields: bool = False,
                 half_spectrum: bool = False,
                 mesh=None):
        self.inner = CascadeSolver(cfgs, fft_backend=fft_backend,
                                   display_length=display_length,
                                   mesh=mesh,
                                   pack_channels=pack_channels,
                                   real_state=real_state,
                                   pallas_fields=pallas_fields,
                                   half_spectrum=half_spectrum)
        b = self.inner.b
        self.dt = float(dt)
        if periods is None:
            periods = nyquist_periods(cfgs, self.dt)
        if len(periods) != b:
            raise ValueError(f"{len(periods)} periods for {b} bands")
        for p in periods:
            if p < 1 or (p & (p - 1)):
                raise ValueError("periods must be powers of two ≥ 1")
        self.periods = [int(p) for p in periods]
        self.schedule_len = max(self.periods)   # lcm of powers of two
        # slot (= frame % len) → tuple of refreshing band indices (static!);
        # frames are 1-based (init is the shared refresh at frame 0 / t 0)
        self._slots: List[Tuple[int, ...]] = []
        for slot in range(self.schedule_len):
            subset = tuple(i for i, p in enumerate(self.periods)
                           if slot % p == 0)
            self._slots.append(subset)
        # distinct subsets → one jitted sub-step each (compile cache)
        self._substeps = {}
        for subset in set(self._slots):
            self._substeps[subset] = jax.jit(
                partial(self._substep_impl, subset),
                donate_argnums=(0, 1))

    # ---------------------------------------------------------------- init

    def init(self, key: Optional[jax.Array] = None) -> LODState:
        cst = self.inner.init(key)
        # prime every band's planes at t = 0 (phase = 0): the shared "last
        # refresh" all schedules count from
        planes = jax.jit(self._planes_at)(cst, self.inner._coeffs)
        return LODState(cascade=cst, planes=planes, frame=0)

    @property
    def plane_count(self) -> int:
        """Cached planes per band (= the inner solver's live channels)."""
        return self.inner._nch

    def symmetrize(self, state: LODState) -> LODState:
        """Hermitize the cascade h0 pair when packing (idempotent; the plane
        cache is the held display content and stays as written)."""
        return state._replace(cascade=self.inner.symmetrize(state.cascade))

    def reconfigure(self, state: LODState, new_cfgs, key=None):
        """Live per-band parameter change under the LOD schedule: returns
        (new_solver, new_state) — CascadeSolver.reconfigure lifted over the
        plane cache (VERDICT r3 #6; OceanRenderer.cs:98-109 behavior).

        Init-only changes (wind/amplitude/spectrum shape/seed) reuse every
        compiled sub-step and re-render the cached planes ONCE at each
        band's HELD phase — the displayed surface morphs to the new sea
        state with no motion pop and no schedule reset. Structural changes
        rebuild the solver (same periods/dt), carrying phase/t/step and
        re-priming the cache when the grid and layout are unchanged."""
        import copy
        import dataclasses
        from tpu_ocean.solver import OceanSolver
        new_cfgs = list(new_cfgs)
        changed = set()
        for old, new in zip(self.inner.cfgs, new_cfgs):
            changed |= {f.name for f in dataclasses.fields(new)
                        if getattr(new, f.name) != getattr(old, f.name)}
        inner, cst = self.inner.reconfigure(state.cascade, new_cfgs, key)
        if changed <= OceanSolver._INIT_ONLY_FIELDS:
            solver = copy.copy(self)        # shares the jitted sub-steps
            solver.inner = inner
            planes = jax.jit(solver._planes_at)(cst, inner._coeffs)
            return solver, LODState(cascade=cst, planes=planes,
                                    frame=state.frame)
        solver = LODCascadeSolver(new_cfgs, periods=self.periods,
                                  fft_backend=inner.fft_backend,
                                  display_length=inner._display_length_arg,
                                  dt=self.dt,
                                  pack_channels=inner.pack_channels,
                                  real_state=inner.real_state,
                                  pallas_fields=inner.pallas_fields,
                                  half_spectrum=inner.half_spectrum,
                                  mesh=inner.mesh)
        if (new_cfgs[0].resolution == self.inner.cfgs[0].resolution
                and new_cfgs[0].spectrum_layout
                == self.inner.cfgs[0].spectrum_layout):
            # cst already carries the preserved phase/t/step; re-prime the
            # cache at the held phases under the NEW solver's constants
            planes = jax.jit(solver._planes_at)(cst, solver.inner._coeffs)
            return solver, LODState(cascade=cst, planes=planes,
                                    frame=state.frame)
        return solver, solver.init(key)

    def velocity(self, state: LODState) -> jax.Array:
        """∂h/∂t of the DISPLAYED surface: each band's cached planes were
        rendered at its last-refresh phase, which is exactly what
        state.cascade.phase holds in BOTH evolution modes (phase mode never
        advances held bands; absolute mode's substep caches the refresh
        phase there explicitly) — so evaluating at those phases rates the
        held surface, not the clock (ADVICE r2 fix)."""
        return self.inner.velocity_at_held_phase(state.cascade)

    def _extract_planes(self, f) -> jax.Array:
        """[S, C_transform, N, N] complex transforms → [S, C, N, N] live
        field planes (shared map: cascade.extract_live_planes)."""
        from tpu_ocean.cascade import extract_live_planes
        return extract_live_planes(f, self.inner._nch,
                                   self.inner.pack_channels)

    def _assemble(self, h0, h0c, phase, coeffs):
        if self.inner.pack_channels:
            from tpu_ocean.evolve import assemble_spectra_packed
            return jax.vmap(assemble_spectra_packed)(h0, h0c, phase, coeffs)
        from tpu_ocean.evolve import assemble_spectra
        return jax.vmap(assemble_spectra)(h0, h0c, phase, coeffs)

    def _transform_planes(self, cst, idx_or_slice, phase, coeffs):
        """Refresh transform → [S, C, N, N] live planes, for either state
        representation. ``idx_or_slice`` gathers the refreshing bands."""
        inner = self.inner
        i = idx_or_slice
        if inner.real_state:
            pair = (cst.h0_re[i], cst.h0_im[i], cst.h0c_re[i], cst.h0c_im[i])
            return inner._real_planes(pair, phase, coeffs)
        f = inner._ifft2(self._assemble(cst.h0[i], cst.h0_conj[i],
                                        phase, coeffs))
        return self._extract_planes(f)

    def _planes_at(self, cst, coeffs):
        return self._transform_planes(cst, slice(None), cst.phase, coeffs)

    # ---------------------------------------------------------------- step

    def step(self, state: LODState, dt: Optional[float] = None):
        """Advance one frame. dt must equal the schedule dt (static rates)."""
        if dt is not None and abs(float(dt) - self.dt) > 1e-9:
            raise ValueError("LOD schedule is built for a fixed dt; "
                             "reconstruct the solver to change it")
        frame = state.frame + 1                # 1-based frame being computed
        subset = self._slots[frame % self.schedule_len]
        fn = self._substeps[subset]
        cascade, planes, fields = fn(
            state.cascade, state.planes, jnp.asarray(self.dt, jnp.float32),
            self.inner._omega, self.inner._coeffs,
            self.inner._x0, self.inner._z0)
        return LODState(cascade=cascade, planes=planes, frame=frame), fields

    def _substep_impl(self, subset: Tuple[int, ...], cst: CascadeState,
                      planes_in: jax.Array, dt: jax.Array,
                      omega, coeffs, x0, z0):
        """Refresh ``subset`` bands, combine all cached planes.

        The cascade state and plane cache are donated, so the phase / plane
        scatter-updates (`.at[idx].set`) alias in place.
        """
        inner = self.inner
        phase_in = cst.phase
        idx = np.asarray(subset, np.int32)            # static gather indices
        # per-band elapsed frames since last refresh = its period
        pmul = np.asarray([self.periods[i] for i in subset],
                          np.float32)[:, None, None]

        # gather the refreshing bands (static indices → slice fusion)
        ph = phase_in[idx]
        om = omega[idx]
        co = coeffs[idx]

        from tpu_ocean.evolve import evolve_phase_accumulate
        cfg0 = inner.cfgs[0]
        if cfg0.evolution_mode == "absolute":
            # absolute mode re-derives phase from global t each refresh;
            # holding a band simply means not recomputing its planes. The
            # phase field (unused for stepping in this mode) caches each
            # band's LAST-REFRESH phase so velocity() can rate the DISPLAYED
            # surface, not the clock (ADVICE r2: a held band's cached planes
            # were rendered at its refresh time).
            t_new = cst.t + dt / cfg0.t_division
            ph_new = om * t_new
            phase_out = phase_in.at[idx].set(ph_new)
        else:
            dtm = np.asarray([inner.cfgs[i].dt_multiplier for i in subset],
                             np.float32)[:, None, None]
            ph_new = evolve_phase_accumulate(ph, om, dt * pmul * dtm)
            phase_out = phase_in.at[idx].set(ph_new)
            t_new = cst.t + dt

        fresh = self._transform_planes(cst, idx, ph_new, co)  # [S, C, N, N]
        planes = planes_in.at[idx].set(fresh)

        # combine ALL bands from the cache (Σ over B) — cascade.py contract
        # (optionally the fused Pallas stencil, shared via _combine_fields)
        out = inner._combine_fields(planes, x0, z0)
        new_cst = cst._replace(phase=phase_out, t=t_new, step=cst.step + 1)
        return new_cst, planes, out
