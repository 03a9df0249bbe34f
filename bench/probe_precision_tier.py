"""Probe (VERDICT r3 #2a): HIGH-precision kernel tier at 1024².

The Pallas FFT kernels pin precision=HIGHEST on every MXU dot
(pallas_fft._dot_mid) while the large-N einsum paths already ride HIGH at
the measured fp32-accumulation floor (matmul._einsum_f32_precision).
HIGHEST on TPU is the 6-pass bf16 emulation, HIGH the 3-pass one — if the
1024² transform is MXU-bound (stage breakdown r2: transform 0.342 ms of
0.420, HBM floor ~87 µs), HIGH should buy a large step cut.

Measures, per variant {HIGHEST, HIGH} on the flagship packed pipeline
(pallas_fused + pallas_fields + pack_channels, real_state):
  * step time via benchlib.time_steps_ladder (tinypull forcing, validity
    gates — the only trustworthy timing on this tunnel, CLAUDE.md);
  * accuracy: max |field_HIGH − field_HIGHEST| and field RMS for one step's
    (height, displacement, normals, foam) — all-real device scalars, pulled
    individually (small f32 pulls are safe; complex transfers are not).

Usage: timeout 600 python bench/probe_precision_tier.py [--res 1024]
Prints one JSON line per measurement; exit 0 on completion.
"""

from __future__ import annotations


# repo-root import bootstrap: these scripts run directly from a checkout
# (sys.path[0] is the script's own dir, not the repo root)
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--ks", type=str, default="8,64,512")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from tpu_ocean.config import OCEAN_DEMO
    from tpu_ocean.solver import OceanSolver
    from tpu_ocean.benchlib import time_steps_ladder

    n = args.res
    cfg = OCEAN_DEMO.replace(resolution=n, length=float(n))
    ks = tuple(int(k) for k in args.ks.split(","))

    def build():
        s = OceanSolver(cfg, fft_backend="pallas_fused", real_state=True,
                        pallas_fields=True, pack_channels=True)
        return s

    from tpu_ocean.fft import pallas_fft as pf
    pf.KERNEL_B3_THRESHOLD = 10**9     # explicit tiers only in this probe
    solvers = {}
    for tier, prec in (("HIGHEST", jax.lax.Precision.HIGHEST),
                       ("B3", pf.B3)):
        s = build()
        s._mxu_precision = prec        # probe override (pre-trace)
        solvers[tier] = s

    state = solvers["HIGHEST"].init(jax.random.PRNGKey(0))

    # ---- accuracy: one step, field deltas as device scalars ---------------
    dt = np.float32(1.0 / 60.0)
    outs = {}
    for tier, s in solvers.items():
        _, fields = jax.jit(s._step_impl)(state, dt, s._consts)
        outs[tier] = fields
    a, b = outs["HIGHEST"], outs["B3"]
    for name in ("height", "disp_x", "disp_z", "normal", "foam"):
        fa, fb = getattr(a, name, None), getattr(b, name, None)
        if fa is None:
            continue
        d = jnp.max(jnp.abs(fa.astype(jnp.float32) - fb.astype(jnp.float32)))
        rms = jnp.sqrt(jnp.mean(fa.astype(jnp.float32) ** 2))
        print(json.dumps({"probe": "accuracy", "field": name,
                          "max_abs_delta": float(jax.device_get(d)),
                          "rms_highest": float(jax.device_get(rms))}),
              flush=True)

    # ---- timing ------------------------------------------------------------
    for tier, s in solvers.items():
        lad = time_steps_ladder(s._step_impl, state, float(dt), ks=ks,
                                extra=s._consts, escalate=True,
                                forcing="tinypull")
        print(json.dumps({"probe": "timing", "tier": tier,
                          "ms_per_step": round(lad.per_step_s * 1e3, 4),
                          "suspect": bool(lad.suspect),
                          "ks": lad.ks,
                          "walls_s": [round(w, 4) for w in lad.walls_s],
                          "resid": round(lad.max_rel_resid, 4)}),
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
