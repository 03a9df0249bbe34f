"""Weak-scaling harness — BASELINE config 5's N-host efficiency metric.

Launches the SAME domain-decomposed workload at several process counts and
reports updates/s + weak-scaling efficiency (grid grows with the device
count: N_side ∝ sqrt(devices), constant work per device).

    python bench/run_dist.py [--procs 1,2] [--base-res 256] [--steps 30]

On a TPU pod run one process per host with --procs set to the actual count
(rendezvous from the environment). Locally it self-spawns CPU worker
processes (gloo) — numbers there validate the HARNESS and the collectives,
not TPU performance (CPU workers share cores and memory bandwidth).
"""

from __future__ import annotations


# repo-root import bootstrap: these scripts run directly from a checkout
# (sys.path[0] is the script's own dir, not the repo root)
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import socket
import subprocess
import sys
import textwrap

_WORKER = textwrap.dedent("""
    import os, sys, time, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, nproc, port, n, steps = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], int(sys.argv[4]),
                                  int(sys.argv[5]))
    if nproc > 1:
        jax.distributed.initialize(f"localhost:{port}", nproc, pid)
    import numpy as np, jax.numpy as jnp
    from jax.sharding import Mesh
    from tpu_ocean.config import OceanConfig
    from tpu_ocean.solver_dist import DistributedOceanSolver
    devs = np.asarray(jax.devices()).reshape(1, -1)
    mesh = Mesh(devs, ("batch", "shard"))
    cfg = OceanConfig(resolution=n, length=float(n), wind=(12.0, 9.0),
                      amplitude=0.3, evolution_mode="phase",
                      dispersion_mode="capillary", spectrum_layout="fft",
                      normals_mode="stencil")
    solver = DistributedOceanSolver(cfg, mesh)
    st = solver.init(jax.random.PRNGKey(0))
    st, f = solver.step(st, 1/60); jax.block_until_ready(f.height)  # compile
    t0 = time.perf_counter()
    for _ in range(steps):
        st, f = solver.step(st, 1/60)
    jax.block_until_ready(f.height)
    dt = (time.perf_counter() - t0) / steps
    if pid == 0:
        print(json.dumps({"devices": int(devs.size), "n": n,
                          "ms_per_step": round(dt*1e3, 3),
                          "updates_per_s": round(1/dt, 2),
                          "gp_per_s": round(n*n/dt, 1)}), flush=True)
""")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def run_point(nproc: int, n: int, steps: int):
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(i), str(nproc), port,
         str(n), str(steps)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(nproc)]
    result = None
    for p in procs:
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            raise RuntimeError(err[-2000:])
        for line in out.splitlines():
            if line.startswith("{"):
                result = json.loads(line)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=str, default="1,2")
    ap.add_argument("--base-res", type=int, default=256,
                    help="grid side at the SMALLEST process count; grows "
                         "with sqrt(devices) for weak scaling")
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    counts = [int(x) for x in args.procs.split(",")]
    base = None
    for nproc in counts:
        scale = (nproc / counts[0]) ** 0.5
        n = int(args.base_res * scale)
        n = max(32, (n // 32) * 32)     # keep divisible by the shard axis
        r = run_point(nproc, n, args.steps)
        r["procs"] = nproc
        if base is None:
            base = r
            r["weak_scaling_eff"] = 1.0
        else:
            # constant per-device throughput ⇒ efficiency 1.0
            r["weak_scaling_eff"] = round(
                (r["gp_per_s"] / r["devices"])
                / (base["gp_per_s"] / base["devices"]), 3)
        print(json.dumps(r))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
