"""Failure detection / recovery (SURVEY.md §5.3): a stepping process killed
mid-run resumes from its last checkpoint and reproduces the uninterrupted
trajectory exactly. The reference loses everything on exit; this is the
subsystem it never had."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import jax

from tpu_ocean.config import OceanConfig
from tpu_ocean.solver import OceanSolver
from tpu_ocean.checkpoint import CheckpointManager, load_checkpoint

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from tpu_ocean.config import OceanConfig
from tpu_ocean.solver import OceanSolver
from tpu_ocean.checkpoint import CheckpointManager

ckpt_dir, total_steps = sys.argv[1], int(sys.argv[2])
cfg = OceanConfig(resolution=24, length=24.0, wind=(6.0, 4.0), amplitude=0.05,
                  evolution_mode="phase", dispersion_mode="capillary",
                  spectrum_layout="fft", normals_mode="stencil")
solver = OceanSolver(cfg)
mgr = CheckpointManager(ckpt_dir, interval=2, keep=3)
state, _ = mgr.restore_latest()
if state is None:
    state = solver.init(jax.random.PRNGKey(11))
import numpy as np
start = int(np.asarray(state.step))
for _ in range(start, total_steps):
    state, f = solver.step(state, 1 / 60)
    jax.block_until_ready(f.height)
    mgr.maybe_save(state, cfg)
    print(int(np.asarray(state.step)), flush=True)
"""


def _cfg():
    return OceanConfig(resolution=24, length=24.0, wind=(6.0, 4.0),
                       amplitude=0.05, evolution_mode="phase",
                       dispersion_mode="capillary", spectrum_layout="fft",
                       normals_mode="stencil")


def test_kill_and_resume_reproduces_trajectory(tmp_path):
    ckpt_dir = str(tmp_path / "ckpts")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")

    # run 1: SIGKILL after a few steps have been checkpointed
    p = subprocess.Popen([sys.executable, "-c", _WORKER, ckpt_dir, "10"],
                         stdout=subprocess.PIPE, text=True, env=env)
    seen = 0
    deadline = time.time() + 120
    while seen < 5 and time.time() < deadline:
        line = p.stdout.readline()
        if line.strip().isdigit():
            seen = int(line)
    os.kill(p.pid, signal.SIGKILL)
    p.wait()
    assert seen >= 5, "worker never reached step 5"

    # run 2: restart; must resume from the checkpoint, not step 0
    out = subprocess.run([sys.executable, "-c", _WORKER, ckpt_dir, "10"],
                         capture_output=True, text=True, env=env, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    steps = [int(s) for s in out.stdout.split() if s.strip().isdigit()]
    assert steps[0] > 1, f"resume restarted from scratch: {steps[:3]}"
    assert steps[-1] == 10

    # ground truth: uninterrupted in-process run with identical seed/schedule
    solver = OceanSolver(_cfg())
    state = solver.init(jax.random.PRNGKey(11))
    for _ in range(10):
        state, fields = solver.step(state, 1 / 60)
    final, _ = load_checkpoint(
        CheckpointManager(ckpt_dir, interval=2).latest())
    np.testing.assert_array_equal(np.asarray(final.phase),
                                  np.asarray(state.phase))
    assert int(np.asarray(final.step)) == 10
