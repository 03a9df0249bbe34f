"""Metrics, structured logging, and profiling hooks (SURVEY.md §5.1, §5.5).

The reference has neither profiling markers nor logging (not even Debug.Log).
Here observability is first-class: per-step structured records (step,
sim-time, wall-dt, grid-points/s, FFT updates/s), JSONL/CSV emitters that
BASELINE reporting consumes directly, and jax.profiler trace capture around
the hot loop for TensorBoard.

NaN guards: the reference's GPU pipeline silently propagates NaNs through 40+
blit passes; ``check_finite`` raises instead (jax.checkify-style but eager,
usable outside jit at checkpoint boundaries).
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field
from typing import IO, Optional

import numpy as np
import jax


@dataclass
class StepRecord:
    step: int
    sim_time: float
    wall_dt_s: float
    grid_points_per_s: float
    updates_per_s: float
    extras: dict = field(default_factory=dict)

    def as_dict(self) -> dict:
        d = {"step": self.step, "sim_time": round(self.sim_time, 6),
             "wall_dt_s": round(self.wall_dt_s, 6),
             "grid_points_per_s": round(self.grid_points_per_s, 1),
             "updates_per_s": round(self.updates_per_s, 2)}
        d.update(self.extras)
        return d


class Metrics:
    """Wall-clock throughput counters around a stepping loop.

    Usage::

        m = Metrics(grid_points=cfg.resolution ** 2, emit=sys.stderr)
        for _ in range(k):
            with m.measure():
                state, f = solver.step(state, dt)
                jax.block_until_ready(f.height)
            # m.last is the StepRecord; JSONL already emitted if emit is set
    """

    def __init__(self, grid_points: int, emit: Optional[IO] = None,
                 emit_format: str = "jsonl"):
        self.grid_points = grid_points
        self.emit_stream = emit
        self.emit_format = emit_format
        self.records: list[StepRecord] = []
        self._step = 0
        self._sim_time = 0.0

    @contextlib.contextmanager
    def measure(self, sim_dt: float = 1.0 / 60.0, **extras):
        t0 = time.perf_counter()
        yield
        wall = time.perf_counter() - t0
        self._step += 1
        self._sim_time += sim_dt
        rec = StepRecord(
            step=self._step, sim_time=self._sim_time, wall_dt_s=wall,
            grid_points_per_s=self.grid_points / wall if wall > 0 else 0.0,
            updates_per_s=1.0 / wall if wall > 0 else 0.0,
            extras=extras)
        self.records.append(rec)
        if self.emit_stream is not None:
            if self.emit_format == "jsonl":
                self.emit_stream.write(json.dumps(rec.as_dict()) + "\n")
            else:  # csv
                d = rec.as_dict()
                if len(self.records) == 1:
                    self.emit_stream.write(",".join(d.keys()) + "\n")
                self.emit_stream.write(
                    ",".join(str(v) for v in d.values()) + "\n")
            self.emit_stream.flush()

    @property
    def last(self) -> Optional[StepRecord]:
        return self.records[-1] if self.records else None

    def summary(self, warmup: int = 1) -> dict:
        """Aggregate over recorded steps, dropping the first ``warmup``
        (compile) entries."""
        recs = self.records[warmup:] or self.records
        walls = np.asarray([r.wall_dt_s for r in recs])
        return {
            "steps": len(recs),
            "mean_ms": float(walls.mean() * 1e3),
            "p50_ms": float(np.percentile(walls, 50) * 1e3),
            "p95_ms": float(np.percentile(walls, 95) * 1e3),
            "updates_per_s": float(1.0 / walls.mean()),
            "grid_points_per_s": float(self.grid_points / walls.mean()),
        }


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace around a block; open the result in TensorBoard.
    Wraps the hot loop the way the reference *should* have wrapped its 44
    blits per frame."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """Per-stage trace annotation (SURVEY.md §5.1: named scopes per kernel)."""
    return jax.named_scope(name)


def check_finite(tree, where: str = "") -> None:
    """Raise FloatingPointError if any leaf holds a non-finite value."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(jax.device_get(leaf))
        if arr.dtype.kind in "fc" and not np.all(np.isfinite(arr)):
            name = jax.tree_util.keystr(path)
            raise FloatingPointError(
                f"non-finite values in {name} {where and f'({where})'}")
