"""cfg.precision → MXU dot precision (shared by both solvers)."""

from __future__ import annotations

import jax


def mxu_precision_for(mode: str):
    """'float32' → HIGHEST (full f32, parity-grade); 'float32_3x' → the
    manual 3-pass bf16 tier (pallas_fft.BF16X3, ~1e-6 — Mosaic rejects
    Precision.HIGH in kernels, so the tier is hand-built there and mapped
    to einsum-supported HIGHEST elsewhere only via _dot_mid); 'bfloat16' →
    DEFAULT (single bf16 pass, ~4e-3)."""
    from tpu_ocean.fft.pallas_fft import BF16X3
    return {"float32": jax.lax.Precision.HIGHEST,
            "float32_3x": BF16X3,
            "bfloat16": jax.lax.Precision.DEFAULT}[mode]
