"""Field exporters — the TPU-native replacement for the reference's surface
shaders (L4, SURVEY.md §2.2).

The reference consumes solver outputs in TestOcean.shader / the pond
über-shader to draw pixels. On TPU the prognostic fields themselves are the
product; this module dumps them for inspection: PNG heatmaps (PIL), .npy
planes, and a simple shaded render that reproduces the ocean demo material's
look (wrapped diffuse + Blinn-Phong + foam, TestOcean.shader:81-96) on the CPU
so visual parity with the reference demo can be eyeballed.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax


def _to_host(x) -> np.ndarray:
    return np.asarray(jax.device_get(x))


def _normalize01(a: np.ndarray) -> np.ndarray:
    lo, hi = float(a.min()), float(a.max())
    if hi - lo < 1e-20:
        return np.zeros_like(a)
    return (a - lo) / (hi - lo)


def save_field_png(path: str, field, cmap: str = "viridis") -> str:
    """One scalar field [N, N] → PNG heatmap."""
    from PIL import Image
    import matplotlib.cm as cm
    a = _normalize01(_to_host(field).astype(np.float64))
    rgba = (cm.get_cmap(cmap)(a) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(rgba).save(path)
    return path


def save_fields(directory: str, fields, prefix: str = "ocean",
                step: Optional[int] = None) -> list:
    """Dump every scalar plane of an OceanFields/PondFields tuple as PNG+npy."""
    os.makedirs(directory, exist_ok=True)
    tag = f"_{step:06d}" if step is not None else ""
    written = []
    for name, value in fields._asdict().items():
        a = _to_host(value)
        base = os.path.join(directory, f"{prefix}_{name}{tag}")
        np.save(base + ".npy", a)
        written.append(base + ".npy")
        if a.ndim == 2:
            written.append(save_field_png(base + ".png", a))
    return written


def shade_ocean(fields, light_dir=(0.5, 0.5, -0.7),
                base_color=(0.08, 0.22, 0.35), foam_color=(0.9, 0.95, 1.0),
                specular_power: float = 96.0) -> np.ndarray:
    """CPU re-implementation of the demo material's fragment stage
    (TestOcean.shader:81-96): wrapped diffuse + Blinn-Phong specular + rim +
    foam² blend. Returns float RGB [N, N, 3] in [0, 1]."""
    n = _to_host(fields.normal).astype(np.float64)
    foam = _to_host(fields.foam).astype(np.float64)
    l = -np.asarray(light_dir, dtype=np.float64)
    l /= np.linalg.norm(l)
    view = np.asarray([0.0, 1.0, 0.0])
    half = (l + view) / np.linalg.norm(l + view)

    ndotl = np.clip((n @ l) * 0.5 + 0.5, 0.0, 1.0)          # wrapped diffuse
    spec = np.clip(n @ half, 0.0, 1.0) ** specular_power
    rim = (1.0 - np.clip(n @ view, 0.0, 1.0)) ** 2

    base = np.asarray(base_color)
    fc = np.asarray(foam_color)
    rgb = base * ndotl[..., None] + spec[..., None] * 0.6 + rim[..., None] * 0.1
    f2 = np.clip(foam, 0.0, 1.0)[..., None] ** 2             # foam² :93
    rgb = rgb * (1.0 - f2) + fc * f2
    return np.clip(rgb, 0.0, 1.0)


def save_render_png(path: str, fields, **kw) -> str:
    from PIL import Image
    rgb = (shade_ocean(fields, **kw) * 255).astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(rgb).save(path)
    return path
