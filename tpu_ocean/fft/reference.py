"""jnp.fft-based 2-D inverse transform — the correctness anchor (SURVEY.md §7).

All solver FFT backends implement the UNNORMALIZED inverse DFT

    F[i, j] = Σ_{n,m} X[n, m] · e^{+2πi(ni + mj)/N}

because the oracle sums e^{+i k·x} with no normalization (FFTMesh.cs:205-211);
SURVEY.md §3.3: "e^{+ik·x} ⇒ match with an unnormalized inverse DFT".
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpu_ocean.grids import centered_ifft_factors


def ifft2_unnorm(x: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized inverse FFT over the last two axes (any leading batch)."""
    n0, n1 = x.shape[-2], x.shape[-1]
    return jnp.fft.ifft2(x) * (n0 * n1)


def centered_modulation(n: int, length: float, unit_width: float, dtype=np.complex64):
    """(pre[N,N], post[N,N]) modulation grids for the centered-grid transform.

    See grids.centered_ifft_factors: converts a standard-index IFFT into the
    oracle's centered sum Σ H e^{i·2π(n−N/2)(i−N/2+η)/N} evaluated at the
    reference mesh positions (FFTMesh.cs:111-112,201-204). Requires
    length == n · unit_width.
    """
    if abs(length - n * unit_width) > 1e-9 * max(1.0, length):
        raise ValueError(
            f"centered FFT evaluation requires length == resolution*unit_width "
            f"(got L={length}, N*w={n * unit_width}); use the 'direct' "
            f"evaluation mode for incommensurate grids")
    pre1, post1 = centered_ifft_factors(n, length, unit_width)
    pre = np.outer(pre1, pre1)
    post = np.outer(post1, post1)
    # HOST numpy on purpose: these become closed-over trace-time constants in
    # the jitted step; device arrays there are re-fetched at lowering (slow or
    # unimplemented on experimental TPU runtimes — CLAUDE.md hard rule)
    return np.asarray(pre, dtype=dtype), np.asarray(post, dtype=dtype)
