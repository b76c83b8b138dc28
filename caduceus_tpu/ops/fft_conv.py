"""FFT long convolution for Hyena.

Equivalent of the reference's `fftconv_ref` (`src/models/sequence/hyena.py:55-75`)
and the H3/flash-attn CUDA `fftconv` extension (`src/ops/fftconv.py`): causal
(linear, not circular) convolution of u with per-channel filter k via
zero-padded real FFTs, plus the residual bias term ``u * D``.

XLA has native FFT on TPU, so no custom kernel is needed (SURVEY.md §2.3).
Layout: (B, L, d) channels-last; FFTs over the length axis in fp32.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def fft_conv(
    u: jnp.ndarray,  # (..., L, d)
    k: jnp.ndarray,  # (L, d) filter taps (causal: tap t applies to lag t)
    D: Optional[jnp.ndarray] = None,  # (d,) residual ("bias" in the reference)
    gelu: bool = False,
) -> jnp.ndarray:
    """y[t, d] = sum_{s<=t} k[t-s, d] * u[s, d] (+ D[d] * u[t, d])."""
    dtype = u.dtype
    L = u.shape[-2]
    n = 2 * L
    uf = jnp.fft.rfft(u.astype(jnp.float32), n=n, axis=-2)
    kf = jnp.fft.rfft(k.astype(jnp.float32), n=n, axis=-2)
    y = jnp.fft.irfft(uf * kf, n=n, axis=-2)[..., :L, :]
    if D is not None:
        y = y + u.astype(jnp.float32) * D.astype(jnp.float32)
    if gelu:
        import jax

        y = jax.nn.gelu(y)
    return y.astype(dtype)
