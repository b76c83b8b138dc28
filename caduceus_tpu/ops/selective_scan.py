"""Selective scan (the Mamba recurrence) — TPU-native implementations.

Computes, for every batch b, channel d, state n:

    h[t] = exp(delta[t,d] * A[d,n]) * h[t-1] + delta[t,d] * B[t,n] * u[t,d]
    y[t,d] = sum_n C[t,n] * h[t,d,n] + D[d] * u[t,d]
    out = y * silu(z)                      (optional gate)

with ``delta = softplus(delta_raw + delta_bias)`` applied inside (optional),
matching the semantics of the reference's CUDA ``selective_scan_fn`` /
``mamba_inner_fn`` (mamba-ssm 1.2.0, consumed at
`caduceus/modeling_caduceus.py:11` via the `Mamba` module; ssm_cfg at
`configs/model/caduceus.yaml:9-21`).

Layout: TPU-first — sequence-major activations ``(B, L, d)`` with the channel
axis last (lane dimension, multiples of 128), NOT the reference's (B, d, L).

Two implementations:

- :func:`selective_scan_ref` — plain ``lax.scan`` over time. O(L) sequential
  steps; the numerics oracle for everything else.
- :func:`selective_scan` — chunked scan: ``lax.scan`` over chunks of length
  ``chunk_size`` with a work-efficient intra-chunk parallel scan, wrapped in
  ``jax.checkpoint`` so the backward pass recomputes intra-chunk state from
  chunk-boundary carries instead of materializing the (B, L, d, N) state
  tensor (which at L=131k would be ~4 GB/batch-row — the reason the
  reference needs a fused CUDA kernel, cf. SURVEY.md §2.3).

State is carried in fp32 regardless of input dtype (parity with the CUDA
kernel's fp32 state accumulation).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def _softplus(x):
    return jax.nn.softplus(x)


def _resolve_delta(delta, delta_bias, delta_softplus):
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)
    if delta_softplus:
        delta = _softplus(delta)
    return delta


def selective_scan_ref(
    u: jnp.ndarray,  # (B, L, d)
    delta: jnp.ndarray,  # (B, L, d)
    A: jnp.ndarray,  # (d, N) — real, negative
    B_mat: jnp.ndarray,  # (B, L, N)
    C: jnp.ndarray,  # (B, L, N)
    D: Optional[jnp.ndarray] = None,  # (d,)
    z: Optional[jnp.ndarray] = None,  # (B, L, d)
    delta_bias: Optional[jnp.ndarray] = None,  # (d,)
    delta_softplus: bool = False,
    reverse: bool = False,
) -> jnp.ndarray:
    """Sequential reference implementation (numerics oracle)."""
    dtype = u.dtype
    Bsz, L, d = u.shape
    N = A.shape[-1]
    delta = _resolve_delta(delta, delta_bias, delta_softplus)
    uf = u.astype(jnp.float32)
    Af = A.astype(jnp.float32)
    Bf = B_mat.astype(jnp.float32)
    Cf = C.astype(jnp.float32)

    if reverse:
        uf, delta, Bf, Cf = (jnp.flip(t, axis=1) for t in (uf, delta, Bf, Cf))

    def step(h, inputs):
        u_t, d_t, B_t, C_t = inputs  # (B,d), (B,d), (B,N), (B,N)
        dA = jnp.exp(d_t[..., None] * Af[None])  # (B, d, N)
        dBu = d_t[..., None] * B_t[:, None, :] * u_t[..., None]  # (B, d, N)
        h = dA * h + dBu
        y = jnp.einsum("bdn,bn->bd", h, C_t)
        return h, y

    h0 = jnp.zeros((Bsz, d, N), jnp.float32)
    xs = (
        jnp.moveaxis(uf, 1, 0),
        jnp.moveaxis(delta, 1, 0),
        jnp.moveaxis(Bf, 1, 0),
        jnp.moveaxis(Cf, 1, 0),
    )
    _, ys = lax.scan(step, h0, xs)
    y = jnp.moveaxis(ys, 0, 1)  # (B, L, d)
    if reverse:
        y = jnp.flip(y, axis=1)
    if D is not None:
        y = y + u.astype(jnp.float32) * D.astype(jnp.float32)
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(dtype)


def _chunk_parallel_scan(a: jnp.ndarray, b: jnp.ndarray):
    """Inclusive first-order linear-recurrence scan along axis 1.

    For elementwise recurrence h[t] = a[t]*h[t-1] + b[t] (h[-1]=0), with the
    associative combine (a2, b2)∘(a1, b1) = (a1*a2, a2*b1 + b2).
    Returns cumulative (A[t], Bc[t]) s.t. h[t] = A[t]*h0 + Bc[t].
    """

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    return lax.associative_scan(combine, (a, b), axis=1)


def _scan_chunk(h0, chunk, A):
    """Process one chunk. h0: (B, d, N) fp32 carry.

    chunk = (u, delta, B, C) each (B, Ck, ·) fp32.
    Returns (h_last, y_chunk).
    """
    u_c, d_c, B_c, C_c = chunk
    # decay and driving terms, (B, Ck, d, N)
    dA = jnp.exp(d_c[..., None] * A[None, None])
    dBu = (d_c * u_c)[..., None] * B_c[:, :, None, :]
    acc_a, acc_b = _chunk_parallel_scan(dA, dBu)
    h = acc_a * h0[:, None] + acc_b  # (B, Ck, d, N)
    y = jnp.einsum("bldn,bln->bld", h, C_c)
    return h[:, -1], y


def selective_scan(
    u: jnp.ndarray,
    delta: jnp.ndarray,
    A: jnp.ndarray,
    B_mat: jnp.ndarray,
    C: jnp.ndarray,
    D: Optional[jnp.ndarray] = None,
    z: Optional[jnp.ndarray] = None,
    delta_bias: Optional[jnp.ndarray] = None,
    delta_softplus: bool = False,
    reverse: bool = False,
    chunk_size: int = 256,
) -> jnp.ndarray:
    """Chunked work-efficient selective scan (XLA path).

    Memory-bounded: only chunk-local (B, Ck, d, N) tensors are live;
    ``jax.checkpoint`` on the chunk body means backward recomputes them from
    the (B, d, N) chunk-boundary carries saved by ``lax.scan``.
    """
    dtype = u.dtype
    Bsz, L, d = u.shape
    N = A.shape[-1]
    delta = _resolve_delta(delta, delta_bias, delta_softplus)
    uf = u.astype(jnp.float32)
    Af = A.astype(jnp.float32)
    Bf = B_mat.astype(jnp.float32)
    Cf = C.astype(jnp.float32)

    if reverse:
        uf, delta, Bf, Cf = (jnp.flip(t, axis=1) for t in (uf, delta, Bf, Cf))

    ck = min(chunk_size, L)
    if L % ck != 0:
        # pad to a chunk multiple; padded steps have delta=0 => identity decay
        # (exp(0*A)=1) and zero drive, so they do not perturb the carry.
        pad = ck - L % ck
        uf, delta, Bf, Cf = (
            jnp.pad(t, ((0, 0), (0, pad)) + ((0, 0),) * (t.ndim - 2))
            for t in (uf, delta, Bf, Cf)
        )
    Lp = uf.shape[1]
    nc = Lp // ck

    def to_chunks(t):
        return jnp.moveaxis(t.reshape(Bsz, nc, ck, *t.shape[2:]), 1, 0)

    xs = tuple(to_chunks(t) for t in (uf, delta, Bf, Cf))
    h0 = jnp.zeros((Bsz, d, N), jnp.float32)

    body = jax.checkpoint(functools.partial(_scan_chunk, A=Af))
    _, ys = lax.scan(body, h0, xs)  # ys: (nc, B, Ck, d)
    y = jnp.moveaxis(ys, 0, 1).reshape(Bsz, Lp, d)[:, :L]
    if reverse:
        y = jnp.flip(y, axis=1)
    if D is not None:
        y = y + u.astype(jnp.float32) * D.astype(jnp.float32)
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(dtype)
