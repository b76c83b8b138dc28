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
  ``chunk_size`` with an intra-chunk ``lax.associative_scan``, wrapped in
  ``jax.checkpoint`` so the backward pass recomputes intra-chunk state from
  chunk-boundary carries instead of materializing the (B, L, d, N) state
  tensor (which at L=131k would be ~4 GB/batch-row — the reason the
  reference needs a fused CUDA kernel, cf. SURVEY.md §2.3).

HBM discipline (16 GB/chip on v5e): inputs stay in their storage dtype
(bf16) in HBM; the fp32 cast happens per-chunk *inside* the checkpointed
body, and chunk outputs are emitted back in the input dtype. ``reverse=True``
is structural — reversed chunk order in `lax.scan` + reversed intra-chunk
associative scan — so no flipped copies of (B, L, d) arrays ever exist.
State is carried in fp32 (parity with the CUDA kernel's fp32 state).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def _resolve_delta(delta, delta_bias, delta_softplus):
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)
    if delta_softplus:
        delta = jax.nn.softplus(delta)
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


def _combine(left, right):
    """Associative combine for h' = a*h + b: right applied after left."""
    a_l, b_l = left
    a_r, b_r = right
    return a_l * a_r, a_r * b_l + b_r


def _scan_chunk(h0, chunk, A, D, delta_bias, delta_softplus, reverse, out_dtype):
    """Process one chunk. h0: (B, d, N) fp32 carry.

    chunk = (u, delta_raw, B, C[, z]) each (B, Ck, ·) in storage dtype.
    fp32 casts happen here, inside the jax.checkpoint boundary.
    Returns (h_out, y_chunk in out_dtype).
    """
    if len(chunk) == 5:
        u_c, draw, B_c, C_c, z_c = chunk
    else:
        u_c, draw, B_c, C_c = chunk
        z_c = None
    uf = u_c.astype(jnp.float32)
    d_c = _resolve_delta(draw, delta_bias, delta_softplus)
    Bf = B_c.astype(jnp.float32)
    Cf = C_c.astype(jnp.float32)
    # decay and driving terms, (B, Ck, d, N)
    dA = jnp.exp(d_c[..., None] * A[None, None])
    dBu = (d_c * uf)[..., None] * Bf[:, :, None, :]
    # The associative scan runs on 3-D (B, Ck, d*N) operands: XLA:TPU
    # miscompiles the ADJOINT of a 4-D (batch>1) associative_scan when a
    # forward- and a reverse-direction scan share one grad program (grads
    # off by ~0.3 rel. vs CPU at (4, L, 16, 512); bit-exact once the
    # trailing dims are merged — see scripts/verify_tpu.py oracle notes).
    bsz, ck = dA.shape[0], dA.shape[1]
    flat = lambda t: t.reshape(bsz, ck, -1)
    acc_a, acc_b = lax.associative_scan(
        _combine, (flat(dA), flat(dBu)), axis=1, reverse=reverse)
    h = acc_a.reshape(dA.shape) * h0[:, None] + acc_b.reshape(dA.shape)
    y = jnp.einsum("bldn,bln->bld", h, Cf)
    if D is not None:
        y = y + uf * D.astype(jnp.float32)
    if z_c is not None:
        y = y * jax.nn.silu(z_c.astype(jnp.float32))
    h_out = h[:, 0] if reverse else h[:, -1]
    return h_out, y.astype(out_dtype)


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
    h_init: Optional[jnp.ndarray] = None,  # (B, d, N) state entering the seq
    return_final_state: bool = False,
):
    """Chunked selective scan (XLA path). See module docstring.

    ``h_init`` / ``return_final_state`` support segmenting a long sequence
    across calls — the basis of the sequence-parallel (context-parallel)
    scan (`caduceus_tpu/parallel/seq_scan.py`, SURVEY.md §5.7).
    """
    dtype = u.dtype
    Bsz, L, d = u.shape
    N = A.shape[-1]
    Af = A.astype(jnp.float32)

    ck = min(chunk_size, L)
    tensors = [u, delta, B_mat, C] + ([z] if z is not None else [])
    if L % ck != 0:
        # pad to a chunk multiple. Padded steps must be exact identities
        # (decay 1, drive 0) so that h_init propagation and the returned
        # final state are unaffected: pad delta_raw such that the resolved
        # delta is 0 — a large negative under softplus, 0 otherwise; all
        # other tensors pad with zeros (drive = delta*u*B = 0 regardless).
        pad = ck - L % ck
        dpad = -1e4 if delta_softplus else 0.0
        padded = []
        for i, t in enumerate(tensors):
            cval = dpad if i == 1 else 0.0
            padded.append(
                jnp.pad(t, ((0, 0), (0, pad)) + ((0, 0),) * (t.ndim - 2),
                        constant_values=cval)
            )
        tensors = padded
    Lp = tensors[0].shape[1]
    nc = Lp // ck

    def to_chunks(t):
        return jnp.moveaxis(t.reshape(Bsz, nc, ck, *t.shape[2:]), 1, 0)

    xs = tuple(to_chunks(t) for t in tensors)
    h0 = (jnp.zeros((Bsz, d, N), jnp.float32) if h_init is None
          else h_init.astype(jnp.float32))

    body = jax.checkpoint(
        functools.partial(
            _scan_chunk,
            A=Af,
            D=D,
            delta_bias=delta_bias,
            delta_softplus=delta_softplus,
            reverse=reverse,
            out_dtype=dtype,
        )
    )
    h_last, ys = lax.scan(body, h0, xs, reverse=reverse)  # ys: (nc, B, Ck, d)
    y = jnp.moveaxis(ys, 0, 1).reshape(Bsz, Lp, d)[:, :L]
    if return_final_state:
        return y, h_last
    return y
