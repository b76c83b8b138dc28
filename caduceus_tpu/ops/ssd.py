"""State-space dual (SSD / Mamba-2) scan — MXU-chunked, TPU-native.

Computes, for every batch row g, head h (group g(h) = h // (H // NG)),
head-channel p, state n:

    a[t,h]        = dt[t,h] * A[h]                       (A < 0, dt >= 0)
    S[t,h,n,p]    = exp(a[t,h]) * S[t-1] + dt[t,h] * B[t,g,n] * x[t,h,p]
    y[t,h,p]      = sum_n C[t,g,n] * S[t,h,n,p] + D[h] * x[t,h,p]

with ``dt = softplus(dt_raw + dt_bias)`` resolved inside (optional).

This is the Mamba-2 recurrence (Dao & Gu, "Transformers are SSMs",
arXiv:2405.21060): the Mamba-1 selective scan with the per-(channel, state)
decay ``exp(dt[t,d]·A[d,n])`` restricted to a *scalar per head*
``exp(dt[t,h]·A[h])``. The reference framework cannot express this model —
it pins mamba-ssm 1.2.0 (`caduceus_env.yml:50`), which predates Mamba-2 —
so this module is a beyond-reference capability.

Why this op exists (see PARITY.md "Roofline note"): the Mamba-1 kernel is
VPU-bound by its per-(d, n) decay, and the chunked/matmul ("dual") form is
numerically unsound there because the factored exponents are unbounded. With
a scalar-per-head decay every exponent in the dual form is a masked
*in-chunk cumulative sum of non-positive terms* — all exps are <= 0 — so the
chunk-quadratic form is exact and stable, and the O(L·T) work lands on the
MXU as batched (T, T) @ (T, P) matmuls:

    cum[t]       = cumsum_t a                                (inclusive)
    y_intra[t]   = sum_{s<=t} [C_t·B_s] exp(cum_t - cum_s) dt_s x_s
                 = (C B^T  ⊙  L_mask) @ (dt·x)               <- MXU
    S_chunk      = sum_s B_s exp(cum_T - cum_s) dt_s x_s     <- MXU
    y_inter[t]   = exp(cum_t) · C_t @ S_in                   <- MXU
    S_out        = exp(cum_T) · S_in + S_chunk

The inter-chunk recurrence carries only the (H, N, P) state through a
``lax.scan`` over chunks (chunk bodies are ``jax.checkpoint``-ed, so the
backward recomputes per chunk instead of materializing (L, T) tensors).

Layout (TPU-first): sequence-major ``(G, L, H, P)`` with the head-channel
axis last (lanes); ``reverse=True`` flips only transient per-chunk tensors
inside the scan body plus the chunk order — no (G, L, ...) flipped copies.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax


def _resolve_dt(dt, dt_bias, dt_softplus):
    dt = dt.astype(jnp.float32)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(jnp.float32)
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    return dt


def _check_shapes(x, dt, A, B_mat, C):
    G, L, H, P = x.shape
    NG, N = B_mat.shape[-2], B_mat.shape[-1]
    assert dt.shape == (G, L, H), (dt.shape, (G, L, H))
    assert A.shape == (H,), (A.shape, H)
    assert B_mat.shape == (G, L, NG, N), B_mat.shape
    assert C.shape == (G, L, NG, N), C.shape
    assert H % NG == 0, f"nheads {H} not divisible by ngroups {NG}"
    return G, L, H, P, NG, N


def ssd_ref(
    x: jnp.ndarray,  # (G, L, H, P)
    dt: jnp.ndarray,  # (G, L, H)
    A: jnp.ndarray,  # (H,) — real, negative
    B_mat: jnp.ndarray,  # (G, L, NG, N)
    C: jnp.ndarray,  # (G, L, NG, N)
    D: Optional[jnp.ndarray] = None,  # (H,)
    dt_bias: Optional[jnp.ndarray] = None,  # (H,)
    dt_softplus: bool = False,
    reverse: bool = False,
    h_init: Optional[jnp.ndarray] = None,  # (G, H, N, P)
    return_final_state: bool = False,
):
    """Sequential reference implementation (numerics oracle)."""
    dtype = x.dtype
    G, L, H, P, NG, N = _check_shapes(x, dt, A, B_mat, C)
    rep = H // NG
    dtf = _resolve_dt(dt, dt_bias, dt_softplus)
    xf = x.astype(jnp.float32)
    Af = A.astype(jnp.float32)
    Bf = B_mat.astype(jnp.float32)
    Cf = C.astype(jnp.float32)
    if reverse:
        xf, dtf, Bf, Cf = (jnp.flip(t, axis=1) for t in (xf, dtf, Bf, Cf))

    def step(h, inputs):
        # h: (G, NG, rep, N, P)
        x_t, dt_t, B_t, C_t = inputs  # (G,H,P), (G,H), (G,NG,N), (G,NG,N)
        da = jnp.exp(dt_t * Af[None])  # (G, H)
        da_r = da.reshape(G, NG, rep)
        dx = (dt_t[..., None] * x_t).reshape(G, NG, rep, P)
        h = (da_r[..., None, None] * h
             + B_t[:, :, None, :, None] * dx[:, :, :, None, :])
        y = jnp.einsum("bgrnp,bgn->bgrp", h, C_t)
        return h, y.reshape(G, H, P)

    h0 = (jnp.zeros((G, NG, rep, N, P), jnp.float32) if h_init is None
          else h_init.astype(jnp.float32).reshape(G, NG, rep, N, P))
    xs = (
        jnp.moveaxis(xf, 1, 0),
        jnp.moveaxis(dtf, 1, 0),
        jnp.moveaxis(Bf, 1, 0),
        jnp.moveaxis(Cf, 1, 0),
    )
    h_last, ys = lax.scan(step, h0, xs)
    y = jnp.moveaxis(ys, 0, 1)  # (G, L, H, P)
    if reverse:
        y = jnp.flip(y, axis=1)
    if D is not None:
        y = y + x.astype(jnp.float32) * D.astype(jnp.float32)[None, None, :, None]
    y = y.astype(dtype)
    if return_final_state:
        return y, h_last.reshape(G, H, N, P)
    return y


def _conv_silu_chunk(xBC_c, tail, conv_w, conv_b):
    """Depthwise causal conv + SiLU on one chunk, in scan-order coordinates.

    ``xBC_c``: (G, T, ch) current chunk (already flipped for reverse scans);
    ``tail``: (G, K-1, ch) the last K-1 positions of the *previous* chunk in
    scan order (zeros at the sequence start — causal zero padding). Returns
    (conv_out, new_tail).
    """
    K = conv_w.shape[0]
    T = xBC_c.shape[1]
    full = jnp.concatenate([tail, xBC_c], axis=1)  # (G, T+K-1, ch)
    acc = jnp.zeros_like(xBC_c, dtype=jnp.float32)
    for k in range(K):
        acc = acc + conv_w[k].astype(jnp.float32) * full[:, k:k + T].astype(
            jnp.float32)
    if conv_b is not None:
        acc = acc + conv_b.astype(jnp.float32)
    return jax.nn.silu(acc), full[:, T:]


def _ssd_segment(h_carry, seg_in, A, D, dt_bias, dt_softplus, reverse,
                 out_dtype, conv_w, conv_b, dims, nci):
    """One scan-carried *segment* = ``nci`` dual-form chunks, batched.

    Processing several chunks per scan step keeps the MXU fed: all
    chunk-quadratic einsums batch over the (G, nci) axes, and only the tiny
    (G, H, N, P) chunk-entry-state chain runs sequentially (an unrolled
    ``nci``-step loop on state-sized tensors). Precision: decays/cumsums in
    fp32 on the VPU, matmul OPERANDS cast to the input storage dtype (bf16
    in the model → native MXU passes) with fp32 accumulation, state carry
    always fp32.

    Carry: (G, H, N, P) fp32 state — plus, when the depthwise conv is fused
    (``conv_w`` given), the (G, K-1, ch) conv tail of the previous segment
    in scan order. With the fused conv, ``seg_in`` holds the *pre-conv* xBC
    (G, S, d_inner + 2·NG·N): post-conv activations never exist at full
    sequence length (the working-set reduction that fits 131k training in
    16 GB HBM; cf. the v1 kernel's fused conv prologue, SURVEY.md §7.1).
    """
    if conv_w is None:
        h = h_carry
        x_c, dt_c, B_c, C_c = seg_in
        G, S, H, P = x_c.shape
        NG, N = B_c.shape[-2], B_c.shape[-1]
        mm = x_c.dtype
        dtf = _resolve_dt(dt_c, dt_bias, dt_softplus)  # (G, S, H)
        xf = x_c.astype(jnp.float32)
        Bf = B_c.astype(jnp.float32)
        Cf = C_c.astype(jnp.float32)
        if reverse:
            xf, dtf, Bf, Cf = (jnp.flip(t, axis=1) for t in (xf, dtf, Bf, Cf))
        new_tail = None
    else:
        h, tail = h_carry
        xBC_c, dt_c = seg_in
        H, P, NG, N = dims
        G, S = xBC_c.shape[0], xBC_c.shape[1]
        mm = xBC_c.dtype
        dtf = _resolve_dt(dt_c, dt_bias, dt_softplus)
        if reverse:
            xBC_c = jnp.flip(xBC_c, axis=1)
            dtf = jnp.flip(dtf, axis=1)
        xc, new_tail = _conv_silu_chunk(xBC_c, tail, conv_w, conv_b)
        xf = xc[..., : H * P].reshape(G, S, H, P)
        Bf = xc[..., H * P: H * P + NG * N].reshape(G, S, NG, N)
        Cf = xc[..., H * P + NG * N:].reshape(G, S, NG, N)

    rep = H // NG
    T = S // nci
    # chunk axis c: (G, nci, T, ...)
    xf = xf.reshape(G, nci, T, H, P)
    dtf = dtf.reshape(G, nci, T, H)
    Bf = Bf.reshape(G, nci, T, NG, N)
    Cf = Cf.reshape(G, nci, T, NG, N)

    a = dtf * A[None, None, None, :]  # (G, nci, T, H), <= 0 for dt >= 0
    cum = jnp.cumsum(a, axis=2)  # inclusive; monotone non-increasing
    # decay(t, s) = exp(cum_t - cum_s) for t >= s (exponent <= 0)
    seg = cum[:, :, :, None, :] - cum[:, :, None, :, :]  # (G, nci, T, T, H)
    tri = jnp.tril(jnp.ones((T, T), bool))[None, None, :, :, None]
    # mask the EXPONENT (not the exp): above the diagonal seg is positive
    # and unbounded — exp there would overflow, and an overflowed branch
    # poisons the VJP with inf·0 even under a post-exp where.
    Lm = jnp.exp(jnp.where(tri, seg, -jnp.inf))

    B_mm, C_mm = Bf.astype(mm), Cf.astype(mm)
    CB = jnp.einsum("bctgn,bcsgn->bctsg", C_mm, B_mm,
                    preferred_element_type=jnp.float32)  # (G, nci, T, T, NG)
    M = (CB[..., None] * Lm.reshape(G, nci, T, T, NG, rep)).astype(mm)
    dxf = dtf[..., None] * xf  # (G, nci, T, H, P) fp32
    dx = dxf.reshape(G, nci, T, NG, rep, P).astype(mm)
    y = jnp.einsum("bctsgr,bcsgrp->bctgrp", M, dx,
                   preferred_element_type=jnp.float32)

    # per-chunk exit quantities, then the tiny sequential chain over chunks
    w = jnp.exp(cum[:, :, -1:, :] - cum)  # (G, nci, T, H)
    wdx = (w[..., None] * dxf).reshape(G, nci, T, NG, rep, P).astype(mm)
    S_chunk = jnp.einsum("bcsgn,bcsgrp->bcgrnp", B_mm, wdx,
                         preferred_element_type=jnp.float32)
    e_end = jnp.exp(cum[:, :, -1, :]).reshape(G, nci, NG, rep)

    h_c = h.reshape(G, NG, rep, N, P)
    entries = []
    for c in range(nci):
        entries.append(h_c)
        h_c = e_end[:, c, ..., None, None] * h_c + S_chunk[:, c]
    h_out = h_c.reshape(G, H, N, P)
    S_in = jnp.stack(entries, axis=1)  # (G, nci, NG, rep, N, P)

    # contribution of the chunk-entry states: exp(cum_t) · C_t @ S_in
    y_in = jnp.einsum("bctgn,bcgrnp->bctgrp", C_mm, S_in.astype(mm),
                      preferred_element_type=jnp.float32)
    ecum = jnp.exp(cum).reshape(G, nci, T, NG, rep)
    y = y + ecum[..., None] * y_in

    if D is not None:
        y = y.reshape(G, S, H, P) + xf.reshape(G, S, H, P) * (
            D.astype(jnp.float32)[None, None, :, None])
    else:
        y = y.reshape(G, S, H, P)
    if reverse:
        y = jnp.flip(y, axis=1)
    if conv_w is None:
        return h_out, y.astype(out_dtype)
    return (h_out, new_tail), y.astype(out_dtype)


def ssd_chunked(
    x: jnp.ndarray,  # (G, L, H, P)
    dt: jnp.ndarray,  # (G, L, H)
    A: jnp.ndarray,  # (H,)
    B_mat: jnp.ndarray,  # (G, L, NG, N)
    C: jnp.ndarray,  # (G, L, NG, N)
    D: Optional[jnp.ndarray] = None,  # (H,)
    dt_bias: Optional[jnp.ndarray] = None,  # (H,)
    dt_softplus: bool = False,
    reverse: bool = False,
    chunk_size: int = 256,
    h_init: Optional[jnp.ndarray] = None,  # (G, H, N, P)
    return_final_state: bool = False,
    conv_w: Optional[jnp.ndarray] = None,  # (K, d_inner + 2·NG·N)
    conv_b: Optional[jnp.ndarray] = None,
    dims: Optional[Tuple[int, int, int, int]] = None,  # (H, P, NG, N)
    seg_chunks: int = 8,
):
    """Chunked (dual-form) SSD scan. See module docstring.

    ``h_init`` / ``return_final_state`` segment a long sequence across
    calls, mirroring `selective_scan`'s contract (context-parallel /
    prefill chaining).

    Fused-conv mode (``conv_w`` given): ``x`` is the *pre-conv* xBC tensor
    (G, L, d_inner + 2·NG·N) and ``B_mat``/``C`` must be None — the
    depthwise causal conv + SiLU and the x/B/C split happen inside the
    checkpointed chunk body, carrying a (K-1)-position tail between chunks,
    so post-conv activations never materialize at full L. ``dims`` supplies
    (H, P, NG, N). D/dt_bias/h_init semantics are unchanged.
    """
    dtype = x.dtype
    if conv_w is not None:
        assert B_mat is None and C is None and dims is not None
        H, P, NG, N = dims
        G, L = x.shape[0], x.shape[1]
        assert x.shape[2] == H * P + 2 * NG * N, (x.shape, dims)
        assert dt.shape == (G, L, H), (dt.shape, (G, L, H))
    else:
        G, L, H, P, NG, N = _check_shapes(x, dt, A, B_mat, C)
    Af = A.astype(jnp.float32)

    ck = min(chunk_size, L)
    # scan step = a segment of nci chunks (batched in the body)
    nci = max(1, min(seg_chunks, -(-L // ck)))
    ck_seg = ck * nci
    tensors = [x, dt] if conv_w is not None else [x, dt, B_mat, C]
    if L % ck_seg != 0:
        # pad to a whole-segment multiple with exact identity steps
        # (decay 1, drive 0): resolved dt must be 0 at pad positions; x/B/C
        # pad with zeros (drive = dt*B*x = 0 regardless, output sliced off).
        pad = ck_seg - L % ck_seg
        padded = []
        for i, t in enumerate(tensors):
            if i == 1 and dt_softplus:
                fill = jnp.full(
                    (G, pad) + t.shape[2:], -1e4, t.dtype)
            elif i == 1 and dt_bias is not None:
                # resolved dt = raw + bias must be 0 at pad positions, so the
                # raw pad value is -dt_bias (not 0 — a nonzero bias would
                # otherwise leak decay/drive into the final state; the same
                # policy as ops/ssd_pallas.py _pad_ssd)
                fill = jnp.broadcast_to(
                    -jnp.asarray(dt_bias, t.dtype).reshape(1, 1, H),
                    (G, pad, H))
            else:
                fill = jnp.zeros((G, pad) + t.shape[2:], t.dtype)
            padded.append(jnp.concatenate([t, fill], axis=1))
        tensors = padded
    Lp = tensors[0].shape[1]
    nseg = Lp // ck_seg

    def to_chunks(t):
        return jnp.moveaxis(t.reshape(G, nseg, ck_seg, *t.shape[2:]), 1, 0)

    xs = tuple(to_chunks(t) for t in tensors)
    h0 = (jnp.zeros((G, H, N, P), jnp.float32) if h_init is None
          else h_init.astype(jnp.float32))
    if conv_w is not None:
        K = conv_w.shape[0]
        tail0 = jnp.zeros((G, K - 1, x.shape[2]), x.dtype)
        carry0 = (h0, tail0)
    else:
        carry0 = h0

    body = jax.checkpoint(
        functools.partial(
            _ssd_segment,
            A=Af,
            D=D,
            dt_bias=dt_bias,
            dt_softplus=dt_softplus,
            reverse=reverse,
            out_dtype=dtype,
            conv_w=conv_w,
            conv_b=conv_b,
            dims=(H, P, NG, N),
            nci=nci,
        )
    )
    carry_last, ys = lax.scan(body, carry0, xs, reverse=reverse)
    h_last = carry_last[0] if conv_w is not None else carry_last
    y = jnp.moveaxis(ys, 0, 1).reshape(G, Lp, H, P)[:, :L]
    if return_final_state:
        return y, h_last
    return y


def ssd_step(
    h: jnp.ndarray,  # (G, H, N, P) fp32 state
    x_t: jnp.ndarray,  # (G, H, P)
    dt_t: jnp.ndarray,  # (G, H) raw
    A: jnp.ndarray,  # (H,)
    B_t: jnp.ndarray,  # (G, NG, N)
    C_t: jnp.ndarray,  # (G, NG, N)
    D: Optional[jnp.ndarray] = None,  # (H,)
    dt_bias: Optional[jnp.ndarray] = None,
    dt_softplus: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single recurrence step (O(1)/token inference). Returns (h, y_t)."""
    G, H, N, P = h.shape
    NG = B_t.shape[-2]
    rep = H // NG
    dtf = _resolve_dt(dt_t, dt_bias, dt_softplus)  # (G, H)
    Af = A.astype(jnp.float32)
    da = jnp.exp(dtf * Af[None]).reshape(G, NG, rep)
    dx = (dtf[..., None] * x_t.astype(jnp.float32)).reshape(G, NG, rep, P)
    h_r = h.reshape(G, NG, rep, N, P)
    h_r = (da[..., None, None] * h_r
           + B_t.astype(jnp.float32)[:, :, None, :, None]
           * dx[:, :, :, None, :])
    y = jnp.einsum("bgrnp,bgn->bgrp", h_r, C_t.astype(jnp.float32))
    y = y.reshape(G, H, P)
    if D is not None:
        y = y + x_t.astype(jnp.float32) * D.astype(jnp.float32)[None, :, None]
    return h_r.reshape(G, H, N, P), y.astype(x_t.dtype)
