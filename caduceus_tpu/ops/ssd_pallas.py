"""Pallas TPU kernels for the SSD (Mamba-2) scan — forward + backward.

The XLA chunked dual form (`ops/ssd.py`) is HBM-bound: its (T, T)
chunk-quadratic temporaries (decay matrix, masked C·Bᵀ, per-chunk einsum
intermediates) are materialized between ops. These kernels keep every
(T, T) tile in VMEM for the lifetime of a chunk (the Triton-SSD locality
argument of Dao & Gu, arXiv:2405.21060 §7), so HBM traffic is just the
(L, ·) operand/output streams plus one (H, N, P) state per chunk boundary.

Math per chunk of T scan positions, per head h (group g = h // rep), with
a_t = dt_t·A_h (<= 0), cum = inclusive in-scan-order cumsum of a,
total = Σ_t a_t, w = exp(total − cum), E = exp(total), dx = dt ⊙ x:

    CB        = C @ Bᵀ                                  (T, T)   MXU
    Lm        = exp(mask(cum_t − cum_s))                (T, T)   VPU
    y         = (CB ⊙ Lm) @ dx + exp(cum) ⊙ (C @ h_in) + D·x    MXU
    S_chunk   = Bᵀ @ (w ⊙ dx)                           (N, P)   MXU
    h_out     = E · h_in + S_chunk

The cumsum itself runs on the MXU as `tril_ones @ a` (a is (T, H) — one
matmul covers all heads). `reverse=True` swaps tril↔triu masks and the
chunk grid order — no flipped copies of anything exist (the same
index-arithmetic policy as `ops/scan_pallas.py`).

Backward (exact adjoint, all tiles in VMEM; derivation in the kernel):
with λ = g_h_out (chained from the next-in-scan-order chunk, g_hN at the
end) and G_{t,s} = Σ_p g_y[t]·dx[s]:

    g_dx   = (CB ⊙ Lm)ᵀ @ g_y + w ⊙ (B @ λ)
    g_C    = (Lm ⊙ G) @ B + exp(cum) ⊙ (g_y @ h_inᵀ)
    g_B    = (Lm ⊙ G)ᵀ @ C + w ⊙ (dx @ λᵀ)
    g_cum  = rowsum(Lm⊙G⊙CB) − colsum(Lm⊙G⊙CB)
             + exp(cum)·Σ_p g_y·(C @ h_in) − w·Σ_p dx·(B @ λ)
             + 1[t = last]·Σ λ·h_out
    g_a    = reverse-in-scan-time cumsum of g_cum     (triuᵀ matmul)
    λ'     = E · λ + Cᵀ @ (exp(cum) ⊙ g_y)            (new g_h_in)

then g_dt = A·g_a + Σ_p x·g_dx (+ softplus chain), g_A = Σ dt·g_a,
g_x = dt·g_dx + D·g_y, g_D = Σ g_y·x. The final λ is dL/dh_init, emitted
for exact shard-boundary chaining (context parallelism / prefill).

Semantics match `ops/ssd.py ssd_chunked` (same dt resolution, fp32 state,
matmul operands in the storage dtype with fp32 accumulation); parity is
tested in tests/test_ssd_pallas.py against `ssd_ref` and `jax.grad` of the
XLA form.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _carry_dtype(x_dtype) -> jnp.dtype:
    """Dtype of the chunk-entry states saved for the backward pass.

    Follows the input dtype: bf16 inputs get bf16 carries (halving the HBM
    footprint at the kernel's own precision class), while fp32 inputs keep
    exact-to-oracle fp32 carries — a fully-fp32 run must not silently
    quantize its adjoint boundary states. CADUCEUS_SSD_CARRY_DTYPE overrides
    for experiments."""
    env = os.environ.get("CADUCEUS_SSD_CARRY_DTYPE")
    if env:
        return jnp.dtype(env)
    x_dtype = jnp.dtype(x_dtype)
    return x_dtype if x_dtype == jnp.dtype(jnp.bfloat16) else jnp.dtype(
        jnp.float32)


def _cum_masks(T: int, reverse: bool):
    """(keep, Mcum, McumT): the pair mask and the two cumsum matmul masks.

    Forward scan: keep[t,s] = t >= s (receive from earlier array positions),
    cum = tril_ones @ a (inclusive prefix sum), g_a = triu_ones @ g_cum
    (inclusive suffix sum). Reverse scan: the transposes.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
    ge = r >= c
    keep = ge if not reverse else (r <= c)
    Mcum = keep.astype(jnp.float32)
    McumT = (r <= c if not reverse else ge).astype(jnp.float32)
    return keep, Mcum, McumT


def _resolve_dt_tile(dt_raw, bias_ref, dt_softplus):
    dt = dt_raw.astype(jnp.float32)  # (T, H)
    dt = dt + bias_ref[...]
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    return dt


def _mm(a, b, mm_dtype, dims=None):
    """Matmul with operands cast to the storage dtype, fp32 accumulation
    (the `ops/ssd.py` precision policy; native MXU passes for bf16)."""
    if dims is None:
        dims = (((1,), (0,)), ((), ()))
    return jax.lax.dot_general(
        a.astype(mm_dtype), b.astype(mm_dtype), dimension_numbers=dims,
        preferred_element_type=jnp.float32,
    )


_CONTRACT_0 = (((0,), (0,)), ((), ()))  # aᵀ @ b without materializing aᵀ
_CONTRACT_1 = (((1,), (1,)), ((), ()))  # a @ bᵀ without materializing bᵀ


def _fwd_kernel(
    x_ref, dt_ref, B_ref, C_ref, A_ref, D_ref, bias_ref, h0_ref,
    *rest,
    T: int, nci: int, H: int, Pd: int, NG: int, N: int,
    reverse: bool, dt_softplus: bool, save_carries: bool, mm_dtype,
):
    # Each grid step streams a SEGMENT of nci chunks (amortizing grid/DMA
    # overhead over nci·T positions); chunks run as an in-kernel static loop
    # in scan order, carrying the (H·N, Pd) state in scratch.
    if save_carries:
        y_ref, hN_ref, car_ref, h_s = rest
    else:
        y_ref, hN_ref, h_s = rest
    ci = pl.program_id(1)
    rep = H // NG

    @pl.when(ci == 0)
    def _():
        h_s[...] = h0_ref[0]

    keep, Mcum, _ = _cum_masks(T, reverse)
    order = range(nci - 1, -1, -1) if reverse else range(nci)
    for c in order:
        o = c * T
        if save_carries:
            car_ref[0, c] = h_s[...].astype(car_ref.dtype)
        dt = _resolve_dt_tile(dt_ref[0, o:o + T], bias_ref, dt_softplus)
        a = dt * A_ref[...]                               # (T, H), <= 0
        # HIGHEST: the default MXU pass truncates `a` to bf16, and the
        # exp(cum) chains amplify that into ~1e-2 output error vs the
        # oracle's exact fp32 jnp.cumsum (caught by scripts/verify_tpu.py
        # on device — interpret mode is exact and cannot see it). The
        # (T, T) @ (T, H=8) dot is tiny; extra passes are free.
        cum = jax.lax.dot_general(
            Mcum, a, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                                 # (T, H) inclusive
        total = jnp.sum(a, axis=0, keepdims=True)         # (1, H)
        ecum = jnp.exp(cum)
        w = jnp.exp(total - cum)
        e_end = jnp.exp(total)
        cum_rows = jnp.transpose(cum)                     # (H, T)

        xf = x_ref[0, o:o + T, :].astype(jnp.float32)     # (T, H*Pd)
        Bm = B_ref[0, o:o + T, :]                         # (T, NG*N)
        Cm = C_ref[0, o:o + T, :]

        for g in range(NG):
            Bg = Bm[:, g * N:(g + 1) * N]
            Cg = Cm[:, g * N:(g + 1) * N]
            CB = _mm(Cg, Bg, mm_dtype, _CONTRACT_1)       # (T,T) Σ_n C_t B_s
            for r_i in range(rep):
                h = g * rep + r_i
                xh = xf[:, h * Pd:(h + 1) * Pd]           # (T, Pd) fp32
                dxh = dt[:, h:h + 1] * xh
                seg = cum[:, h:h + 1] - cum_rows[h:h + 1, :]
                Lm = jnp.exp(jnp.where(keep, seg, -jnp.inf))
                M = CB * Lm
                h_in = h_s[h * N:(h + 1) * N, :]          # (N, Pd) fp32
                y_h = _mm(M, dxh, mm_dtype)
                y_h = y_h + ecum[:, h:h + 1] * _mm(Cg, h_in, mm_dtype)
                y_h = y_h + D_ref[0:1, h:h + 1] * xh
                y_ref[0, o:o + T, h * Pd:(h + 1) * Pd] = y_h.astype(
                    y_ref.dtype)
                wdx = w[:, h:h + 1] * dxh
                S = _mm(Bg, wdx, mm_dtype, _CONTRACT_0)   # (N, Pd)
                h_s[h * N:(h + 1) * N, :] = (
                    e_end[0:1, h:h + 1] * h_in + S
                )

    # last grid step's write survives == the scan-final state
    hN_ref[0] = h_s[...]


def _pad_ssd(tensors, pad, dt_softplus, dt_bias, H):
    """State-transparent right padding: resolved dt = 0 at pad positions
    (identity decay, zero drive); x/B/C pad with zeros."""
    out = []
    for i, t in enumerate(tensors):
        if i == 1:  # raw dt (G, L, H)
            G = t.shape[0]
            if dt_softplus:
                fill = jnp.full((G, pad, H), -1e4, t.dtype)
            elif dt_bias is not None:
                fill = jnp.broadcast_to(
                    -jnp.asarray(dt_bias, t.dtype).reshape(1, 1, H),
                    (G, pad, H))
            else:
                fill = jnp.zeros((G, pad, H), t.dtype)
            out.append(jnp.concatenate([t, fill], axis=1))
        else:
            out.append(
                jnp.pad(t, ((0, 0), (0, pad)) + ((0, 0),) * (t.ndim - 2)))
    return out


def ssd_pallas_fwd_impl(
    x: jnp.ndarray,      # (G, L, H, P)
    dt: jnp.ndarray,     # (G, L, H) raw
    A: jnp.ndarray,      # (H,)
    B_mat: jnp.ndarray,  # (G, L, NG, N)
    C: jnp.ndarray,      # (G, L, NG, N)
    D: Optional[jnp.ndarray],
    dt_bias: Optional[jnp.ndarray],
    dt_softplus: bool,
    reverse: bool,
    chunk_size: int = 256,
    interpret: bool = False,
    save_carries: bool = False,
    h_init=None,         # (G, H, N, P) fp32
    seg_chunks: int = 4,
):
    G, L, H, Pd = x.shape
    NG, N = B_mat.shape[-2], B_mat.shape[-1]
    T = min(chunk_size, L)
    nci = max(1, min(seg_chunks, -(-L // T)))
    Ts = T * nci  # positions per grid step

    x3 = x.reshape(G, L, H * Pd)
    B3 = B_mat.reshape(G, L, NG * N)
    C3 = C.reshape(G, L, NG * N)
    tensors = [x3, dt, B3, C3]
    if L % Ts != 0:
        tensors = _pad_ssd(tensors, Ts - L % Ts, dt_softplus, dt_bias, H)
    Lp = tensors[0].shape[1]
    nseg = Lp // Ts

    A_in = jnp.asarray(A, jnp.float32).reshape(1, H)
    D_in = (jnp.zeros((1, H), jnp.float32) if D is None
            else jnp.asarray(D, jnp.float32).reshape(1, H))
    bias_in = (jnp.zeros((1, H), jnp.float32) if dt_bias is None
               else jnp.asarray(dt_bias, jnp.float32).reshape(1, H))
    h0_in = (jnp.zeros((G, H * N, Pd), jnp.float32) if h_init is None
             else jnp.asarray(h_init, jnp.float32).reshape(G, H * N, Pd))

    cmap = ((lambda g, i: (g, nseg - 1 - i, 0)) if reverse
            else (lambda g, i: (g, i, 0)))
    full2 = lambda g, i: (0, 0)
    smap = lambda g, i: (g, 0, 0)

    xd_spec = pl.BlockSpec((1, Ts, H * Pd), cmap, memory_space=pltpu.VMEM)
    dt_spec = pl.BlockSpec((1, Ts, H), cmap, memory_space=pltpu.VMEM)
    bc_spec = pl.BlockSpec((1, Ts, NG * N), cmap, memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((1, H), full2, memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((1, H * N, Pd), smap, memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((G, Lp, H * Pd), x.dtype),
        jax.ShapeDtypeStruct((G, H * N, Pd), jnp.float32),
    ]
    out_specs = [xd_spec, st_spec]
    if save_carries:
        # chunk-entry states, one (nci-slot) block per segment
        out_shape.append(
            jax.ShapeDtypeStruct((G, nseg * nci, H * N, Pd),
                                 _carry_dtype(x.dtype)))
        out_specs.append(pl.BlockSpec(
            (1, nci, H * N, Pd),
            (lambda g, i: (g, nseg - 1 - i, 0, 0)) if reverse
            else (lambda g, i: (g, i, 0, 0)),
            memory_space=pltpu.VMEM,
        ))

    kernel = functools.partial(
        _fwd_kernel, T=T, nci=nci, H=H, Pd=Pd, NG=NG, N=N, reverse=reverse,
        dt_softplus=dt_softplus, save_carries=save_carries, mm_dtype=x.dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(G, nseg),
        in_specs=[xd_spec, dt_spec, bc_spec, bc_spec, h_spec, h_spec, h_spec,
                  st_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((H * N, Pd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # the default 16 MB scoped-VMEM budget rejects production
            # geometry (H=8, P=64, N=128, seg=4 needs ~17-20 MB with
            # double-buffered streams); v5e has 128 MB of VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*tensors, A_in, D_in, bias_in, h0_in)

    if save_carries:
        y, hN, carries = out
        return (y[:, :L].reshape(G, L, H, Pd),
                hN.reshape(G, H, N, Pd), carries, T, nci)
    y, hN = out
    return y[:, :L].reshape(G, L, H, Pd), hN.reshape(G, H, N, Pd)


# ===========================================================================
# Backward kernel
# ===========================================================================

def _bwd_kernel(
    x_ref, dt_ref, B_ref, C_ref, A_ref, D_ref, bias_ref, gy_ref, car_ref,
    ghN_ref,
    gx_ref, gdt_ref, gB_ref, gC_ref, gA_ref, gD_ref, gbias_ref, gh0_ref,
    lam_s, acc_s,
    *,
    T: int, nci: int, H: int, Pd: int, NG: int, N: int,
    reverse: bool, dt_softplus: bool, mm_dtype,
):
    gi = pl.program_id(0)
    ci = pl.program_id(1)
    rep = H // NG

    @pl.when(jnp.logical_and(gi == 0, ci == 0))
    def _():
        acc_s[...] = jnp.zeros_like(acc_s)  # rows: [g_A; g_bias; g_D]

    @pl.when(ci == 0)
    def _():
        # adjoint carry init = cotangent of the scan-final state
        lam_s[...] = ghN_ref[0]

    keep, Mcum, McumT = _cum_masks(T, reverse)
    # scan-order last position in array coordinates
    last_t = 0 if reverse else T - 1
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) == last_t
              ).astype(jnp.float32)
    A_row = A_ref[...]

    # chunks visited backward in scan time
    order = range(nci) if reverse else range(nci - 1, -1, -1)
    for c in order:
        o = c * T
        dt = _resolve_dt_tile(dt_ref[0, o:o + T], bias_ref, dt_softplus)
        a = dt * A_row
        cum = jax.lax.dot_general(
            Mcum, a, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # exact passes — see the fwd kernel's cum note
            precision=jax.lax.Precision.HIGHEST,
        )
        total = jnp.sum(a, axis=0, keepdims=True)
        ecum = jnp.exp(cum)
        w = jnp.exp(total - cum)
        e_end = jnp.exp(total)
        cum_rows = jnp.transpose(cum)

        xf = x_ref[0, o:o + T, :].astype(jnp.float32)     # (T, H*Pd)
        gy = gy_ref[0, o:o + T, :].astype(jnp.float32)
        Bm = B_ref[0, o:o + T, :]
        Cm = C_ref[0, o:o + T, :]
        h0 = car_ref[0, c].astype(jnp.float32)            # (H*N, Pd)

        g_cum_cols = []
        g_dtx_cols = []
        gD_vals = []
        for g in range(NG):
            Bg = Bm[:, g * N:(g + 1) * N]
            Cg = Cm[:, g * N:(g + 1) * N]
            CB = _mm(Cg, Bg, mm_dtype, _CONTRACT_1)       # (T, T)
            gB_acc = jnp.zeros((T, N), jnp.float32)
            gC_acc = jnp.zeros((T, N), jnp.float32)
            for r_i in range(rep):
                h = g * rep + r_i
                xh = xf[:, h * Pd:(h + 1) * Pd]
                gyh = gy[:, h * Pd:(h + 1) * Pd]
                dth = dt[:, h:h + 1]
                dxh = dth * xh
                seg = cum[:, h:h + 1] - cum_rows[h:h + 1, :]
                Lm = jnp.exp(jnp.where(keep, seg, -jnp.inf))
                M = CB * Lm
                lam_h = lam_s[h * N:(h + 1) * N, :]       # (N, Pd) fp32
                h_in = h0[h * N:(h + 1) * N, :]
                wh = w[:, h:h + 1]
                eh = ecum[:, h:h + 1]
                Eh = e_end[0:1, h:h + 1]

                G_ts = _mm(gyh, dxh, mm_dtype, _CONTRACT_1)   # (T, T)
                LG = Lm * G_ts
                LGCB = LG * CB
                ones = jnp.ones((T, 1), jnp.float32)
                row_r = _mm(LGCB, ones, jnp.float32)               # (T, 1)
                col_c = _mm(LGCB, ones, jnp.float32, _CONTRACT_0)  # (T, 1)

                Blam = _mm(Bg, lam_h, mm_dtype)           # (T, Pd)
                g_dx = _mm(M, gyh, mm_dtype, _CONTRACT_0) + wh * Blam
                Ch = _mm(Cg, h_in, mm_dtype)              # (T, Pd)
                q = eh * jnp.sum(gyh * Ch, axis=1, keepdims=True)
                uterm = wh * jnp.sum(dxh * Blam, axis=1, keepdims=True)
                wdx = wh * dxh
                S = _mm(Bg, wdx, mm_dtype, _CONTRACT_0)   # (N, Pd)
                h_out = Eh * h_in + S
                gend = jnp.sum(lam_h * h_out).reshape(1, 1)
                g_cum_cols.append(row_r + q - col_c - uterm + onehot * gend)

                gC_acc = gC_acc + _mm(LG, Bg, mm_dtype) + eh * _mm(
                    gyh, h_in, mm_dtype, _CONTRACT_1)
                gB_acc = gB_acc + _mm(LG, Cg, mm_dtype, _CONTRACT_0) + (
                    wh * _mm(dxh, lam_h, mm_dtype, _CONTRACT_1))

                g_x_h = dth * g_dx + D_ref[0:1, h:h + 1] * gyh
                gx_ref[0, o:o + T, h * Pd:(h + 1) * Pd] = g_x_h.astype(
                    gx_ref.dtype)
                g_dtx_cols.append(jnp.sum(xh * g_dx, axis=1, keepdims=True))
                gD_vals.append(jnp.sum(gyh * xh).reshape(1, 1))

                lam_s[h * N:(h + 1) * N, :] = Eh * lam_h + _mm(
                    Cg, eh * gyh, mm_dtype, _CONTRACT_0)

            gB_ref[0, o:o + T, g * N:(g + 1) * N] = gB_acc.astype(
                gB_ref.dtype)
            gC_ref[0, o:o + T, g * N:(g + 1) * N] = gC_acc.astype(
                gC_ref.dtype)

        g_cum = jnp.concatenate(g_cum_cols, axis=1)       # (T, H)
        # g_a = inclusive reverse-in-scan-time cumsum of g_cum
        g_a = jax.lax.dot_general(
            McumT, g_cum, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            # exact passes — see the fwd kernel's cum note
            precision=jax.lax.Precision.HIGHEST,
        )
        g_dt = A_row * g_a + jnp.concatenate(g_dtx_cols, axis=1)
        if dt_softplus:
            # d softplus(x)/dx = sigmoid(x) = 1 - exp(-softplus(x))
            g_dt = g_dt * (1.0 - jnp.exp(-dt))
        gdt_ref[0, o:o + T] = g_dt.astype(gdt_ref.dtype)

        acc_s[0:1] = acc_s[0:1] + jnp.sum(dt * g_a, axis=0, keepdims=True)
        acc_s[1:2] = acc_s[1:2] + jnp.sum(g_dt, axis=0, keepdims=True)
        acc_s[2:3] = acc_s[2:3] + jnp.concatenate(gD_vals, axis=1)

    # after the last grid step (scan-order chunk 0) this is dL/dh_init
    gh0_ref[0] = lam_s[...]
    gA_ref[...] = acc_s[0:1]
    gbias_ref[...] = acc_s[1:2]
    gD_ref[...] = acc_s[2:3]


def ssd_pallas_bwd_impl(
    x, dt, A, B_mat, C, D, dt_bias, g_y, carries,
    dt_softplus: bool,
    reverse: bool,
    T: int,
    nci: int,
    interpret: bool = False,
    g_hN=None,  # (G, H, N, P)
):
    """Returns (g_x, g_dt, g_A, g_B, g_C, g_D, g_bias, g_h0)."""
    G, L, H, Pd = x.shape
    NG, N = B_mat.shape[-2], B_mat.shape[-1]
    nc = carries.shape[1]
    nseg = nc // nci
    Ts = T * nci
    Lp = nc * T

    x3 = x.reshape(G, L, H * Pd)
    B3 = B_mat.reshape(G, L, NG * N)
    C3 = C.reshape(G, L, NG * N)
    gy3 = g_y.reshape(G, L, H * Pd)
    tensors = [x3, dt, B3, C3, gy3]
    if L % Ts != 0:
        tensors = _pad_ssd(tensors, Lp - L, dt_softplus, dt_bias, H)
    x_p, dt_p, B_p, C_p, gy_p = tensors

    A_in = jnp.asarray(A, jnp.float32).reshape(1, H)
    D_in = (jnp.zeros((1, H), jnp.float32) if D is None
            else jnp.asarray(D, jnp.float32).reshape(1, H))
    bias_in = (jnp.zeros((1, H), jnp.float32) if dt_bias is None
               else jnp.asarray(dt_bias, jnp.float32).reshape(1, H))
    ghN_in = (jnp.zeros((G, H * N, Pd), jnp.float32) if g_hN is None
              else jnp.asarray(g_hN, jnp.float32).reshape(G, H * N, Pd))

    # the adjoint runs backward in scan time: grid i processes scan-order
    # segment nseg-1-i, whose ARRAY segment index is nseg-1-i (forward
    # scans) / i (reverse scans)
    cmap = ((lambda g, i: (g, i, 0)) if reverse
            else (lambda g, i: (g, nseg - 1 - i, 0)))
    car_map = ((lambda g, i: (g, i, 0, 0)) if reverse
               else (lambda g, i: (g, nseg - 1 - i, 0, 0)))
    full2 = lambda g, i: (0, 0)
    smap = lambda g, i: (g, 0, 0)

    xd_spec = pl.BlockSpec((1, Ts, H * Pd), cmap, memory_space=pltpu.VMEM)
    dt_spec = pl.BlockSpec((1, Ts, H), cmap, memory_space=pltpu.VMEM)
    bc_spec = pl.BlockSpec((1, Ts, NG * N), cmap, memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((1, H), full2, memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((1, H * N, Pd), smap, memory_space=pltpu.VMEM)
    car_spec = pl.BlockSpec((1, nci, H * N, Pd), car_map,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _bwd_kernel, T=T, nci=nci, H=H, Pd=Pd, NG=NG, N=N, reverse=reverse,
        dt_softplus=dt_softplus, mm_dtype=x.dtype,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(G, nseg),
        in_specs=[xd_spec, dt_spec, bc_spec, bc_spec, h_spec, h_spec, h_spec,
                  xd_spec, car_spec, st_spec],
        out_specs=(xd_spec, dt_spec, bc_spec, bc_spec, h_spec, h_spec,
                   h_spec, st_spec),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lp, H * Pd), x.dtype),
            jax.ShapeDtypeStruct((G, Lp, H), dt.dtype),
            jax.ShapeDtypeStruct((G, Lp, NG * N), B_mat.dtype),
            jax.ShapeDtypeStruct((G, Lp, NG * N), C.dtype),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((1, H), jnp.float32),
            jax.ShapeDtypeStruct((G, H * N, Pd), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((H * N, Pd), jnp.float32),  # lam carry
            pltpu.VMEM((3, H), jnp.float32),       # [g_A; g_bias; g_D]
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,  # see fwd kernel note
        ),
        interpret=interpret,
    )(x_p, dt_p, B_p, C_p, A_in, D_in, bias_in, gy_p, carries, ghN_in)
    g_x, g_dt, g_B, g_C, g_A, g_D, g_bias, g_h0 = outs
    g_bias_v = g_bias[0]
    if Lp != L and not dt_softplus:
        # identity-decay pad steps still carry a nonzero dt-gradient
        # (λ·A·h); rebuild g_bias from real positions (cf. scan_pallas.py)
        g_bias_v = jnp.sum(g_dt[:, :L].astype(jnp.float32), axis=(0, 1))
    return (
        g_x[:, :L].reshape(G, L, H, Pd),
        g_dt[:, :L],
        g_A[0].astype(jnp.asarray(A).dtype),
        g_B[:, :L].reshape(G, L, NG, N),
        g_C[:, :L].reshape(G, L, NG, N),
        g_D[0],
        g_bias_v,
        g_h0.reshape(G, H, N, Pd),
    )


# ===========================================================================
# custom_vjp wrappers
# ===========================================================================

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def ssd_pallas_chained(
    x, dt, A, B_mat, C, D, dt_bias, h_init,
    dt_softplus: bool = True,
    reverse: bool = False,
    chunk_size: int = 256,
    interpret: bool = False,
    seg_chunks: int = 4,
):
    """Chained Pallas SSD scan: returns (y, h_final).

    ``h_init``/``h_final`` are (G, H, N, P) fp32; the VJP consumes the
    downstream cotangent g_hN as the adjoint-carry init and emits dL/dh_init
    (exact shard-boundary chaining — context parallelism, chunked prefill).
    """
    return ssd_pallas_fwd_impl(
        x, dt, A, B_mat, C, D, dt_bias, dt_softplus, reverse, chunk_size,
        interpret, save_carries=False, h_init=h_init, seg_chunks=seg_chunks,
    )


def _chained_fwd(x, dt, A, B_mat, C, D, dt_bias, h_init,
                 dt_softplus, reverse, chunk_size, interpret, seg_chunks):
    y, hN, carries, T, nci = ssd_pallas_fwd_impl(
        x, dt, A, B_mat, C, D, dt_bias, dt_softplus, reverse, chunk_size,
        interpret, save_carries=True, h_init=h_init, seg_chunks=seg_chunks,
    )
    return (y, hN), (x, dt, A, B_mat, C, D, dt_bias, carries, T, nci)


def _chained_bwd(dt_softplus, reverse, chunk_size, interpret, seg_chunks,
                 residuals, g):
    x, dt, A, B_mat, C, D, dt_bias, carries, T, nci = residuals
    g_y, g_hN = g
    (g_x, g_dt, g_A, g_B, g_C, g_D, g_bias, g_h0) = ssd_pallas_bwd_impl(
        x, dt, A, B_mat, C, D, dt_bias, g_y.astype(x.dtype), carries,
        dt_softplus, reverse, T, nci, interpret, g_hN=g_hN,
    )
    if D is None:
        g_D = None
    else:
        g_D = g_D.astype(jnp.asarray(D).dtype).reshape(jnp.shape(D))
    if dt_bias is None:
        g_bias = None
    else:
        g_bias = g_bias.astype(jnp.asarray(dt_bias).dtype).reshape(
            jnp.shape(dt_bias))
    return (g_x.astype(x.dtype), g_dt.astype(dt.dtype), g_A,
            g_B.astype(B_mat.dtype), g_C.astype(C.dtype), g_D, g_bias, g_h0)


ssd_pallas_chained.defvjp(_chained_fwd, _chained_bwd)


def resolve_ssd_kernel(kernel: str):
    """Map a ``use_kernel`` string to ``(ssd_fn, chained_fn, interpret)``.

    ``"pallas"`` / ``"pallas_interpret"`` select the per-head kernels in
    this module; ``"pallas_batched"`` / ``"pallas_batched_interpret"``
    select the head-batched variants (`ops/ssd_pallas_batched.py` — same
    interface, (N, H·P) state layout). Central dispatch point for every
    SSD call site (models/mamba2.py, parallel/seq_scan.py, inference.py).
    """
    interpret = kernel.endswith("_interpret")
    if kernel.startswith("pallas_batched"):
        from caduceus_tpu.ops.ssd_pallas_batched import (
            ssd_pallas_batched, ssd_pallas_batched_chained)

        return ssd_pallas_batched, ssd_pallas_batched_chained, interpret
    return ssd_pallas, ssd_pallas_chained, interpret


def ssd_pallas(
    x, dt, A, B_mat, C,
    D=None,
    dt_bias=None,
    dt_softplus: bool = False,
    reverse: bool = False,
    chunk_size: int = 256,
    interpret: bool = False,
    h_init=None,
    return_final_state: bool = False,
    seg_chunks: int = 4,
):
    """Drop-in for `ops/ssd.py ssd_chunked` (explicit-x/B/C mode) running the
    Pallas kernels."""
    if h_init is None:
        G, _, H, Pd = x.shape
        N = B_mat.shape[-1]
        h_init = jnp.zeros((G, H, N, Pd), jnp.float32)
    y, hN = ssd_pallas_chained(
        x, dt, A, B_mat, C, D, dt_bias, h_init,
        dt_softplus, reverse, chunk_size, interpret, seg_chunks,
    )
    if return_final_state:
        return y, hN
    return y
