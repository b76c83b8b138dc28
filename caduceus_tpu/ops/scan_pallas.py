"""Pallas TPU kernels for the selective scan (forward + backward).

TPU-native replacement for the reference's fused CUDA ``selective_scan_fwd``
/ ``selective_scan_bwd`` (mamba-ssm 1.2.0, SURVEY.md §2.3): the recurrence
runs entirely in VMEM with the (N, d) state held in scratch across sequence
chunks — the (B, L, d, N) decay/drive tensors are never materialized in HBM.

Layout (TPU-first):
- activations are (G, L, d) with the channel axis on lanes (d ideally a
  multiple of 128); G = batch × strands (RCPS folds both strands into G);
- the state is (G_blk, N, d): N on sublanes, d on lanes — the per-timestep
  update is a handful of fused VPU ops on contiguous registers;
- A is passed transposed as (N, d);
- grid = (G / G_blk, L / T): the chunk axis iterates sequentially (TPU grid
  order), carrying state in VMEM scratch; state resets when the chunk index
  returns to 0 for the next group block;
- per-step dynamic slicing touches only fp32 scratch (Mosaic rejects
  sublane-unaligned dynamic access on bf16 refs), so bf16 inputs are
  upcast chunk-wide into scratch first.

``reverse=True`` runs the scan right-to-left via reversed chunk index_maps
plus in-kernel index mirroring — no flipped copies of the inputs exist
anywhere (cf. ``BiMambaWrapper.forward``'s x.flip(1),
`caduceus/modeling_caduceus.py:128-133`).

Backward: the recurrence's adjoint is itself a first-order reverse-time
scan. The forward kernel saves the chunk-entry states h0 (G, nc, N, d); the
backward kernel re-runs each chunk forward from its h0 (storing h and the
decay dA in scratch), then sweeps backward computing

    lam[t] = C[t] (x) g_y[t] + dA[t+1] * lam[t+1]
    g_C[t,n]   = sum_d g_y[t,d] h[t,d,n]
    g_B[t,n]   = sum_d lam[t,d,n] du[t,d]
    g_u[t,d]   = D g_y + delta * sum_n lam B
    g_delta[t] = sum_n lam*dA*A*h[t-1] + u * sum_n lam B   (then softplus chain)
    g_A, g_D, g_bias accumulated across the whole grid in scratch.

The public wrapper :func:`selective_scan_pallas` is a ``jax.custom_vjp``
using both kernels; when a gate z is fused the XLA-recompute backward is
used instead (the model gates outside the scan, so training hits the kernel
path).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from caduceus_tpu.ops.selective_scan import selective_scan

import os

_VMEM_BUDGET = int(os.environ.get("CADUCEUS_SCAN_VMEM_BUDGET", 8 * 1024 * 1024))


# ===========================================================================
# Forward kernel
# ===========================================================================

def _pick_unroll(T: int, requested: int) -> int:
    """Largest divisor of T that is <= requested AND a multiple of 8 (or 1).

    Slab starts are dynamic sublane offsets into fp32 scratch; Mosaic needs
    them provably 8-aligned, so any unroll > 1 must be a multiple of 8 —
    otherwise fall back to the safe per-position loop (U=1) instead of
    shipping a kernel Mosaic may reject or mis-lay-out.
    """
    u = max(1, min(requested, T))
    while u > 1 and (T % u != 0 or u % 8 != 0):
        u -= 1
    return u


def _pad_state_transparent(tensors, pad, delta_softplus, delta_bias):
    """Right-pad scan operands so pad steps are the identity on the state.

    Drive is zero (u = B = 0) and the decay is exp(0·A) = 1: the resolved
    delta must be 0 at pad positions. The kernel resolves delta as
    softplus(delta + bias) or (delta + bias), so the pad fill is -1e4
    (softplus(-1e4 + bias) ≈ 0) or exactly -bias per channel. ``tensors[1]``
    must be the raw delta.
    """
    out = []
    for i, t in enumerate(tensors):
        if i == 1:  # delta
            G, _, d = t.shape
            if delta_softplus:
                fill = jnp.full((G, pad, d), -1e4, t.dtype)
            elif delta_bias is not None:
                fill = jnp.broadcast_to(
                    -jnp.asarray(delta_bias, t.dtype).reshape(1, 1, d),
                    (G, pad, d))
            else:
                fill = jnp.zeros((G, pad, d), t.dtype)
            p = jnp.concatenate([t, fill], axis=1)
        else:
            p = jnp.pad(t, ((0, 0), (0, pad)) + ((0, 0),) * (t.ndim - 2))
        out.append(p)
    return out


# Slab starts are dynamic sublane offsets into fp32 scratch: Mosaic needs
# them provably 8-aligned, so unrolls must be multiples of 8.
_FWD_UNROLL = int(os.environ.get("CADUCEUS_SCAN_UNROLL", 8))
_BWD_UNROLL = int(os.environ.get("CADUCEUS_SCAN_UNROLL_BWD", 8))


def _scan_chunk_loop_multi(dirs, h0s, *, T, U):
    """Slab-unrolled in-chunk selective-scan recurrence, n directions at once.

    ``dirs`` is a list of (delta_s, du_s, bc_s, y_s, A, reverse) tuples (all
    fp32 refs/values); ``h0s`` the matching (Gb, N, d) carry values.

    Processes U positions per fori_loop iteration: the exp/broadcast/outer-
    product/output-reduction work is batched over the (Gb, U, N, d) slab
    (streaming VPU ops, no loop-carried dependency), leaving only the U
    chained 2-op FMAs `h = dA*h + v` serialized per direction. This is the
    difference between ~48 serialized VPU instructions per position
    (round-1 kernel, one position per iteration) and a handful; multiple
    directions interleave their FMA chains for extra ILP.

    Returns the tuple of final h values.
    """

    def body(i, carry):
        out = []
        for (delta_s, du_s, bc_s, y_s, A, reverse), h in zip(dirs, carry):
            t0 = pl.multiple_of((T - (i + 1) * U) if reverse else i * U, U)
            d_u = delta_s[:, pl.ds(t0, U), :]                   # (Gb, U, d)
            dA_u = jnp.exp(d_u[:, :, None, :] * A[None, None])  # (Gb, U, N, d)
            B_u = bc_s[:, 0, pl.ds(t0, U), :]                   # (Gb, U, N)
            du_u = du_s[:, pl.ds(t0, U), :]
            v_u = B_u[..., None] * du_u[:, :, None, :]          # (Gb, U, N, d)
            hs = [None] * U
            order = range(U - 1, -1, -1) if reverse else range(U)
            for j in order:
                h = dA_u[:, j] * h + v_u[:, j]
                hs[j] = h
            h_stack = jnp.stack(hs, axis=1) if U > 1 else hs[0][:, None]
            C_u = bc_s[:, 1, pl.ds(t0, U), :]
            y_s[:, pl.ds(t0, U), :] = jnp.sum(C_u[..., None] * h_stack, axis=2)
            out.append(h)
        return tuple(out)

    return jax.lax.fori_loop(0, T // U, body, tuple(h0s))


def _fwd_kernel(
    *refs,
    T: int,
    reverse: bool,
    delta_softplus: bool,
    has_z: bool,
    save_carries: bool,
):
    # inputs: u, delta, B, C, A, D, bias, h0, [z]
    # outputs: y, hN, [carries]; scratches: h, delta_s, du_s, bc_s, y_s
    n_in = 8 + int(has_z)
    ins, rest = refs[:n_in], refs[n_in:]
    if has_z:
        (u_ref, delta_ref, B_ref, C_ref, A_ref, D_ref, bias_ref, h0_ref,
         z_ref) = ins
    else:
        u_ref, delta_ref, B_ref, C_ref, A_ref, D_ref, bias_ref, h0_ref = ins
        z_ref = None
    if save_carries:
        y_ref, hN_ref, car_ref = rest[:3]
        h_scratch, delta_s, du_s, bc_s, y_s = rest[3:]
    else:
        y_ref, hN_ref = rest[:2]
        h_scratch, delta_s, du_s, bc_s, y_s = rest[2:]
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        # segmented-scan entry state (zeros for a plain scan; the previous
        # shard's boundary state under context parallelism)
        h_scratch[...] = h0_ref[...]

    if save_carries:
        car_ref[:, 0] = h_scratch[...].astype(car_ref.dtype)

    u = u_ref[...].astype(jnp.float32)          # (Gb, T, d)
    delta = delta_ref[...].astype(jnp.float32)
    delta = delta + bias_ref[0][None, None, :]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    delta_s[...] = delta
    du_s[...] = delta * u
    bc_s[:, 0] = B_ref[...].astype(jnp.float32)  # (Gb, T, N)
    bc_s[:, 1] = C_ref[...].astype(jnp.float32)
    A = A_ref[...]                               # (N, d)

    (h,) = _scan_chunk_loop_multi(
        [(delta_s, du_s, bc_s, y_s, A, reverse)], [h_scratch[...]],
        T=T, U=_pick_unroll(T, _FWD_UNROLL),
    )
    h_scratch[...] = h
    # last grid step's write survives == the scan-final state
    hN_ref[...] = h

    y = y_s[...] + D_ref[0][None, None, :] * u
    if has_z:
        z = z_ref[...].astype(jnp.float32)
        y = y * (z * jax.lax.logistic(z))
    y_ref[...] = y.astype(y_ref.dtype)


def _choose_blocks(G, T, d, N, has_z, n_big_stream):
    """Pick (Gb, T) under the VMEM budget.

    n_big_stream: count of double-buffered (Gb, T, d)-sized HBM streams plus
    fp32 (Gb, T, d) scratches, used as the sizing proxy.
    """
    Gb = min(8, G)
    while G % Gb != 0:
        Gb -= 1

    def bytes_for(gb, t):
        return gb * t * d * 4 * n_big_stream + gb * N * d * 4 * 2

    while bytes_for(Gb, T) > _VMEM_BUDGET:
        if T > 32:
            T //= 2
        elif Gb > 1:
            Gb = max(1, Gb // 2)
            while G % Gb != 0:
                Gb -= 1
        else:
            break
    return Gb, max(T, 8)


def selective_scan_pallas_fwd_impl(
    u: jnp.ndarray,      # (G, L, d)
    delta: jnp.ndarray,  # (G, L, d) raw (pre-bias, pre-softplus)
    A: jnp.ndarray,      # (d, N)
    B_mat: jnp.ndarray,  # (G, L, N)
    C: jnp.ndarray,      # (G, L, N)
    D: Optional[jnp.ndarray],
    z: Optional[jnp.ndarray],
    delta_bias: Optional[jnp.ndarray],
    delta_softplus: bool,
    reverse: bool,
    chunk_size: int = 128,
    group_block: int = 8,
    interpret: bool = False,
    save_carries: bool = False,
    h_init=None,  # (G, N, d) fp32 scan-entry state (None = zeros)
):
    G, L, d = u.shape
    N = A.shape[-1]
    has_z = z is not None
    # streams: in u/delta(/z) x2 dbuf, out y x2, scratches delta/du/y_core
    Gb, T = _choose_blocks(
        G, min(chunk_size, L), d, N, has_z, 2 * (2 + has_z) + 2 + 3
    )
    Gb = min(Gb, group_block) if group_block else Gb
    while G % Gb != 0:
        Gb -= 1

    tensors = [u, delta, B_mat, C] + ([z] if has_z else [])
    if L % T != 0:
        # state-transparent padding: h_init flows unchanged through pad steps
        # (reverse scans process them first) and the emitted final state
        # equals the true one.
        tensors = _pad_state_transparent(
            tensors, T - L % T, delta_softplus, delta_bias)
    Lp = tensors[0].shape[1]
    nc = Lp // T

    A_T = jnp.asarray(A, jnp.float32).T.reshape(N, d)
    D_in = (jnp.zeros((1, d), jnp.float32) if D is None
            else jnp.asarray(D, jnp.float32).reshape(1, d))
    bias_in = (jnp.zeros((1, d), jnp.float32) if delta_bias is None
               else jnp.asarray(delta_bias, jnp.float32).reshape(1, d))
    h0_in = (jnp.zeros((G, N, d), jnp.float32) if h_init is None
             else jnp.asarray(h_init, jnp.float32).reshape(G, N, d))

    if reverse:
        cmap = lambda g, i: (g, nc - 1 - i, 0)
    else:
        cmap = lambda g, i: (g, i, 0)
    full = lambda g, i: (0, 0)
    gmap = lambda g, i: (g, 0, 0)

    gd_spec = pl.BlockSpec((Gb, T, d), cmap, memory_space=pltpu.VMEM)
    gn_spec = pl.BlockSpec((Gb, T, N), cmap, memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((Gb, N, d), gmap, memory_space=pltpu.VMEM)

    in_specs = [
        gd_spec, gd_spec, gn_spec, gn_spec,
        pl.BlockSpec((N, d), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        state_spec,
    ]
    inputs = tensors[:4] + [A_T, D_in, bias_in, h0_in]
    if has_z:
        in_specs.append(gd_spec)
        inputs.append(tensors[4])

    out_shape = [
        jax.ShapeDtypeStruct((G, Lp, d), u.dtype),
        jax.ShapeDtypeStruct((G, N, d), jnp.float32),  # final state
    ]
    out_specs = [gd_spec, state_spec]
    if save_carries:
        # chunk-entry states; scan-order chunk i lives at slot i
        car_map = (lambda g, i: (g, i, 0, 0))
        # bf16 carries: halves HBM (537MB at 131k) at the same precision
        # class as the bwd kernel's bf16 h-storage
        out_shape.append(jax.ShapeDtypeStruct((G, nc, N, d), jnp.bfloat16))
        out_specs.append(
            pl.BlockSpec((Gb, 1, N, d), car_map, memory_space=pltpu.VMEM)
        )

    kernel = functools.partial(
        _fwd_kernel, T=T, reverse=reverse,
        delta_softplus=delta_softplus, has_z=has_z, save_carries=save_carries,
    )
    out = pl.pallas_call(
        kernel,
        grid=(G // Gb, nc),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((Gb, N, d), jnp.float32),     # h carry
            pltpu.VMEM((Gb, T, d), jnp.float32),     # resolved delta
            pltpu.VMEM((Gb, T, d), jnp.float32),     # delta * u
            pltpu.VMEM((Gb, 2, T, N), jnp.float32),  # B and C upcast
            pltpu.VMEM((Gb, T, d), jnp.float32),     # y core (pre-epilogue)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    if save_carries:
        y, hN, carries = out
        return y[:, :L], hN, carries, T
    y, hN = out
    return y[:, :L], hN


# ===========================================================================
# Backward kernel
# ===========================================================================

def _bwd_recompute_loop_multi(dirs, h0s, *, T, U):
    """Phase 1 of the backward pass: slab-unrolled forward recompute of h
    and dA over the chunk, for n directions at once.

    ``dirs``: list of (delta_s, du_s, bc_s, h_s, dA_s, A, reverse); h_s and
    dA_s are bf16 (Gb, T, N, d) stores, the rest fp32.
    """

    def body(i, carry):
        out = []
        for (delta_s, du_s, bc_s, h_s, dA_s, A, reverse), h in zip(dirs, carry):
            t0 = pl.multiple_of((T - (i + 1) * U) if reverse else i * U, U)
            d_u = delta_s[:, pl.ds(t0, U), :]
            dA_u = jnp.exp(d_u[:, :, None, :] * A[None, None])
            B_u = bc_s[:, 0, pl.ds(t0, U), :]
            du_u = du_s[:, pl.ds(t0, U), :]
            v_u = B_u[..., None] * du_u[:, :, None, :]
            hs = [None] * U
            order = range(U - 1, -1, -1) if reverse else range(U)
            for j in order:
                h = dA_u[:, j] * h + v_u[:, j]
                hs[j] = h
            h_stack = jnp.stack(hs, axis=1) if U > 1 else hs[0][:, None]
            h_s[:, pl.ds(t0, U)] = h_stack.astype(h_s.dtype)
            dA_s[:, pl.ds(t0, U)] = dA_u.astype(dA_s.dtype)
            out.append(h)
        return tuple(out)

    return jax.lax.fori_loop(0, T // U, body, tuple(h0s))


def _bwd_adjoint_loop_multi(dirs, lam0s, gA0s, *, T, U):
    """Phase 2 of the backward pass: slab-unrolled reverse (in scan time)
    adjoint sweep, for n directions at once.

    ``dirs``: list of (delta_s, du_s, bc_s, gy_s, h_s, dA_s, gu_s, gdelta_s,
    gbc_s, A, h0, reverse). Only the 2-op lam chain is serialized; all
    gradient contractions batch over the (Gb, U, N, d) slab. Returns the
    list of (lam, gA_acc) finals.
    """

    n = len(dirs)

    def body(i, carry):
        out = []
        for k in range(n):
            (delta_s, du_s, bc_s, gy_s, h_s, dA_s, gu_s, gdelta_s, gbc_s,
             A, h0, reverse) = dirs[k]
            lam, gA_acc = carry[2 * k], carry[2 * k + 1]
            # slab covering scan-order positions [T-(i+1)U, T-iU)
            t0 = pl.multiple_of(i * U if reverse else T - (i + 1) * U, U)
            gy_u = gy_s[:, pl.ds(t0, U), :]                    # (Gb, U, d)
            C_u = bc_s[:, 1, pl.ds(t0, U), :]                  # (Gb, U, N)
            Cgy_u = C_u[..., None] * gy_u[:, :, None, :]       # (Gb, U, N, d)
            dA_u = dA_s[:, pl.ds(t0, U)].astype(jnp.float32)
            lam_incs = [None] * U
            # scan-backward order expressed in array coordinates
            order = range(U) if reverse else range(U - 1, -1, -1)
            for j in order:
                lam_inc = lam + Cgy_u[:, j]
                lam_incs[j] = lam_inc
                lam = dA_u[:, j] * lam_inc
            lam_stack = (jnp.stack(lam_incs, axis=1) if U > 1
                         else lam_incs[0][:, None])
            h_u = h_s[:, pl.ds(t0, U)].astype(jnp.float32)
            # h_prev in scan order: array t-1 (forward) / t+1 (reverse);
            # the chunk-entry state h0 feeds the scan-first position.
            if reverse:
                hb_t = jnp.minimum(t0 + U, T - 1)
                hb_mem = h_s[:, pl.ds(hb_t, 1)][:, 0].astype(jnp.float32)
                hb = jnp.where(t0 + U == T, h0, hb_mem)
                # U=1: no in-slab neighbors — avoid zero-size concat
                # operands, which Mosaic rejects ("positive constant sizes")
                h_prev_u = (hb[:, None] if U == 1 else
                            jnp.concatenate([h_u[:, 1:], hb[:, None]],
                                            axis=1))
            else:
                hb_t = jnp.maximum(t0 - 1, 0)
                hb_mem = h_s[:, pl.ds(hb_t, 1)][:, 0].astype(jnp.float32)
                hb = jnp.where(t0 == 0, h0, hb_mem)
                h_prev_u = (hb[:, None] if U == 1 else
                            jnp.concatenate([hb[:, None], h_u[:, : U - 1]],
                                            axis=1))
            B_u = bc_s[:, 0, pl.ds(t0, U), :]
            du_u = du_s[:, pl.ds(t0, U), :]
            d_u = delta_s[:, pl.ds(t0, U), :]
            gC_u = jnp.sum(h_u * gy_u[:, :, None, :], axis=3)        # (Gb,U,N)
            gB_u = jnp.sum(lam_stack * du_u[:, :, None, :], axis=3)  # (Gb,U,N)
            g_du_u = jnp.sum(lam_stack * B_u[..., None], axis=2)     # (Gb,U,d)
            lam_h_u = lam_stack * dA_u * h_prev_u                    # (Gb,U,N,d)
            g_dd_u = jnp.sum(lam_h_u * A[None, None], axis=2)        # (Gb,U,d)
            gu_s[:, pl.ds(t0, U), :] = g_du_u
            gdelta_s[:, pl.ds(t0, U), :] = g_dd_u
            gbc_s[:, 0, pl.ds(t0, U), :] = gB_u
            gbc_s[:, 1, pl.ds(t0, U), :] = gC_u
            gA_acc = gA_acc + jnp.sum(lam_h_u * d_u[:, :, None, :],
                                      axis=(0, 1))
            out.extend([lam, gA_acc])
        return tuple(out)

    flat = []
    for lam, gA in zip(lam0s, gA0s):
        flat.extend([lam, gA])
    res = jax.lax.fori_loop(0, T // U, body, tuple(flat))
    return [(res[2 * k], res[2 * k + 1]) for k in range(n)]

def _bwd_kernel(
    u_ref, delta_ref, B_ref, C_ref, A_ref, D_ref, bias_ref, gy_ref, car_ref,
    ghN_ref,
    gu_ref, gdelta_ref, gB_ref, gC_ref, gA_ref, gD_ref, gbias_ref, gh0_ref,
    lam_s, h_s, dA_s, delta_s, du_s, bc_s, u_s, gy_s, gu_s, gdelta_s, gbc_s,
    acc_s,
    *,
    T: int,
    reverse: bool,
    delta_softplus: bool,
):
    gi = pl.program_id(0)
    ci = pl.program_id(1)

    @pl.when(jnp.logical_and(gi == 0, ci == 0))
    def _():
        acc_s[...] = jnp.zeros_like(acc_s)  # (2+N, d): [g_D; g_bias; g_A]

    @pl.when(ci == 0)
    def _():
        # adjoint carry init = cotangent of the scan-final state (zeros for
        # a plain scan; the downstream shard's gh0 under segmented chaining)
        lam_s[...] = ghN_ref[...]

    A = A_ref[...]  # (N, d)
    h0 = car_ref[:, 0].astype(jnp.float32)  # (Gb, N, d) — chunk-entry state

    # ---- phase 0: chunk-wide upcasts ----
    u = u_ref[...].astype(jnp.float32)
    u_s[...] = u
    delta = delta_ref[...].astype(jnp.float32) + bias_ref[0][None, None, :]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    delta_s[...] = delta
    du_s[...] = delta * u
    bc_s[:, 0] = B_ref[...].astype(jnp.float32)
    bc_s[:, 1] = C_ref[...].astype(jnp.float32)
    gy_s[...] = gy_ref[...].astype(jnp.float32)

    # ---- phase 1: forward recompute of h and dA over the chunk ----
    U = _pick_unroll(T, _BWD_UNROLL)
    _bwd_recompute_loop_multi(
        [(delta_s, du_s, bc_s, h_s, dA_s, A, reverse)], [h0], T=T, U=U,
    )

    # ---- phase 2: reverse sweep — only what truly needs the time loop.
    # Everything position-local (softplus chain, D-term of g_u, the g_delta
    # du-part, accumulator reductions) is hoisted to chunk-wide epilogue
    # vector ops; the slab loop stages the lam-dependent raw pieces:
    #   gdelta_s[t] <- sum_n lam*dA*A*h[t-1]   (decay part, pre-chain)
    #   gu_s[t]     <- sum_n lam*B             (g_du; epilogue builds g_u/g_delta)
    #   gbc_s       <- g_B, g_C
    #   gA via per-slab accumulate (needs lam ⊗ h[t-1] ⊗ delta)
    [(lam, gA_acc)] = _bwd_adjoint_loop_multi(
        [(delta_s, du_s, bc_s, gy_s, h_s, dA_s, gu_s, gdelta_s, gbc_s,
          A, h0, reverse)],
        [lam_s[...]], [jnp.zeros_like(acc_s[2:])], T=T, U=U,
    )
    lam_s[...] = lam
    # after the last grid step (scan-order chunk 0) this is dL/dh_init
    gh0_ref[...] = lam

    # ---- epilogue: chunk-wide vector ops over (Gb, T, d) ----
    gy = gy_s[...]
    u_all = u_s[...]
    delta_all = delta_s[...]
    g_du_all = gu_s[...]                      # staged sum_n lam*B
    g_delta = gdelta_s[...] + u_all * g_du_all
    if delta_softplus:
        # d softplus(x)/dx = sigmoid(x) = 1 - exp(-softplus(x))
        g_delta = g_delta * (1.0 - jnp.exp(-delta_all))
    g_u = D_ref[0][None, None, :] * gy + delta_all * g_du_all

    acc_s[0] = acc_s[0] + jnp.sum(gy * u_all, axis=(0, 1))        # g_D
    acc_s[1] = acc_s[1] + jnp.sum(g_delta, axis=(0, 1))           # g_bias
    acc_s[2:] = acc_s[2:] + gA_acc

    gu_ref[...] = g_u.astype(gu_ref.dtype)
    gdelta_ref[...] = g_delta.astype(gdelta_ref.dtype)
    gB_ref[...] = gbc_s[:, 0].astype(gB_ref.dtype)
    gC_ref[...] = gbc_s[:, 1].astype(gC_ref.dtype)
    # global accumulators (last write wins; scratch is monotone)
    gD_ref[...] = acc_s[0:1]
    gbias_ref[...] = acc_s[1:2]
    gA_ref[...] = acc_s[2:]


def selective_scan_pallas_bwd_impl(
    u, delta, A, B_mat, C, D, delta_bias, g_y, carries,
    delta_softplus: bool,
    reverse: bool,
    T: int,
    interpret: bool = False,
    g_hN=None,  # (G, N, d) cotangent of the scan-final state
):
    """Returns (g_u, g_delta, g_A, g_B, g_C, g_D, g_bias, g_h0)."""
    G, L, d = u.shape
    N = A.shape[-1]
    nc = carries.shape[1]
    Lp = nc * T

    tensors = [u, delta, B_mat, C, g_y]
    if L % T != 0:
        # state-transparent padding (see fwd impl): identity decay + zero
        # drive so the lam carry passes pad steps unchanged
        tensors = _pad_state_transparent(
            tensors, Lp - L, delta_softplus, delta_bias)
    u_p, delta_p, B_p, C_p, gy_p = tensors
    ghN_in = (jnp.zeros((G, N, d), jnp.float32) if g_hN is None
              else jnp.asarray(g_hN, jnp.float32).reshape(G, N, d))

    # bwd scratch: h_s + dA_s dominate (bf16, (Gb, T, N, d))
    Gb = min(8, G)
    while G % Gb != 0:
        Gb -= 1

    def bwd_bytes(gb):
        big = gb * T * d * 4
        hda = gb * T * N * d * 2 * 2
        return big * (2 * 4 + 2 * 2 + 6) + hda + 3 * gb * N * d * 4

    while bwd_bytes(Gb) > max(_VMEM_BUDGET, 10 * 1024 * 1024) and Gb > 1:
        Gb = max(1, Gb // 2)
        while G % Gb != 0:
            Gb -= 1

    A_T = jnp.asarray(A, jnp.float32).T.reshape(N, d)
    D_in = (jnp.zeros((1, d), jnp.float32) if D is None
            else jnp.asarray(D, jnp.float32).reshape(1, d))
    bias_in = (jnp.zeros((1, d), jnp.float32) if delta_bias is None
               else jnp.asarray(delta_bias, jnp.float32).reshape(1, d))

    # grid index i processes scan-order chunk j = nc-1-i (adjoint runs
    # backward in scan time); array-position block = j for forward scans and
    # nc-1-j (= i) for reverse scans.
    if reverse:
        cmap = lambda g, i: (g, i, 0)
        car_map = lambda g, i: (g, nc - 1 - i, 0, 0)
    else:
        cmap = lambda g, i: (g, nc - 1 - i, 0)
        car_map = lambda g, i: (g, nc - 1 - i, 0, 0)
    full = lambda g, i: (0, 0)

    gd_spec = pl.BlockSpec((Gb, T, d), cmap, memory_space=pltpu.VMEM)
    gn_spec = pl.BlockSpec((Gb, T, N), cmap, memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((Gb, N, d), lambda g, i: (g, 0, 0),
                              memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _bwd_kernel, T=T, reverse=reverse, delta_softplus=delta_softplus,
    )
    outs = pl.pallas_call(
        kernel,
        grid=(G // Gb, nc),
        in_specs=[
            gd_spec,  # u
            gd_spec,  # delta
            gn_spec,  # B
            gn_spec,  # C
            pl.BlockSpec((N, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            gd_spec,  # g_y
            pl.BlockSpec((Gb, 1, N, d), car_map, memory_space=pltpu.VMEM),
            state_spec,  # g_hN
        ],
        out_specs=(
            gd_spec,  # g_u
            gd_spec,  # g_delta
            gn_spec,  # g_B
            gn_spec,  # g_C
            pl.BlockSpec((N, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
            state_spec,  # g_h0
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lp, d), u.dtype),
            jax.ShapeDtypeStruct((G, Lp, d), delta.dtype),
            jax.ShapeDtypeStruct((G, Lp, N), B_mat.dtype),
            jax.ShapeDtypeStruct((G, Lp, N), C.dtype),
            jax.ShapeDtypeStruct((N, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((G, N, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Gb, N, d), jnp.float32),        # lam carry
            pltpu.VMEM((Gb, T, N, d), jnp.bfloat16),    # h per step
            pltpu.VMEM((Gb, T, N, d), jnp.bfloat16),    # dA per step
            pltpu.VMEM((Gb, T, d), jnp.float32),        # resolved delta
            pltpu.VMEM((Gb, T, d), jnp.float32),        # du
            pltpu.VMEM((Gb, 2, T, N), jnp.float32),     # B, C
            pltpu.VMEM((Gb, T, d), jnp.float32),        # u fp32
            pltpu.VMEM((Gb, T, d), jnp.float32),        # g_y fp32
            pltpu.VMEM((Gb, T, d), jnp.float32),        # g_u staging
            pltpu.VMEM((Gb, T, d), jnp.float32),        # g_delta staging
            pltpu.VMEM((Gb, 2, T, N), jnp.float32),     # g_B, g_C staging
            pltpu.VMEM((2 + N, d), jnp.float32),        # [g_D; g_bias; g_A]
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(u_p, delta_p, B_p, C_p, A_T, D_in, bias_in, gy_p, carries, ghN_in)
    g_u, g_delta, g_B, g_C, g_A_T, g_D, g_bias, g_h0 = outs
    g_bias = g_bias[0]
    if Lp != L and not delta_softplus:
        # Without the softplus chain, pad steps have identity decay but a
        # nonzero delta-gradient (lam·A·h), which the in-kernel g_bias
        # reduction would pick up; rebuild g_bias from the real positions
        # (g_bias ≡ Σ_{G,L} g_delta since d(delta_eff)/d(bias) = 1).
        g_bias = jnp.sum(g_delta[:, :L].astype(jnp.float32), axis=(0, 1))
    return (
        g_u[:, :L],
        g_delta[:, :L],
        g_A_T.T.astype(A.dtype),
        g_B[:, :L],
        g_C[:, :L],
        g_D[0],
        g_bias,
        g_h0,
    )


# ===========================================================================
# custom_vjp wrapper
# ===========================================================================

@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11)
)
def selective_scan_pallas(
    u, delta, A, B_mat, C, D, z,
    delta_softplus: bool = False,
    reverse: bool = False,
    chunk_size: int = 128,
    group_block: int = 8,
    interpret: bool = False,
    delta_bias=None,
):
    y, _ = selective_scan_pallas_fwd_impl(
        u, delta, A, B_mat, C, D, z, delta_bias,
        delta_softplus, reverse, chunk_size, group_block, interpret,
        save_carries=False,
    )
    return y


def _fwd(u, delta, A, B_mat, C, D, z,
         delta_softplus, reverse, chunk_size, group_block, interpret,
         delta_bias=None):
    if z is None:
        y, _, carries, T = selective_scan_pallas_fwd_impl(
            u, delta, A, B_mat, C, D, None, delta_bias,
            delta_softplus, reverse, chunk_size, group_block, interpret,
            save_carries=True,
        )
        return y, (u, delta, A, B_mat, C, D, z, delta_bias, carries, T)
    y, _ = selective_scan_pallas_fwd_impl(
        u, delta, A, B_mat, C, D, z, delta_bias,
        delta_softplus, reverse, chunk_size, group_block, interpret,
        save_carries=False,
    )
    return y, (u, delta, A, B_mat, C, D, z, delta_bias, None, 0)


def _bwd(delta_softplus, reverse, chunk_size, group_block, interpret,
         residuals, g):
    u, delta, A, B_mat, C, D, z, delta_bias, carries, T = residuals

    if carries is not None:
        (g_u, g_delta, g_A, g_B, g_C, g_D, g_bias,
         _) = selective_scan_pallas_bwd_impl(
            u, delta, A, B_mat, C, D, delta_bias, g.astype(u.dtype), carries,
            delta_softplus, reverse, T, interpret,
        )
        if D is None:
            g_D = None
        else:
            g_D = g_D.astype(jnp.asarray(D).dtype).reshape(jnp.shape(D))
        if delta_bias is None:
            g_bias = None
        else:
            g_bias = g_bias.astype(jnp.asarray(delta_bias).dtype).reshape(
                jnp.shape(delta_bias)
            )
        return (g_u.astype(u.dtype), g_delta.astype(delta.dtype), g_A,
                g_B.astype(B_mat.dtype), g_C.astype(C.dtype), g_D, None,
                g_bias)

    # gated path: recompute via the XLA scan
    def ref_fn(u, delta, A, B_mat, C, D, z, delta_bias):
        return selective_scan(
            u, delta, A, B_mat, C, D=D, z=z, delta_bias=delta_bias,
            delta_softplus=delta_softplus, reverse=reverse,
            chunk_size=max(chunk_size, 128),
        )

    out, vjp = jax.vjp(ref_fn, u, delta, A, B_mat, C, D, z, delta_bias)
    du, ddelta, dA, dB, dC, dD, dz, dbias = vjp(g.astype(out.dtype))
    if D is None:
        dD = None
    if z is None:
        dz = None
    if delta_bias is None:
        dbias = None
    return du, ddelta, dA, dB, dC, dD, dz, dbias


selective_scan_pallas.defvjp(_fwd, _bwd)


# ===========================================================================
# Segmented/chained variant: explicit entry state in, final state out.
#
# This is the kernel-speed building block for context parallelism
# (`parallel/seq_scan.py` local scans) and chunked streaming prefill: the
# VJP consumes the downstream cotangent g_hN as the adjoint-carry init and
# emits dL/dh_init (the final λ), so shard-boundary chaining is exact.
# ===========================================================================

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def selective_scan_pallas_chained(
    u, delta, A, B_mat, C, D, delta_bias, h_init,
    delta_softplus: bool = True,
    reverse: bool = False,
    chunk_size: int = 128,
    group_block: int = 8,
    interpret: bool = False,
):
    """Returns (y, h_final); h_init/h_final are (G, N, d) fp32."""
    return selective_scan_pallas_fwd_impl(
        u, delta, A, B_mat, C, D, None, delta_bias,
        delta_softplus, reverse, chunk_size, group_block, interpret,
        save_carries=False, h_init=h_init,
    )


def _chained_fwd(u, delta, A, B_mat, C, D, delta_bias, h_init,
                 delta_softplus, reverse, chunk_size, group_block, interpret):
    y, hN, carries, T = selective_scan_pallas_fwd_impl(
        u, delta, A, B_mat, C, D, None, delta_bias,
        delta_softplus, reverse, chunk_size, group_block, interpret,
        save_carries=True, h_init=h_init,
    )
    return (y, hN), (u, delta, A, B_mat, C, D, delta_bias, carries, T)


def _chained_bwd(delta_softplus, reverse, chunk_size, group_block, interpret,
                 residuals, g):
    u, delta, A, B_mat, C, D, delta_bias, carries, T = residuals
    g_y, g_hN = g
    (g_u, g_delta, g_A, g_B, g_C, g_D, g_bias,
     g_h0) = selective_scan_pallas_bwd_impl(
        u, delta, A, B_mat, C, D, delta_bias, g_y.astype(u.dtype), carries,
        delta_softplus, reverse, T, interpret, g_hN=g_hN,
    )
    if D is None:
        g_D = None
    else:
        g_D = g_D.astype(jnp.asarray(D).dtype).reshape(jnp.shape(D))
    if delta_bias is None:
        g_bias = None
    else:
        g_bias = g_bias.astype(jnp.asarray(delta_bias).dtype).reshape(
            jnp.shape(delta_bias)
        )
    return (g_u.astype(u.dtype), g_delta.astype(delta.dtype), g_A,
            g_B.astype(B_mat.dtype), g_C.astype(C.dtype), g_D, g_bias, g_h0)


selective_scan_pallas_chained.defvjp(_chained_fwd, _chained_bwd)
