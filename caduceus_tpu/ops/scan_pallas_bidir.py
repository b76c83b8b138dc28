"""Paired bidirectional selective-scan Pallas kernels.

BiMamba runs one forward-direction and one reverse-direction scan per layer
(`caduceus/modeling_caduceus.py:122-140`). Running them as separate kernels
leaves the VPU at half width when G is small (the 131k-seqlen training
regime has G = 2·microbatch = 4 rows). These kernels process BOTH directions
in one grid: the fwd direction walks chunks left→right while the rev
direction walks right→left (separate index maps on its operands), each with
its own VMEM state and its own (A, D, dt_bias) parameters — per-step vector
width doubles, grid overhead halves.

Numerics and semantics are identical to running `scan_pallas` twice; the
custom_vjp pairs the per-direction backward kernels.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from caduceus_tpu.ops.scan_pallas import (
    _BWD_UNROLL,
    _FWD_UNROLL,
    _VMEM_BUDGET,
    _bwd_adjoint_loop_multi,
    _bwd_recompute_loop_multi,
    _pick_unroll,
    _scan_chunk_loop_multi,
)


def _bidir_fwd_kernel(
    # fwd-direction operands, then rev-direction operands, then stacked params
    uf_ref, df_ref, Bf_ref, Cf_ref,
    ur_ref, dr_ref, Br_ref, Cr_ref,
    A2_ref,    # (2, N, d) fp32 — [fwd; rev], pre-transposed
    D2_ref,    # (2, d)
    bias2_ref, # (2, d)
    yf_ref, yr_ref, carf_ref, carr_ref,
    hf_s, hr_s, df_s, duf_s, dr_s, dur_s, bcf_s, bcr_s, yf_s, yr_s,
    *,
    T: int,
    delta_softplus: bool,
    save_carries: bool,
):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        hf_s[...] = jnp.zeros_like(hf_s)
        hr_s[...] = jnp.zeros_like(hr_s)

    if save_carries:
        carf_ref[:, 0] = hf_s[...].astype(carf_ref.dtype)
        carr_ref[:, 0] = hr_s[...].astype(carr_ref.dtype)

    Af = A2_ref[0]
    Ar = A2_ref[1]

    def precompute(u_ref_, d_ref_, B_ref_, C_ref_, d_s_, du_s_, bc_s_, bias_row):
        u = u_ref_[...].astype(jnp.float32)
        delta = d_ref_[...].astype(jnp.float32) + bias2_ref[bias_row][None, None, :]
        if delta_softplus:
            delta = jax.nn.softplus(delta)
        d_s_[...] = delta
        du_s_[...] = delta * u
        bc_s_[:, 0] = B_ref_[...].astype(jnp.float32)
        bc_s_[:, 1] = C_ref_[...].astype(jnp.float32)
        return u

    uf = precompute(uf_ref, df_ref, Bf_ref, Cf_ref, df_s, duf_s, bcf_s, 0)
    ur = precompute(ur_ref, dr_ref, Br_ref, Cr_ref, dr_s, dur_s, bcr_s, 1)

    hf, hr = _scan_chunk_loop_multi(
        [
            (df_s, duf_s, bcf_s, yf_s, Af, False),
            (dr_s, dur_s, bcr_s, yr_s, Ar, True),
        ],
        [hf_s[...], hr_s[...]],
        T=T, U=_pick_unroll(T, _FWD_UNROLL),
    )
    hf_s[...] = hf
    hr_s[...] = hr

    yf_ref[...] = (yf_s[...] + D2_ref[0][None, None, :] * uf).astype(yf_ref.dtype)
    yr_ref[...] = (yr_s[...] + D2_ref[1][None, None, :] * ur).astype(yr_ref.dtype)


def bidir_scan_fwd_impl(
    uf, df, Bf, Cf,       # forward-direction scan operands (G, L, ·)
    ur, dr, Br, Cr,       # reverse-direction scan operands
    Af, Ar, Df, Dr, biasf, biasr,
    delta_softplus: bool,
    chunk_size: int = 128,
    group_block: int = 8,
    interpret: bool = False,
    save_carries: bool = False,
):
    G, L, d = uf.shape
    N = Af.shape[-1]
    T = min(chunk_size, L)

    # sizing: 2 directions double every stream and scratch
    def vmem_bytes(gb, t):
        per = gb * t * d * 4
        return 2 * (per * (2 * 2 + 2 + 3) + gb * N * d * 4 + gb * 2 * t * N * 4)

    Gb = min(group_block, G)
    while G % Gb != 0:
        Gb -= 1
    while vmem_bytes(Gb, T) > _VMEM_BUDGET:
        if T > 32:
            T //= 2
        elif Gb > 1:
            Gb = max(1, Gb // 2)
            while G % Gb != 0:
                Gb -= 1
        else:
            break
    T = max(T, 8)

    tensors = [uf, df, Bf, Cf, ur, dr, Br, Cr]
    if L % T != 0:
        pad = T - L % T
        dpad = -1e4 if delta_softplus else 0.0
        out = []
        for i, t in enumerate(tensors):
            cval = dpad if i in (1, 5) else 0.0
            out.append(jnp.pad(t, ((0, 0), (0, pad)) + ((0, 0),) * (t.ndim - 2),
                               constant_values=cval))
        tensors = out
    Lp = tensors[0].shape[1]
    nc = Lp // T

    A2 = jnp.stack([
        jnp.asarray(Af, jnp.float32).T.reshape(N, d),
        jnp.asarray(Ar, jnp.float32).T.reshape(N, d),
    ])
    z1 = jnp.zeros((d,), jnp.float32)
    D2 = jnp.stack([
        z1 if Df is None else jnp.asarray(Df, jnp.float32).reshape(d),
        z1 if Dr is None else jnp.asarray(Dr, jnp.float32).reshape(d),
    ])
    bias2 = jnp.stack([
        z1 if biasf is None else jnp.asarray(biasf, jnp.float32).reshape(d),
        z1 if biasr is None else jnp.asarray(biasr, jnp.float32).reshape(d),
    ])

    fmap = lambda g, i: (g, i, 0)
    rmap = lambda g, i: (g, nc - 1 - i, 0)
    full2 = lambda g, i: (0, 0, 0)
    full = lambda g, i: (0, 0)
    gd_f = pl.BlockSpec((Gb, T, d), fmap, memory_space=pltpu.VMEM)
    gn_f = pl.BlockSpec((Gb, T, N), fmap, memory_space=pltpu.VMEM)
    gd_r = pl.BlockSpec((Gb, T, d), rmap, memory_space=pltpu.VMEM)
    gn_r = pl.BlockSpec((Gb, T, N), rmap, memory_space=pltpu.VMEM)
    car_spec = pl.BlockSpec((Gb, 1, N, d), lambda g, i: (g, i, 0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _bidir_fwd_kernel, T=T, delta_softplus=delta_softplus,
        save_carries=save_carries,
    )
    yf, yr, carf, carr = pl.pallas_call(
        kernel,
        grid=(G // Gb, nc),
        in_specs=[
            gd_f, gd_f, gn_f, gn_f,
            gd_r, gd_r, gn_r, gn_r,
            pl.BlockSpec((2, N, d), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(gd_f, gd_r, car_spec, car_spec),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lp, d), uf.dtype),
            jax.ShapeDtypeStruct((G, Lp, d), ur.dtype),
            jax.ShapeDtypeStruct((G, nc, N, d), jnp.bfloat16),
            jax.ShapeDtypeStruct((G, nc, N, d), jnp.bfloat16),
        ),
        scratch_shapes=[
            pltpu.VMEM((Gb, N, d), jnp.float32),     # hf
            pltpu.VMEM((Gb, N, d), jnp.float32),     # hr
            pltpu.VMEM((Gb, T, d), jnp.float32),     # delta f
            pltpu.VMEM((Gb, T, d), jnp.float32),     # du f
            pltpu.VMEM((Gb, T, d), jnp.float32),     # delta r
            pltpu.VMEM((Gb, T, d), jnp.float32),     # du r
            pltpu.VMEM((Gb, 2, T, N), jnp.float32),  # B,C f
            pltpu.VMEM((Gb, 2, T, N), jnp.float32),  # B,C r
            pltpu.VMEM((Gb, T, d), jnp.float32),     # y f
            pltpu.VMEM((Gb, T, d), jnp.float32),     # y r
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*tensors, A2, D2, bias2)
    return yf[:, :L], yr[:, :L], carf, carr, T


# ===========================================================================
# Paired backward kernel
# ===========================================================================

def _bidir_bwd_kernel(
    uf_ref, df_ref, Bf_ref, Cf_ref,
    ur_ref, dr_ref, Br_ref, Cr_ref,
    A2_ref, D2_ref, bias2_ref,
    gyf_ref, gyr_ref, carf_ref, carr_ref,
    guf_ref, gdf_ref, gBf_ref, gCf_ref,
    gur_ref, gdr_ref, gBr_ref, gCr_ref,
    gA2_ref, gD2_ref, gbias2_ref,
    lamf_s, lamr_s, hf_s, hr_s, dAf_s, dAr_s,
    deltaf_s, deltar_s, duf_s, dur_s, bcf_s, bcr_s,
    uf_s, ur_s, gyf_s, gyr_s, guf_s, gur_s, gdf_s, gdr_s, gbcf_s, gbcr_s,
    accf_s, accr_s,
    *,
    T: int,
    delta_softplus: bool,
):
    gi = pl.program_id(0)
    ci = pl.program_id(1)

    @pl.when(jnp.logical_and(gi == 0, ci == 0))
    def _():
        accf_s[...] = jnp.zeros_like(accf_s)
        accr_s[...] = jnp.zeros_like(accr_s)

    @pl.when(ci == 0)
    def _():
        lamf_s[...] = jnp.zeros_like(lamf_s)
        lamr_s[...] = jnp.zeros_like(lamr_s)

    Af = A2_ref[0]
    Ar = A2_ref[1]
    h0f = carf_ref[:, 0].astype(jnp.float32)
    h0r = carr_ref[:, 0].astype(jnp.float32)

    # ---- phase 0: chunk-wide upcasts for both directions ----
    def pre(u_ref_, d_ref_, B_ref_, C_ref_, gy_ref_, u_s_, d_s_, du_s_,
            bc_s_, gy_s_, bias_row):
        u = u_ref_[...].astype(jnp.float32)
        u_s_[...] = u
        delta = d_ref_[...].astype(jnp.float32) + bias2_ref[bias_row][None, None, :]
        if delta_softplus:
            delta = jax.nn.softplus(delta)
        d_s_[...] = delta
        du_s_[...] = delta * u
        bc_s_[:, 0] = B_ref_[...].astype(jnp.float32)
        bc_s_[:, 1] = C_ref_[...].astype(jnp.float32)
        gy_s_[...] = gy_ref_[...].astype(jnp.float32)

    pre(uf_ref, df_ref, Bf_ref, Cf_ref, gyf_ref, uf_s, deltaf_s, duf_s,
        bcf_s, gyf_s, 0)
    pre(ur_ref, dr_ref, Br_ref, Cr_ref, gyr_ref, ur_s, deltar_s, dur_s,
        bcr_s, gyr_s, 1)

    # ---- phase 1: forward recompute of h and dA, both directions ----
    U = _pick_unroll(T, _BWD_UNROLL)
    _bwd_recompute_loop_multi(
        [
            (deltaf_s, duf_s, bcf_s, hf_s, dAf_s, Af, False),
            (deltar_s, dur_s, bcr_s, hr_s, dAr_s, Ar, True),
        ],
        [h0f, h0r], T=T, U=U,
    )

    # ---- phase 2: reverse sweep, both directions interleaved ----
    [(lamf, gAf_acc), (lamr, gAr_acc)] = _bwd_adjoint_loop_multi(
        [
            (deltaf_s, duf_s, bcf_s, gyf_s, hf_s, dAf_s, guf_s, gdf_s,
             gbcf_s, Af, h0f, False),
            (deltar_s, dur_s, bcr_s, gyr_s, hr_s, dAr_s, gur_s, gdr_s,
             gbcr_s, Ar, h0r, True),
        ],
        [lamf_s[...], lamr_s[...]],
        [jnp.zeros_like(accf_s[2:]), jnp.zeros_like(accr_s[2:])],
        T=T, U=U,
    )
    lamf_s[...] = lamf
    lamr_s[...] = lamr

    # ---- epilogue per direction ----
    def epi(gy_s_, u_s_, d_s_, gu_s_, gd_s_, gbc_s_, acc_s_, gA_acc,
            gu_ref_, gd_ref_, gB_ref_, gC_ref_, d_row):
        gy = gy_s_[...]
        u_all = u_s_[...]
        delta_all = d_s_[...]
        g_du_all = gu_s_[...]
        g_delta = gd_s_[...] + u_all * g_du_all
        if delta_softplus:
            g_delta = g_delta * (1.0 - jnp.exp(-delta_all))
        g_u = D2_ref[d_row][None, None, :] * gy + delta_all * g_du_all
        acc_s_[0] = acc_s_[0] + jnp.sum(gy * u_all, axis=(0, 1))
        acc_s_[1] = acc_s_[1] + jnp.sum(g_delta, axis=(0, 1))
        acc_s_[2:] = acc_s_[2:] + gA_acc
        gu_ref_[...] = g_u.astype(gu_ref_.dtype)
        gd_ref_[...] = g_delta.astype(gd_ref_.dtype)
        gB_ref_[...] = gbc_s_[:, 0].astype(gB_ref_.dtype)
        gC_ref_[...] = gbc_s_[:, 1].astype(gC_ref_.dtype)

    epi(gyf_s, uf_s, deltaf_s, guf_s, gdf_s, gbcf_s, accf_s, gAf_acc,
        guf_ref, gdf_ref, gBf_ref, gCf_ref, 0)
    epi(gyr_s, ur_s, deltar_s, gur_s, gdr_s, gbcr_s, accr_s, gAr_acc,
        gur_ref, gdr_ref, gBr_ref, gCr_ref, 1)

    gA2_ref[0] = accf_s[2:]
    gA2_ref[1] = accr_s[2:]
    gD2_ref[0] = accf_s[0]
    gD2_ref[1] = accr_s[0]
    gbias2_ref[0] = accf_s[1]
    gbias2_ref[1] = accr_s[1]


def bidir_scan_bwd_impl(
    uf, df, Bf, Cf, ur, dr, Br, Cr,
    Af, Ar, Df, Dr, biasf, biasr,
    gyf, gyr, carf, carr,
    delta_softplus: bool,
    T: int,
    interpret: bool = False,
):
    G, L, d = uf.shape
    N = Af.shape[-1]
    nc = carf.shape[1]
    Lp = nc * T

    tensors = [uf, df, Bf, Cf, ur, dr, Br, Cr, gyf, gyr]
    if L % T != 0:
        pad = Lp - L
        dpad = -1e4 if delta_softplus else 0.0
        out = []
        for i, t in enumerate(tensors):
            cval = dpad if i in (1, 5) else 0.0
            out.append(jnp.pad(t, ((0, 0), (0, pad)) + ((0, 0),) * (t.ndim - 2),
                               constant_values=cval))
        tensors = out

    Gb = min(8, G)
    while G % Gb != 0:
        Gb -= 1

    def bwd_bytes(gb):
        big = gb * T * d * 4
        hda = gb * T * N * d * 2 * 2
        return 2 * (big * (2 * 4 + 2 * 2 + 6) + hda + 3 * gb * N * d * 4)

    while bwd_bytes(Gb) > max(_VMEM_BUDGET, 10 * 1024 * 1024) and Gb > 1:
        Gb = max(1, Gb // 2)
        while G % Gb != 0:
            Gb -= 1

    A2 = jnp.stack([
        jnp.asarray(Af, jnp.float32).T.reshape(N, d),
        jnp.asarray(Ar, jnp.float32).T.reshape(N, d),
    ])
    z1 = jnp.zeros((d,), jnp.float32)
    D2 = jnp.stack([
        z1 if Df is None else jnp.asarray(Df, jnp.float32).reshape(d),
        z1 if Dr is None else jnp.asarray(Dr, jnp.float32).reshape(d),
    ])
    bias2 = jnp.stack([
        z1 if biasf is None else jnp.asarray(biasf, jnp.float32).reshape(d),
        z1 if biasr is None else jnp.asarray(biasr, jnp.float32).reshape(d),
    ])

    # adjoint runs backward in scan time: grid i ↦ scan-order chunk nc-1-i.
    # fwd-direction array position = nc-1-i; rev-direction array position = i.
    fmap = lambda g, i: (g, nc - 1 - i, 0)
    rmap = lambda g, i: (g, i, 0)
    car_map = lambda g, i: (g, nc - 1 - i, 0, 0)
    full2 = lambda g, i: (0, 0, 0)
    full = lambda g, i: (0, 0)
    gd_f = pl.BlockSpec((Gb, T, d), fmap, memory_space=pltpu.VMEM)
    gn_f = pl.BlockSpec((Gb, T, N), fmap, memory_space=pltpu.VMEM)
    gd_r = pl.BlockSpec((Gb, T, d), rmap, memory_space=pltpu.VMEM)
    gn_r = pl.BlockSpec((Gb, T, N), rmap, memory_space=pltpu.VMEM)
    car_spec = pl.BlockSpec((Gb, 1, N, d), car_map, memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _bidir_bwd_kernel, T=T, delta_softplus=delta_softplus,
    )
    gd_scr = lambda: pltpu.VMEM((Gb, T, d), jnp.float32)
    outs = pl.pallas_call(
        kernel,
        grid=(G // Gb, nc),
        in_specs=[
            gd_f, gd_f, gn_f, gn_f,
            gd_r, gd_r, gn_r, gn_r,
            pl.BlockSpec((2, N, d), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d), full, memory_space=pltpu.VMEM),
            gd_f,  # gyf
            gd_r,  # gyr
            car_spec, car_spec,
        ],
        out_specs=(
            gd_f, gd_f, gn_f, gn_f,
            gd_r, gd_r, gn_r, gn_r,
            pl.BlockSpec((2, N, d), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, d), full, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((G, Lp, d), uf.dtype),
            jax.ShapeDtypeStruct((G, Lp, d), df.dtype),
            jax.ShapeDtypeStruct((G, Lp, N), Bf.dtype),
            jax.ShapeDtypeStruct((G, Lp, N), Cf.dtype),
            jax.ShapeDtypeStruct((G, Lp, d), ur.dtype),
            jax.ShapeDtypeStruct((G, Lp, d), dr.dtype),
            jax.ShapeDtypeStruct((G, Lp, N), Br.dtype),
            jax.ShapeDtypeStruct((G, Lp, N), Cr.dtype),
            jax.ShapeDtypeStruct((2, N, d), jnp.float32),
            jax.ShapeDtypeStruct((2, d), jnp.float32),
            jax.ShapeDtypeStruct((2, d), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((Gb, N, d), jnp.float32),      # lam f
            pltpu.VMEM((Gb, N, d), jnp.float32),      # lam r
            pltpu.VMEM((Gb, T, N, d), jnp.bfloat16),  # h f
            pltpu.VMEM((Gb, T, N, d), jnp.bfloat16),  # h r
            pltpu.VMEM((Gb, T, N, d), jnp.bfloat16),  # dA f
            pltpu.VMEM((Gb, T, N, d), jnp.bfloat16),  # dA r
            gd_scr(), gd_scr(),                       # delta f/r
            gd_scr(), gd_scr(),                       # du f/r
            pltpu.VMEM((Gb, 2, T, N), jnp.float32),   # bc f
            pltpu.VMEM((Gb, 2, T, N), jnp.float32),   # bc r
            gd_scr(), gd_scr(),                       # u f/r
            gd_scr(), gd_scr(),                       # gy f/r
            gd_scr(), gd_scr(),                       # gu f/r
            gd_scr(), gd_scr(),                       # gdelta f/r
            pltpu.VMEM((Gb, 2, T, N), jnp.float32),   # gbc f
            pltpu.VMEM((Gb, 2, T, N), jnp.float32),   # gbc r
            pltpu.VMEM((2 + N, d), jnp.float32),      # acc f
            pltpu.VMEM((2 + N, d), jnp.float32),      # acc r
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*tensors[:8], A2, D2, bias2, tensors[8], tensors[9], carf, carr)
    (guf, gdf, gBf, gCf, gur, gdr, gBr, gCr, gA2, gD2, gbias2) = outs
    return (guf[:, :L], gdf[:, :L], gBf[:, :L], gCf[:, :L],
            gur[:, :L], gdr[:, :L], gBr[:, :L], gCr[:, :L],
            gA2[0].T, gA2[1].T, gD2[0], gD2[1], gbias2[0], gbias2[1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17))
def bidir_selective_scan_pallas(
    uf, df, Bf, Cf, ur, dr, Br, Cr, Af, Ar, Df, Dr, biasf, biasr,
    delta_softplus: bool = True,
    chunk_size: int = 128,
    group_block: int = 8,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    yf, yr, _, _, _ = bidir_scan_fwd_impl(
        uf, df, Bf, Cf, ur, dr, Br, Cr, Af, Ar, Df, Dr, biasf, biasr,
        delta_softplus, chunk_size, group_block, interpret, save_carries=False,
    )
    return yf, yr


def _fwd(uf, df, Bf, Cf, ur, dr, Br, Cr, Af, Ar, Df, Dr, biasf, biasr,
         delta_softplus, chunk_size, group_block, interpret):
    yf, yr, carf, carr, T = bidir_scan_fwd_impl(
        uf, df, Bf, Cf, ur, dr, Br, Cr, Af, Ar, Df, Dr, biasf, biasr,
        delta_softplus, chunk_size, group_block, interpret, save_carries=True,
    )
    res = (uf, df, Bf, Cf, ur, dr, Br, Cr, Af, Ar, Df, Dr, biasf, biasr,
           carf, carr, T)
    return (yf, yr), res


def _bwd(delta_softplus, chunk_size, group_block, interpret, res, g):
    import os

    (uf, df, Bf, Cf, ur, dr, Br, Cr, Af, Ar, Df, Dr, biasf, biasr,
     carf, carr, T) = res
    gf, gr = g
    if os.environ.get("CADUCEUS_BIDIR_BWD") == "1":
        # paired backward: one kernel for both directions. Measured neutral
        # vs two single-direction kernels at the headline config (58.5k vs
        # 59.9k tok/s/chip) but needs remat_span>=2 to fit 16GB HBM at 131k;
        # kept opt-in for regimes where it wins.
        (guf, gdf, gBf, gCf, gur, gdr, gBr, gCr,
         gAf, gAr, gDf, gDr, gbf, gbr) = bidir_scan_bwd_impl(
            uf, df, Bf, Cf, ur, dr, Br, Cr, Af, Ar, Df, Dr, biasf, biasr,
            gf.astype(uf.dtype), gr.astype(ur.dtype), carf, carr,
            delta_softplus, T, interpret,
        )
    else:
        from caduceus_tpu.ops.scan_pallas import selective_scan_pallas_bwd_impl

        guf, gdf, gAf, gBf, gCf, gDf, gbf, _ = selective_scan_pallas_bwd_impl(
            uf, df, Af, Bf, Cf, Df, biasf, gf.astype(uf.dtype), carf,
            delta_softplus, False, T, interpret,
        )
        gur, gdr, gAr, gBr, gCr, gDr, gbr, _ = selective_scan_pallas_bwd_impl(
            ur, dr, Ar, Br, Cr, Dr, biasr, gr.astype(ur.dtype), carr,
            delta_softplus, True, T, interpret,
        )

    def shaped(gv, ref):
        if ref is None:
            return None
        return gv.astype(jnp.asarray(ref).dtype).reshape(jnp.shape(ref))

    return (guf.astype(uf.dtype), gdf.astype(df.dtype),
            gBf.astype(Bf.dtype), gCf.astype(Cf.dtype),
            gur.astype(ur.dtype), gdr.astype(dr.dtype),
            gBr.astype(Br.dtype), gCr.astype(Cr.dtype),
            gAf.astype(Af.dtype), gAr.astype(Ar.dtype),
            shaped(gDf, Df), shaped(gDr, Dr),
            shaped(gbf, biasf), shaped(gbr, biasr))


bidir_selective_scan_pallas.defvjp(_fwd, _bwd)
