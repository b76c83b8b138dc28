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

from caduceus_tpu.ops.scan_pallas import _VMEM_BUDGET


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
        carf_ref[:, 0] = hf_s[...]
        carr_ref[:, 0] = hr_s[...]

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

    def one(d_s_, du_s_, bc_s_, y_s_, A, t, h):
        d_t = d_s_[:, pl.ds(t, 1), :][:, 0, :]
        dA = jnp.exp(d_t[:, None, :] * A[None])
        B_t = bc_s_[:, 0, pl.ds(t, 1), :][:, 0, :]
        du_t = du_s_[:, pl.ds(t, 1), :][:, 0, :]
        h = dA * h + B_t[..., None] * du_t[:, None, :]
        C_t = bc_s_[:, 1, pl.ds(t, 1), :][:, 0, :]
        y_s_[:, pl.ds(t, 1), :] = jnp.sum(C_t[..., None] * h, axis=1)[:, None, :]
        return h

    def step(k, carry):
        hf, hr = carry
        hf = one(df_s, duf_s, bcf_s, yf_s, Af, k, hf)
        hr = one(dr_s, dur_s, bcr_s, yr_s, Ar, T - 1 - k, hr)
        return hf, hr

    hf, hr = jax.lax.fori_loop(0, T, step, (hf_s[...], hr_s[...]))
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
            jax.ShapeDtypeStruct((G, nc, N, d), jnp.float32),
            jax.ShapeDtypeStruct((G, nc, N, d), jnp.float32),
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
    from caduceus_tpu.ops.scan_pallas import selective_scan_pallas_bwd_impl

    (uf, df, Bf, Cf, ur, dr, Br, Cr, Af, Ar, Df, Dr, biasf, biasr,
     carf, carr, T) = res
    gf, gr = g
    guf, gdf, gAf, gBf, gCf, gDf, gbf = selective_scan_pallas_bwd_impl(
        uf, df, Af, Bf, Cf, Df, biasf, gf.astype(uf.dtype), carf,
        delta_softplus, False, T, interpret,
    )
    gur, gdr, gAr, gBr, gCr, gDr, gbr = selective_scan_pallas_bwd_impl(
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
            gAf, gAr, shaped(gDf, Df), shaped(gDr, Dr),
            shaped(gbf, biasf), shaped(gbr, biasr))


bidir_selective_scan_pallas.defvjp(_fwd, _bwd)
