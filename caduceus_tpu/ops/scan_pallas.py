"""Pallas TPU kernel for the selective scan.

TPU-native replacement for the reference's fused CUDA ``selective_scan_fwd``
(mamba-ssm 1.2.0, SURVEY.md §2.3): the recurrence runs entirely in VMEM with
the (N, d) state held in a scratch register file across sequence chunks —
the (B, L, d, N) decay/drive tensors are never materialized in HBM.

Layout (TPU-first):
- activations are (G, L, d) with the channel axis on lanes (d = multiple of
  128); G = batch × strands (RCPS folds both strands into G);
- the state is (G_blk, N, d): N on sublanes, d on lanes — the per-timestep
  update is a handful of fused VPU ops on contiguous registers;
- A is passed transposed as (N, d);
- grid = (G / G_blk, L / T): chunk axis iterates sequentially (TPU grid
  order), carrying state in VMEM scratch; the state resets when the chunk
  index returns to 0 for the next group block.

``reverse=True`` runs the scan right-to-left via reversed chunk index_maps
plus in-kernel time reversal — no flipped copies of the inputs exist
anywhere (cf. `BiMambaWrapper.forward`'s x.flip(1),
`caduceus/modeling_caduceus.py:128-133`).

The public wrapper :func:`selective_scan_pallas` is a ``jax.custom_vjp``:
forward = this kernel; backward = recompute via the XLA chunked scan
(`selective_scan`), giving kernel-speed inference/forward immediately while
the dedicated backward kernel lands later.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from caduceus_tpu.ops.selective_scan import selective_scan


def _scan_kernel(
    *refs,
    T: int,
    reverse: bool,
    delta_softplus: bool,
    has_z: bool,
):
    # refs: u, delta, B, C, A, D, bias, [z], y_out, then scratches
    if has_z:
        (u_ref, delta_ref, B_ref, C_ref, A_ref, D_ref, bias_ref, z_ref,
         y_ref, h_scratch, delta_s, du_s, bc_s, y_s) = refs
    else:
        (u_ref, delta_ref, B_ref, C_ref, A_ref, D_ref, bias_ref,
         y_ref, h_scratch, delta_s, du_s, bc_s, y_s) = refs
        z_ref = None
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    # Chunk-wide precompute (one big vectorized pass): upcast every input to
    # fp32 SCRATCH so the sequential loop only ever dynamic-slices fp32
    # refs (Pallas TPU cannot dynamic_slice register values, and sub-tile
    # dynamic slicing of bf16 refs is fragile in Mosaic).
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

    def step(k, h):
        t = (T - 1 - k) if reverse else k
        d_t = delta_s[:, pl.ds(t, 1), :][:, 0, :]      # (Gb, d)
        dA = jnp.exp(d_t[:, None, :] * A[None])        # (Gb, N, d)
        B_t = bc_s[:, 0, pl.ds(t, 1), :][:, 0, :]      # (Gb, N)
        du_t = du_s[:, pl.ds(t, 1), :][:, 0, :]        # (Gb, d)
        h = dA * h + B_t[..., None] * du_t[:, None, :]
        C_t = bc_s[:, 1, pl.ds(t, 1), :][:, 0, :]
        y_s[:, pl.ds(t, 1), :] = jnp.sum(C_t[..., None] * h, axis=1)[:, None, :]
        return h

    h = jax.lax.fori_loop(0, T, step, h_scratch[...])
    h_scratch[...] = h

    # epilogue: D·u residual and SiLU(z) gate as chunk-wide vector ops
    y = y_s[...] + D_ref[0][None, None, :] * u
    if has_z:
        z = z_ref[...].astype(jnp.float32)
        y = y * (z * jax.lax.logistic(z))
    y_ref[...] = y.astype(y_ref.dtype)


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
) -> jnp.ndarray:
    G, L, d = u.shape
    N = A.shape[-1]
    T = min(chunk_size, L)
    has_z = z is not None
    # VMEM budget: u/delta(/z) input blocks and the y output block are
    # double-buffered by the pipeline; plus the delta/du precompute scratch
    # and the h carry. Keep the total under ~8 MB (16 MB/core VMEM).
    def vmem_bytes(gb, t):
        per = gb * t * d * 4
        # double-buffered ins (u, delta, z) + out (y) + fp32 scratches
        # (delta, du, y_core) + h carry + B/C scratch
        return per * (2 * (2 + has_z) + 2 + 3) + gb * N * d * 4 + gb * 2 * t * N * 4

    Gb = min(group_block, G)
    while G % Gb != 0:
        Gb -= 1
    while vmem_bytes(Gb, T) > 8 * 1024 * 1024:
        if T > 32:
            T //= 2
        elif Gb > 1:
            Gb = max(1, Gb // 2)
            while G % Gb != 0:
                Gb -= 1
        else:
            break
    T = max(T, 1)
    # pad L to a multiple of T with zeros: delta=0 (pre-softplus -> softplus
    # gives ~0.69 decay exp(0.69*A)<1 which is harmless only if drive is 0 —
    # but y at padded positions is discarded and padded steps sit at the END
    # of the forward traversal / START handled by reversed index maps, so
    # they never contaminate real positions in forward order. For reverse we
    # must ensure padded steps are traversed FIRST with zero drive: zero
    # drive + any decay of a zero state stays zero. h starts at 0, so both
    # directions are safe.
    if L % T != 0:
        pad = T - L % T
        padcfg = lambda t: jnp.pad(t, ((0, 0), (0, pad)) + ((0, 0),) * (t.ndim - 2))
        u, delta, B_mat, C = padcfg(u), padcfg(delta), padcfg(B_mat), padcfg(C)
        if z is not None:
            z = padcfg(z)
    Lp = u.shape[1]
    nc = Lp // T

    A_T = jnp.asarray(A, jnp.float32).T.reshape(N, d)
    D_in = (jnp.zeros((1, d), jnp.float32) if D is None
            else jnp.asarray(D, jnp.float32).reshape(1, d))
    bias_in = (jnp.zeros((1, d), jnp.float32) if delta_bias is None
               else jnp.asarray(delta_bias, jnp.float32).reshape(1, d))

    if reverse:
        cmap = lambda g, i: (g, nc - 1 - i, 0)
    else:
        cmap = lambda g, i: (g, i, 0)
    full = lambda g, i: (0, 0)

    gd_spec = pl.BlockSpec((Gb, T, d), cmap, memory_space=pltpu.VMEM)
    gn_spec = pl.BlockSpec((Gb, T, N), cmap, memory_space=pltpu.VMEM)

    in_specs = [
        gd_spec,  # u
        gd_spec,  # delta
        gn_spec,  # B
        gn_spec,  # C
        pl.BlockSpec((N, d), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), full, memory_space=pltpu.VMEM),
    ]
    inputs = [u, delta, B_mat, C, A_T, D_in, bias_in]
    if has_z:
        in_specs.append(gd_spec)
        inputs.append(z)

    kernel = functools.partial(
        _scan_kernel, T=T, reverse=reverse,
        delta_softplus=delta_softplus, has_z=has_z,
    )
    y = pl.pallas_call(
        kernel,
        grid=(G // Gb, nc),
        in_specs=in_specs,
        out_specs=gd_spec,
        out_shape=jax.ShapeDtypeStruct((G, Lp, d), u.dtype),
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
    return y[:, :L]


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
    return selective_scan_pallas_fwd_impl(
        u, delta, A, B_mat, C, D, z, delta_bias,
        delta_softplus, reverse, chunk_size, group_block, interpret,
    )


def _fwd(u, delta, A, B_mat, C, D, z,
         delta_softplus, reverse, chunk_size, group_block, interpret,
         delta_bias=None):
    y = selective_scan_pallas_fwd_impl(
        u, delta, A, B_mat, C, D, z, delta_bias,
        delta_softplus, reverse, chunk_size, group_block, interpret,
    )
    return y, (u, delta, A, B_mat, C, D, z, delta_bias)


def _bwd(delta_softplus, reverse, chunk_size, group_block, interpret,
         residuals, g):
    u, delta, A, B_mat, C, D, z, delta_bias = residuals

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
