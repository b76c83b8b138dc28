"""Head-batched Pallas TPU kernels for the SSD (Mamba-2) scan.

Same math as `ops/ssd_pallas.py` (see its module docstring for the chunk
algebra and the adjoint derivation) restructured so the MXU sees few, wide
matmuls instead of a per-head loop of (T, T) @ (T, P=64) ops:

- The state lives as ``(N, H·P)`` instead of ``(H·N, P)``.  With the
  mamba-ssm default ``ngroups=1`` every cross-chunk quantity then batches
  over ALL heads in one full-width matmul:

      y_cross  = ecum ⊙ (C  @ h_state)          (T, N) @ (N, H·P)
      h_state' = e_end ⊙ h_state + Bᵀ @ (w ⊙ dx) (N, T) @ (T, H·P)
      B @ λ, Cᵀ @ (ecum ⊙ g_y), gB/gC second terms, ...

  (for ngroups > 1 the same holds per group over its contiguous
  ``rep·P``-wide column block).

- Per-head work is only what is irreducibly per-head: the in-chunk decay
  mask ``Lm_h`` (the decay is scalar per head) and its (T, T) products.
  With the default chunk T=128 (= one MXU tile) that is T exps per
  position per head — ~8× less (T, T) VPU work than the chunk-512
  configuration of the base kernel, while the cross-chunk bridging that
  T=512 amortized now runs as the full-width batched matmuls above.

- Per-head (T, H)-shaped scalars (dt, exp(cum), w, ...) are expanded to
  (T, H·P) lane layout by a 0/1 selector matmul ``vals @ SEL`` (SEL is
  (H, H·P) with SEL[h, h·P:(h+1)·P] = 1), HIGHEST precision so fp32
  values survive the MXU (same policy as the cum matmuls — see the
  bf16-MXU cumsum note in `ops/ssd_pallas.py`).

Interface-compatible with `ops/ssd_pallas.py` (`ssd_pallas`,
`ssd_pallas_chained`); numerics match `ops/ssd.py ssd_chunked` under the
same precision policy (matmul operands in the storage dtype, fp32
accumulation, fp32 state carry). Oracle/grad parity in
tests/test_ssd_pallas_batched.py; on-device gate rows in
scripts/verify_tpu.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from caduceus_tpu.ops.ssd_pallas import (
    _carry_dtype,
    _cum_masks,
    _mm,
    _pad_ssd,
    _resolve_dt_tile,
    _CONTRACT_0,
    _CONTRACT_1,
)

# The selector/mask matmuls need the fp32 VALUE operand to survive the
# MXU (the 0/1 operand is exact in any precision). bf16x3
# (Precision.HIGH) would be exact at half HIGHEST's passes, but Mosaic
# only lowers DEFAULT and HIGHEST dots — measured: HIGH raises
# "Unsupported dot precision" at lowering. DEFAULT truncates the values
# to bf16 (the exact failure the base kernel's cumsum note documents).
# So: HIGHEST, with CADUCEUS_SSD_SEL_PRECISION=default as an A/B knob.
import os as _os

_HI = (jax.lax.Precision.DEFAULT
       if _os.environ.get("CADUCEUS_SSD_SEL_PRECISION") == "default"
       else jax.lax.Precision.HIGHEST)


def _sel(H: int, P: int):
    """(H, H·P) selector: SEL[h, j] = 1 iff j // P == h (fp32)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, H * P), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, H * P), 1)
    return (cols // P == rows).astype(jnp.float32)


def _selT(H: int, P: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (H * P, H), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H * P, H), 1)
    return (rows // P == cols).astype(jnp.float32)


def _hi_mm(a, b):
    """fp32-exactness matmul (expansions / reductions of fp32 scalars)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )


# Sublane row count of the conv-history blocks. Mosaic rejects sublane-dim
# concatenation of tiles whose row counts are not multiples of the (8, 128)
# tile ("result/input offset mismatch on non-concat dimension" — observed
# on device with a (3, Wc) ++ (T, Wc) concat), so histories are carried as
# full 8-row blocks with only the edge K-1 rows meaningful.
_HIST_ROWS = 8


def _conv_ext(blk, hist8, o, T, K, nci_edge: bool, reverse: bool):
    """(T+8, Wc) raw rows for one chunk's depthwise conv.

    Forward conv reads rows BEFORE the chunk — an 8-row head whose last
    K-1 rows matter (from the block when the chunk has an in-block
    predecessor, else the precomputed segment-boundary ``hist8``); the
    reverse/anti-causal direction reads an 8-row tail (first K-1 rows
    matter)."""
    HB = _HIST_ROWS
    if reverse:
        after = hist8 if nci_edge else blk[o + T:o + T + HB]
        return jnp.concatenate([blk[o:o + T], after], axis=0)
    before = hist8 if nci_edge else blk[o - HB:o]
    return jnp.concatenate([before, blk[o:o + T]], axis=0)


def _conv_pre(ext, cw, cb, T, reverse: bool, base: int = 0):
    """fp32 pre-activation depthwise conv over ``ext`` rows.

    Matches `ops/conv.py causal_conv1d`: forward y[i] = Σ_k w[k]·
    ext[base+i+k] (tap K-1 = current row); reverse y[i] = Σ_k w[k]·
    ext[base+i+K-1-k]. ``base`` skips the unused head rows of an 8-row
    history block."""
    K = cw.shape[0]
    acc = None
    for k in range(K):
        idx = base + ((K - 1 - k) if reverse else k)
        term = ext[idx:idx + T].astype(jnp.float32) * cw[k:k + 1]
        acc = term if acc is None else acc + term
    if cb is not None:
        acc = acc + cb
    return acc


def _silu(p):
    return p * jax.nn.sigmoid(p)


def _fused_aligned(H: int, Pd: int, NG: int, N: int) -> bool:
    """True when every x|B|C column-piece boundary is 128-lane aligned —
    the fused adjoint then runs as one full-width piece (the per-piece
    form exists because Mosaic rejects concatenating lane slices whose
    offsets are not 128-aligned, e.g. N=16)."""
    return (H * Pd) % 128 == 0 and N % 128 == 0


def _seg_hists(xp, Ts, K, reverse: bool, edge=None):
    """(G, nseg, 8, Wc) segment-boundary conv history rows, gathered by
    XLA as strided slices (no sequential dependency): forward = the 8 rows
    before each segment (last K-1 meaningful; zeros for the first),
    reverse = the 8 rows after (first K-1 meaningful; zeros for the
    last). Reads only the 8 needed rows per segment — no full-length
    padded copy of xp.

    ``edge`` (G, 8, Wc), when given, replaces the zero block at the
    sequence boundary — the context-parallel hook: a shard passes its
    neighbor's boundary rows (ppermuted) so the in-kernel conv sees the
    true cross-shard history instead of sequence-start zeros."""
    G, Lp, Wc = xp.shape
    HB = _HIST_ROWS
    nseg = Lp // Ts
    seg = xp.reshape(G, nseg, Ts, Wc)
    zero = (jnp.zeros((G, 1, HB, Wc), xp.dtype) if edge is None
            else edge.astype(xp.dtype)[:, None])
    if reverse:
        # hist[s] = first 8 rows of segment s+1 (zeros past the end)
        return jnp.concatenate([seg[:, 1:, :HB], zero], axis=1)
    # hist[s] = last 8 rows of segment s-1 (zeros before the start)
    return jnp.concatenate([zero, seg[:, :-1, Ts - HB:]], axis=1)


def _fwd_kernel(
    *refs,
    T: int, nci: int, H: int, Pd: int, NG: int, N: int,
    reverse: bool, dt_softplus: bool, save_carries: bool, mm_dtype,
    fused: bool = False, K: int = 0,
):
    if fused:
        (xBC_ref, dt_ref, cw_ref, cb_ref, hist_ref,
         A_ref, D_ref, bias_ref, h0_ref, *rest) = refs
    else:
        x_ref, dt_ref, B_ref, C_ref, A_ref, D_ref, bias_ref, h0_ref, *rest \
            = refs
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
    SEL = _sel(H, Pd)
    D_x = _hi_mm(D_ref[...], SEL)                         # (1, H·P)

    order = range(nci - 1, -1, -1) if reverse else range(nci)
    for c in order:
        o = c * T
        if save_carries:
            car_ref[0, c] = h_s[...].astype(car_ref.dtype)
        dt = _resolve_dt_tile(dt_ref[0, o:o + T], bias_ref, dt_softplus)
        a = dt * A_ref[...]                               # (T, H), <= 0
        cum = jax.lax.dot_general(
            Mcum, a, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )                                                 # (T, H) inclusive
        total = jnp.sum(a, axis=0, keepdims=True)         # (1, H)
        # one stacked selector expansion instead of four. Row order keeps
        # every (T,·) slice 8-row aligned (dt at 2T, e_end last): an
        # odd-offset slice propagates a sublane offset into its consumers,
        # which Mosaic rejects at some ops ("offset mismatch").
        vals_x = _hi_mm(
            jnp.concatenate(
                [jnp.exp(cum), jnp.exp(total - cum), dt, jnp.exp(total)],
                axis=0),
            SEL)                                          # (3T+1, H·P)
        ecum_x = vals_x[:T]
        w_x = vals_x[T:2 * T]
        dt_x = vals_x[2 * T:3 * T]
        e_end_x = vals_x[3 * T:3 * T + 1]
        cum_rows = jnp.transpose(cum)                     # (H, T)

        if fused:
            # in-kernel conv+SiLU+split: the post-conv (L, H·P+2·NG·N)
            # tensor never exists in HBM (the `ops/ssd.py` fused-conv
            # memory strategy, now on the Pallas path)
            edge = (c == nci - 1) if reverse else (c == 0)
            ext = _conv_ext(xBC_ref[0], hist_ref[0, 0], o, T, K, edge,
                            reverse)
            pre = _conv_pre(ext, cw_ref[...], cb_ref[...], T, reverse,
                            base=0 if reverse else _HIST_ROWS - (K - 1))
            xc = _silu(pre)                               # (T, Wc) fp32
            xf = xc[:, :H * Pd]
            Bm = xc[:, H * Pd:H * Pd + NG * N]
            Cm = xc[:, H * Pd + NG * N:]
        else:
            xf = x_ref[0, o:o + T, :].astype(jnp.float32)  # (T, H·P)
            Bm = B_ref[0, o:o + T, :]
            Cm = C_ref[0, o:o + T, :]
        dx = dt_x * xf
        wdx = w_x * dx

        y_cross_cols = []
        y_diag_cols = []
        for g in range(NG):
            Bg = Bm[:, g * N:(g + 1) * N]
            Cg = Cm[:, g * N:(g + 1) * N]
            CB = _mm(Cg, Bg, mm_dtype, _CONTRACT_1)       # (T, T)
            lo, hi = g * rep * Pd, (g + 1) * rep * Pd
            h_in = h_s[:, lo:hi]                          # (N, rep·P) fp32
            y_cross_cols.append(_mm(Cg, h_in, mm_dtype))  # (T, rep·P)
            for r_i in range(rep):
                h = g * rep + r_i
                seg = cum[:, h:h + 1] - cum_rows[h:h + 1, :]
                Lm = jnp.exp(jnp.where(keep, seg, -jnp.inf))
                y_diag_cols.append(
                    _mm(CB * Lm, dx[:, h * Pd:(h + 1) * Pd], mm_dtype))
            S = _mm(Bg, wdx[:, lo:hi], mm_dtype, _CONTRACT_0)  # (N, rep·P)
            h_s[:, lo:hi] = e_end_x[0:1, lo:hi] * h_in + S

        y = (jnp.concatenate(y_diag_cols, axis=1)
             + ecum_x * jnp.concatenate(y_cross_cols, axis=1)
             + D_x * xf)
        y_ref[0, o:o + T, :] = y.astype(y_ref.dtype)

    hN_ref[0] = h_s[...]


def ssd_pallas_batched_fwd_impl(
    x, dt, A, B_mat, C, D, dt_bias,
    dt_softplus: bool,
    reverse: bool,
    chunk_size: int = 128,
    interpret: bool = False,
    save_carries: bool = False,
    h_init=None,          # (G, H, N, P) fp32 (caller layout)
    seg_chunks: int = 8,
):
    G, L, H, Pd = x.shape
    NG, N = B_mat.shape[-2], B_mat.shape[-1]
    # T must stay a multiple of 8: the stacked selector expansion's (T,·)
    # slices otherwise pick up sublane offsets Mosaic rejects downstream
    T = max(8, -(-min(chunk_size, L) // 8) * 8)
    nci = max(1, min(seg_chunks, -(-L // T)))
    Ts = T * nci

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
    # state layout (N, H·P): head-contiguous columns
    h0_in = (jnp.zeros((G, N, H * Pd), jnp.float32) if h_init is None
             else jnp.asarray(h_init, jnp.float32).transpose(0, 2, 1, 3)
             .reshape(G, N, H * Pd))

    cmap = ((lambda g, i: (g, nseg - 1 - i, 0)) if reverse
            else (lambda g, i: (g, i, 0)))
    full2 = lambda g, i: (0, 0)
    smap = lambda g, i: (g, 0, 0)

    xd_spec = pl.BlockSpec((1, Ts, H * Pd), cmap, memory_space=pltpu.VMEM)
    dt_spec = pl.BlockSpec((1, Ts, H), cmap, memory_space=pltpu.VMEM)
    bc_spec = pl.BlockSpec((1, Ts, NG * N), cmap, memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((1, H), full2, memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((1, N, H * Pd), smap, memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((G, Lp, H * Pd), x.dtype),
        jax.ShapeDtypeStruct((G, N, H * Pd), jnp.float32),
    ]
    out_specs = [xd_spec, st_spec]
    if save_carries:
        out_shape.append(
            jax.ShapeDtypeStruct((G, nseg * nci, N, H * Pd),
                                 _carry_dtype(x.dtype)))
        out_specs.append(pl.BlockSpec(
            (1, nci, N, H * Pd),
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
        scratch_shapes=[pltpu.VMEM((N, H * Pd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*tensors, A_in, D_in, bias_in, h0_in)

    def st_out(h):  # (G, N, H·P) -> (G, H, N, P)
        return h.reshape(G, N, H, Pd).transpose(0, 2, 1, 3)

    if save_carries:
        y, hN, carries = out
        return (y[:, :L].reshape(G, L, H, Pd), st_out(hN), carries, T, nci)
    y, hN = out
    return y[:, :L].reshape(G, L, H, Pd), st_out(hN)


def ssd_pallas_batched_fused_fwd_impl(
    xBC, dt, A, conv_w, conv_b, D, dt_bias,
    dims,                 # (H, P, NG, N)
    dt_softplus: bool,
    reverse: bool,
    chunk_size: int = 128,
    interpret: bool = False,
    save_carries: bool = False,
    h_init=None,
    seg_chunks: int = 8,
    edge_hist=None,       # (G, 8, Wc) — CP: neighbor shard's boundary rows
):
    """Fused-conv forward: ``xBC`` is the PRE-conv (G, L, H·P + 2·NG·N)
    tensor; the depthwise conv + SiLU + x/B/C split run inside the kernel
    so the post-conv tensor never materializes in HBM (the `ops/ssd.py`
    fused-conv memory strategy on the Pallas path). Conv semantics =
    `ops/conv.py causal_conv1d` (reverse = anti-causal)."""
    H, Pd, NG, N = dims
    G, L, Wc = xBC.shape
    assert Wc == H * Pd + 2 * NG * N, (xBC.shape, dims)
    K = conv_w.shape[0]
    assert K - 1 <= _HIST_ROWS, f"conv width {K} exceeds the 8-row history"
    # multiple of 8 (sublane alignment of the stacked-expansion slices)
    # and >= the 8-row conv history blocks
    T = max(_HIST_ROWS, -(-min(chunk_size, L) // 8) * 8)
    nci = max(1, min(seg_chunks, -(-L // T)))
    Ts = T * nci

    tensors = [xBC, dt]
    if L % Ts != 0:
        # padded tail rows would sit between the real data and a CP
        # neighbor's edge rows (the reverse conv would read padding as
        # history) — CP callers must pass segment-aligned local lengths
        assert edge_hist is None, (
            f"edge_hist requires L % (chunk·seg) == 0, got L={L}, Ts={Ts}")
        tensors = _pad_ssd(tensors, Ts - L % Ts, dt_softplus, dt_bias, H)
    xp, dt_p = tensors
    Lp = xp.shape[1]
    nseg = Lp // Ts
    hists = _seg_hists(xp, Ts, K, reverse, edge_hist)  # (G, nseg, 8, Wc)

    cw_in = jnp.asarray(conv_w, jnp.float32)
    cb_in = (jnp.zeros((1, Wc), jnp.float32) if conv_b is None
             else jnp.asarray(conv_b, jnp.float32).reshape(1, Wc))
    A_in = jnp.asarray(A, jnp.float32).reshape(1, H)
    D_in = (jnp.zeros((1, H), jnp.float32) if D is None
            else jnp.asarray(D, jnp.float32).reshape(1, H))
    bias_in = (jnp.zeros((1, H), jnp.float32) if dt_bias is None
               else jnp.asarray(dt_bias, jnp.float32).reshape(1, H))
    h0_in = (jnp.zeros((G, N, H * Pd), jnp.float32) if h_init is None
             else jnp.asarray(h_init, jnp.float32).transpose(0, 2, 1, 3)
             .reshape(G, N, H * Pd))

    cmap = ((lambda g, i: (g, nseg - 1 - i, 0)) if reverse
            else (lambda g, i: (g, i, 0)))
    hist_map = ((lambda g, i: (g, nseg - 1 - i, 0, 0)) if reverse
                else (lambda g, i: (g, i, 0, 0)))
    full2 = lambda g, i: (0, 0)
    smap = lambda g, i: (g, 0, 0)

    xbc_spec = pl.BlockSpec((1, Ts, Wc), cmap, memory_space=pltpu.VMEM)
    dt_spec = pl.BlockSpec((1, Ts, H), cmap, memory_space=pltpu.VMEM)
    cw_spec = pl.BlockSpec((K, Wc), full2, memory_space=pltpu.VMEM)
    cb_spec = pl.BlockSpec((1, Wc), full2, memory_space=pltpu.VMEM)
    hist_spec = pl.BlockSpec((1, 1, _HIST_ROWS, Wc), hist_map,
                             memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((1, H), full2, memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((1, N, H * Pd), smap, memory_space=pltpu.VMEM)

    out_shape = [
        jax.ShapeDtypeStruct((G, Lp, H * Pd), xBC.dtype),
        jax.ShapeDtypeStruct((G, N, H * Pd), jnp.float32),
    ]
    y_spec = pl.BlockSpec((1, Ts, H * Pd), cmap, memory_space=pltpu.VMEM)
    out_specs = [y_spec, st_spec]
    if save_carries:
        out_shape.append(
            jax.ShapeDtypeStruct((G, nseg * nci, N, H * Pd),
                                 _carry_dtype(xBC.dtype)))
        out_specs.append(pl.BlockSpec(
            (1, nci, N, H * Pd),
            (lambda g, i: (g, nseg - 1 - i, 0, 0)) if reverse
            else (lambda g, i: (g, i, 0, 0)),
            memory_space=pltpu.VMEM,
        ))

    kernel = functools.partial(
        _fwd_kernel, T=T, nci=nci, H=H, Pd=Pd, NG=NG, N=N, reverse=reverse,
        dt_softplus=dt_softplus, save_carries=save_carries,
        mm_dtype=xBC.dtype, fused=True, K=K,
    )
    out = pl.pallas_call(
        kernel,
        grid=(G, nseg),
        in_specs=[xbc_spec, dt_spec, cw_spec, cb_spec, hist_spec,
                  h_spec, h_spec, h_spec, st_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[pltpu.VMEM((N, H * Pd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, dt_p, cw_in, cb_in, hists, A_in, D_in, bias_in, h0_in)

    def st_out(h):
        return h.reshape(G, N, H, Pd).transpose(0, 2, 1, 3)

    if save_carries:
        y, hN, carries = out
        return (y[:, :L].reshape(G, L, H, Pd), st_out(hN), carries, T, nci)
    y, hN = out
    return y[:, :L].reshape(G, L, H, Pd), st_out(hN)


# ===========================================================================
# Backward kernel
# ===========================================================================

def _bwd_kernel(
    *refs,
    T: int, nci: int, H: int, Pd: int, NG: int, N: int,
    reverse: bool, dt_softplus: bool, mm_dtype,
    fused: bool = False, K: int = 0, emit_pend: bool = False,
):
    gph_ref = None
    if fused and emit_pend:
        (xBC_ref, dt_ref, cw_ref, cb_ref, hist_ref, A_ref, D_ref, bias_ref,
         gy_ref, car_ref, ghN_ref,
         gx_ref, gdt_ref, gA_ref, gbias_ref, gD_ref, gcw_ref, gcb_ref,
         gh0_ref, gph_ref, lam_s, acc_s, cacc_s, *pend_list) = refs
    elif fused:
        (xBC_ref, dt_ref, cw_ref, cb_ref, hist_ref, A_ref, D_ref, bias_ref,
         gy_ref, car_ref, ghN_ref,
         gx_ref, gdt_ref, gA_ref, gbias_ref, gD_ref, gcw_ref, gcb_ref,
         gh0_ref, lam_s, acc_s, cacc_s, *pend_list) = refs
    else:
        (x_ref, dt_ref, B_ref, C_ref, A_ref, D_ref, bias_ref, gy_ref,
         car_ref, ghN_ref,
         gx_ref, gdt_ref, gB_ref, gC_ref, gA_ref, gbias_ref, gD_ref,
         gh0_ref, lam_s, acc_s) = refs
    gi = pl.program_id(0)
    ci = pl.program_id(1)
    rep = H // NG

    @pl.when(jnp.logical_and(gi == 0, ci == 0))
    def _():
        acc_s[...] = jnp.zeros_like(acc_s)  # rows: [g_A; g_bias; g_D]
        if fused:
            cacc_s[...] = jnp.zeros_like(cacc_s)  # rows: [g_w (K); g_b]

    @pl.when(ci == 0)
    def _():
        lam_s[...] = ghN_ref[0]
        if fused:
            # conv-adjoint spillover from the not-yet-seen neighbor chunk;
            # zero at each row's walk start (pad-region g_pre is exactly 0).
            # One scratch per column piece: a shared (8, Wc) scratch's
            # per-piece lane slices can start at non-128-aligned offsets
            # (e.g. N=16), and Mosaic rejects concatenating such a slice
            # with an offset-0 operand.
            for p_s in pend_list:
                p_s[...] = jnp.zeros_like(p_s)

    if fused:
        # static per-piece lane bounds of the conv adjoint (x | B | C);
        # one full-width piece when every boundary is 128-lane aligned
        # (see the piece construction below)
        if _fused_aligned(H, Pd, NG, N):
            piece_bounds = [(0, H * Pd + 2 * NG * N)]
        else:
            piece_bounds = [(0, H * Pd)]
            for g in range(NG):
                piece_bounds.append((H * Pd + g * N, N))
            for g in range(NG):
                piece_bounds.append((H * Pd + NG * N + g * N, N))

    keep, Mcum, McumT = _cum_masks(T, reverse)
    SEL = _sel(H, Pd)
    SELT = _selT(H, Pd)
    D_x = _hi_mm(D_ref[...], SEL)
    last_t = 0 if reverse else T - 1
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0) == last_t
              ).astype(jnp.float32)
    ones = jnp.ones((T, 1), jnp.float32)
    A_row = A_ref[...]

    order = range(nci) if reverse else range(nci - 1, -1, -1)
    for c in order:
        o = c * T
        dt = _resolve_dt_tile(dt_ref[0, o:o + T], bias_ref, dt_softplus)
        a = dt * A_row
        cum = jax.lax.dot_general(
            Mcum, a, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )
        total = jnp.sum(a, axis=0, keepdims=True)
        ecum = jnp.exp(cum)
        w = jnp.exp(total - cum)
        # one stacked selector expansion instead of four; 8-row-aligned
        # slices (see the fwd kernel's layout note)
        vals_x = _hi_mm(
            jnp.concatenate([ecum, w, dt, jnp.exp(total)], axis=0), SEL)
        ecum_x = vals_x[:T]
        w_x = vals_x[T:2 * T]
        dt_x = vals_x[2 * T:3 * T]
        e_end_x = vals_x[3 * T:3 * T + 1]
        cum_rows = jnp.transpose(cum)

        if fused:
            # recompute conv+SiLU from the streamed RAW xBC — replaces
            # reading saved post-conv x/B/C (which no longer exist in HBM)
            edge = (c == nci - 1) if reverse else (c == 0)
            ext = _conv_ext(xBC_ref[0], hist_ref[0, 0], o, T, K, edge,
                            reverse)
            conv_base = 0 if reverse else _HIST_ROWS - (K - 1)
            pre = _conv_pre(ext, cw_ref[...], cb_ref[...], T, reverse,
                            base=conv_base)
            sig = jax.nn.sigmoid(pre)
            xc = pre * sig
            xf = xc[:, :H * Pd]
            Bm = xc[:, H * Pd:H * Pd + NG * N]
            Cm = xc[:, H * Pd + NG * N:]
        else:
            xf = x_ref[0, o:o + T, :].astype(jnp.float32)  # (T, H·P)
            Bm = B_ref[0, o:o + T, :]
            Cm = C_ref[0, o:o + T, :]
        gy = gy_ref[0, o:o + T, :].astype(jnp.float32)
        dx = dt_x * xf
        wdx = w_x * dx
        gy_e = ecum_x * gy
        h0 = car_ref[0, c].astype(jnp.float32)            # (N, H·P)

        gdx_cols = []
        rowcol_cols = []
        Ch_cols = []
        Blam_cols = []
        gB_cols = []
        gC_cols = []
        for g in range(NG):
            Bg = Bm[:, g * N:(g + 1) * N]
            Cg = Cm[:, g * N:(g + 1) * N]
            CB = _mm(Cg, Bg, mm_dtype, _CONTRACT_1)       # (T, T)
            lo, hi = g * rep * Pd, (g + 1) * rep * Pd
            lam_g = lam_s[:, lo:hi]                       # (N, rep·P) fp32
            h_in = h0[:, lo:hi]
            Blam = _mm(Bg, lam_g, mm_dtype)               # (T, rep·P)
            Ch = _mm(Cg, h_in, mm_dtype)                  # (T, rep·P)
            Blam_cols.append(Blam)
            Ch_cols.append(Ch)

            LG_sum = jnp.zeros((T, T), jnp.float32)
            lgcb_cols = []
            for r_i in range(rep):
                h = g * rep + r_i
                gyh = gy[:, h * Pd:(h + 1) * Pd]
                dxh = dx[:, h * Pd:(h + 1) * Pd]
                seg = cum[:, h:h + 1] - cum_rows[h:h + 1, :]
                Lm = jnp.exp(jnp.where(keep, seg, -jnp.inf))
                G_ts = _mm(gyh, dxh, mm_dtype, _CONTRACT_1)   # (T, T)
                LG = Lm * G_ts
                LG_sum = LG_sum + LG
                lgcb_cols.append(LG * CB)
                gdx_cols.append(_mm(CB * Lm, gyh, mm_dtype, _CONTRACT_0))
            # row/col reductions of every head's LGCB in TWO matmuls
            # instead of 2·rep: rows via the (rep·T, T) sublane stack,
            # cols via the (T, rep·T) lane stack with a dim-0 contraction
            # (operands are all offset-0, T is a multiple of 8)
            lgcb_tall = jnp.concatenate(lgcb_cols, axis=0)   # (rep·T, T)
            lgcb_wide = jnp.concatenate(lgcb_cols, axis=1)   # (T, rep·T)
            row_all = _mm(lgcb_tall, ones, jnp.float32)          # (rep·T, 1)
            col_all = _mm(lgcb_wide, ones, jnp.float32, _CONTRACT_0)
            for r_i in range(rep):
                rowcol_cols.append(row_all[r_i * T:(r_i + 1) * T]
                                   - col_all[r_i * T:(r_i + 1) * T])

            # group-batched terms
            S = _mm(Bg, wdx[:, lo:hi], mm_dtype, _CONTRACT_0)  # (N, rep·P)
            h_out = e_end_x[0:1, lo:hi] * h_in + S
            gC_g = (_mm(LG_sum, Bg, mm_dtype)
                    + _mm(gy_e[:, lo:hi], h_in, mm_dtype, _CONTRACT_1))
            gB_g = (_mm(LG_sum, Cg, mm_dtype, _CONTRACT_0)
                    + _mm(wdx[:, lo:hi], lam_g, mm_dtype, _CONTRACT_1))
            if fused:
                gB_cols.append(gB_g)
                gC_cols.append(gC_g)
            else:
                gB_ref[0, o:o + T, g * N:(g + 1) * N] = gB_g.astype(
                    gB_ref.dtype)
                gC_ref[0, o:o + T, g * N:(g + 1) * N] = gC_g.astype(
                    gC_ref.dtype)

            # gend (per head, scalar): Σ_{n,p} λ·h_out per head column-block
            gend_row = _hi_mm(
                jnp.sum(lam_g * h_out, axis=0, keepdims=True),
                SELT[lo:hi, :])                                    # (1, H)
            if g == 0:
                gend_all = gend_row
            else:
                gend_all = gend_all + gend_row

            lam_s[:, lo:hi] = (
                e_end_x[0:1, lo:hi] * lam_g
                + _mm(Cg, gy_e[:, lo:hi], mm_dtype, _CONTRACT_0))

        Blam_full = jnp.concatenate(Blam_cols, axis=1)    # (T, H·P)
        Ch_full = jnp.concatenate(Ch_cols, axis=1)
        g_dx = jnp.concatenate(gdx_cols, axis=1) + w_x * Blam_full
        # one stacked per-head reduction instead of four (3T+1 rows):
        # rows [0,T) -> q, [T,2T) -> uterm, [2T,3T) -> Σ_p xf·g_dx,
        # row 3T -> Σ_{t,p} gy·xf (the g_D accumulator term)
        red = _hi_mm(
            jnp.concatenate(
                [gy * Ch_full, dx * Blam_full, xf * g_dx,
                 jnp.sum(gy * xf, axis=0, keepdims=True)], axis=0),
            SELT)                                         # (3T+1, H)
        q = ecum * red[:T]
        uterm = w * red[T:2 * T]
        rowcol = jnp.concatenate(rowcol_cols, axis=1)     # (T, H)
        g_cum = rowcol + q - uterm + onehot * gend_all

        g_a = jax.lax.dot_general(
            McumT, g_cum, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )
        g_dt = A_row * g_a + red[2 * T:3 * T]
        if dt_softplus:
            g_dt = g_dt * (1.0 - jnp.exp(-dt))
        gdt_ref[0, o:o + T] = g_dt.astype(gdt_ref.dtype)

        g_x = dt_x * g_dx + D_x * gy
        if fused:
            # silu + depthwise-conv adjoint, per column piece (x | B | C).
            # Piece-wise avoids a lane-dim concatenate whose operands can
            # carry different sublane offsets (Mosaic rejects that); the
            # conv transpose is per-channel, so pieces are independent.
            # pend_s carries an 8-row block of the neighbor chunk's g_pre
            # toward the chunk processed NEXT in this walk (across chunks
            # AND segment grid steps).
            if _fused_aligned(H, Pd, NG, N):
                # every piece boundary is 128-lane aligned and every
                # operand is offset-{0,0}: one full-width piece (single
                # concat, single conv-transpose pass)
                piece_data = [jnp.concatenate(
                    [g_x] + gB_cols + gC_cols, axis=1)]
            else:
                piece_data = [g_x] + gB_cols + gC_cols
            pieces = [(lo, w, d)
                      for (lo, w), d in zip(piece_bounds, piece_data)]
            for (lo, width, g_piece), p_s in zip(pieces, pend_list):
                hi = lo + width
                pre_p = pre[:, lo:hi]
                sig_p = sig[:, lo:hi]
                g_pre = g_piece * sig_p * (1.0 + pre_p * (1.0 - sig_p))
                cw_p = cw_ref[:, lo:hi]
                if reverse:
                    gext = jnp.concatenate([p_s[...], g_pre], axis=0)
                    p_s[...] = g_pre[T - _HIST_ROWS:]
                    g_raw = _conv_pre(gext, cw_p, None, T, reverse=False,
                                      base=_HIST_ROWS - (K - 1))
                else:
                    gext = jnp.concatenate([g_pre, p_s[...]], axis=0)
                    p_s[...] = g_pre[:_HIST_ROWS]
                    g_raw = _conv_pre(gext, cw_p, None, T, reverse=True,
                                      base=0)
                gx_ref[0, o:o + T, lo:hi] = g_raw.astype(gx_ref.dtype)
                # conv weight/bias grads: dpre[i]/dw[k] = the same ext
                # row the forward tap k read
                for k in range(K):
                    idx = conv_base + ((K - 1 - k) if reverse else k)
                    cacc_s[k:k + 1, lo:hi] = cacc_s[k:k + 1, lo:hi] + \
                        jnp.sum(
                            ext[idx:idx + T, lo:hi].astype(jnp.float32)
                            * g_pre, axis=0, keepdims=True)
                cacc_s[K:K + 1, lo:hi] = cacc_s[K:K + 1, lo:hi] + jnp.sum(
                    g_pre, axis=0, keepdims=True)
        else:
            gx_ref[0, o:o + T, :] = g_x.astype(gx_ref.dtype)

        acc_s[0:1] = acc_s[0:1] + jnp.sum(dt * g_a, axis=0, keepdims=True)
        acc_s[1:2] = acc_s[1:2] + jnp.sum(g_dt, axis=0, keepdims=True)
        acc_s[2:3] = acc_s[2:3] + red[3 * T:]

    gh0_ref[0] = lam_s[...]
    gA_ref[...] = acc_s[0:1]
    gbias_ref[...] = acc_s[1:2]
    gD_ref[...] = acc_s[2:3]
    if fused:
        gcw_ref[...] = cacc_s[:K]
        gcb_ref[...] = cacc_s[K:K + 1]
        if emit_pend:
            # the pend scratch after the LAST grid step (the bwd walk's
            # sequence edge — segment 0 forward, last segment reverse)
            # is the conv-adjoint spillover aimed at the rows BEFORE/
            # AFTER this sequence: the edge_hist gradient a CP neighbor
            # needs. gph_ref's index map pins one block per g, so every
            # grid step overwrites and the final (edge) write survives.
            for (lo, width), p_s in zip(piece_bounds, pend_list):
                gph_ref[0, :, lo:lo + width] = p_s[...]


def ssd_pallas_batched_bwd_impl(
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
    ghN_in = (jnp.zeros((G, N, H * Pd), jnp.float32) if g_hN is None
              else jnp.asarray(g_hN, jnp.float32).transpose(0, 2, 1, 3)
              .reshape(G, N, H * Pd))

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
    st_spec = pl.BlockSpec((1, N, H * Pd), smap, memory_space=pltpu.VMEM)
    car_spec = pl.BlockSpec((1, nci, N, H * Pd), car_map,
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
            jax.ShapeDtypeStruct((G, N, H * Pd), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((N, H * Pd), jnp.float32),  # λ carry
            pltpu.VMEM((3, H), jnp.float32),       # [g_A; g_bias; g_D]
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_p, dt_p, B_p, C_p, A_in, D_in, bias_in, gy_p, carries, ghN_in)
    g_x, g_dt, g_B, g_C, g_A, g_bias, g_D, g_h0 = outs
    g_bias_v = g_bias[0]
    if Lp != L and not dt_softplus:
        g_bias_v = jnp.sum(g_dt[:, :L].astype(jnp.float32), axis=(0, 1))
    return (
        g_x[:, :L].reshape(G, L, H, Pd),
        g_dt[:, :L],
        g_A[0].astype(jnp.asarray(A).dtype),
        g_B[:, :L].reshape(G, L, NG, N),
        g_C[:, :L].reshape(G, L, NG, N),
        g_D[0],
        g_bias_v,
        g_h0.reshape(G, N, H, Pd).transpose(0, 2, 1, 3),
    )


def ssd_pallas_batched_fused_bwd_impl(
    xBC, dt, A, conv_w, conv_b, D, dt_bias, g_y, carries,
    dims,
    dt_softplus: bool,
    reverse: bool,
    T: int,
    nci: int,
    interpret: bool = False,
    g_hN=None,  # (G, H, N, P)
    edge_hist=None,          # (G, 8, Wc) — CP neighbor boundary rows
    need_edge_grad: bool = False,
):
    """Returns (g_xBC, g_dt, g_A, g_cw, g_cb, g_D, g_bias, g_h0[, g_edge])."""
    H, Pd, NG, N = dims
    G, L, Wc = xBC.shape
    K = conv_w.shape[0]
    nc = carries.shape[1]
    nseg = nc // nci
    Ts = T * nci
    Lp = nc * T

    gy3 = g_y.reshape(G, L, H * Pd)
    tensors = [xBC, dt, gy3]
    if L % Ts != 0:
        assert edge_hist is None and not need_edge_grad
        tensors = _pad_ssd(tensors, Lp - L, dt_softplus, dt_bias, H)
    xp, dt_p, gy_p = tensors
    hists = _seg_hists(xp, Ts, K, reverse, edge_hist)

    cw_in = jnp.asarray(conv_w, jnp.float32)
    cb_in = (jnp.zeros((1, Wc), jnp.float32) if conv_b is None
             else jnp.asarray(conv_b, jnp.float32).reshape(1, Wc))
    A_in = jnp.asarray(A, jnp.float32).reshape(1, H)
    D_in = (jnp.zeros((1, H), jnp.float32) if D is None
            else jnp.asarray(D, jnp.float32).reshape(1, H))
    bias_in = (jnp.zeros((1, H), jnp.float32) if dt_bias is None
               else jnp.asarray(dt_bias, jnp.float32).reshape(1, H))
    ghN_in = (jnp.zeros((G, N, H * Pd), jnp.float32) if g_hN is None
              else jnp.asarray(g_hN, jnp.float32).transpose(0, 2, 1, 3)
              .reshape(G, N, H * Pd))

    # bwd walks segments opposite to scan order
    cmap = ((lambda g, i: (g, i, 0)) if reverse
            else (lambda g, i: (g, nseg - 1 - i, 0)))
    hist_map = ((lambda g, i: (g, i, 0, 0)) if reverse
                else (lambda g, i: (g, nseg - 1 - i, 0, 0)))
    car_map = ((lambda g, i: (g, i, 0, 0)) if reverse
               else (lambda g, i: (g, nseg - 1 - i, 0, 0)))
    full2 = lambda g, i: (0, 0)
    smap = lambda g, i: (g, 0, 0)

    xbc_spec = pl.BlockSpec((1, Ts, Wc), cmap, memory_space=pltpu.VMEM)
    gy_spec = pl.BlockSpec((1, Ts, H * Pd), cmap, memory_space=pltpu.VMEM)
    dt_spec = pl.BlockSpec((1, Ts, H), cmap, memory_space=pltpu.VMEM)
    cw_spec = pl.BlockSpec((K, Wc), full2, memory_space=pltpu.VMEM)
    cb_spec = pl.BlockSpec((1, Wc), full2, memory_space=pltpu.VMEM)
    hist_spec = pl.BlockSpec((1, 1, _HIST_ROWS, Wc), hist_map,
                             memory_space=pltpu.VMEM)
    h_spec = pl.BlockSpec((1, H), full2, memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((1, N, H * Pd), smap, memory_space=pltpu.VMEM)
    car_spec = pl.BlockSpec((1, nci, N, H * Pd), car_map,
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _bwd_kernel, T=T, nci=nci, H=H, Pd=Pd, NG=NG, N=N, reverse=reverse,
        dt_softplus=dt_softplus, mm_dtype=xBC.dtype, fused=True, K=K,
        emit_pend=need_edge_grad,
    )
    out_specs = [xbc_spec, dt_spec, h_spec, h_spec, h_spec,
                 cw_spec, cb_spec, st_spec]
    out_shape = [
        jax.ShapeDtypeStruct((G, Lp, Wc), xBC.dtype),
        jax.ShapeDtypeStruct((G, Lp, H), dt.dtype),
        jax.ShapeDtypeStruct((1, H), jnp.float32),
        jax.ShapeDtypeStruct((1, H), jnp.float32),
        jax.ShapeDtypeStruct((1, H), jnp.float32),
        jax.ShapeDtypeStruct((K, Wc), jnp.float32),
        jax.ShapeDtypeStruct((1, Wc), jnp.float32),
        jax.ShapeDtypeStruct((G, N, H * Pd), jnp.float32),
    ]
    if need_edge_grad:
        out_specs.append(pl.BlockSpec((1, _HIST_ROWS, Wc),
                                      lambda g, i: (g, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(
            jax.ShapeDtypeStruct((G, _HIST_ROWS, Wc), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=(G, nseg),
        in_specs=[xbc_spec, dt_spec, cw_spec, cb_spec, hist_spec,
                  h_spec, h_spec, h_spec, gy_spec, car_spec, st_spec],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((N, H * Pd), jnp.float32),   # λ carry
            pltpu.VMEM((3, H), jnp.float32),        # [g_A; g_bias; g_D]
            pltpu.VMEM((K + 1, Wc), jnp.float32),   # [g_w rows; g_b]
            # conv-adjoint pend: one full-width scratch when the piece
            # boundaries are 128-lane aligned, else one per column piece
            # (x, then B and C per group) so concat operands start at
            # lane offset 0 at any N
        ] + ([pltpu.VMEM((_HIST_ROWS, Wc), jnp.float32)]
             if _fused_aligned(H, Pd, NG, N) else
             [pltpu.VMEM((_HIST_ROWS, H * Pd), jnp.float32)]
             + [pltpu.VMEM((_HIST_ROWS, N), jnp.float32)
                for _ in range(2 * NG)]),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, dt_p, cw_in, cb_in, hists, A_in, D_in, bias_in, gy_p, carries,
      ghN_in)
    if need_edge_grad:
        g_xBC, g_dt, g_A, g_bias, g_D, g_cw, g_cb, g_h0, g_pend = outs
    else:
        g_xBC, g_dt, g_A, g_bias, g_D, g_cw, g_cb, g_h0 = outs
    g_bias_v = g_bias[0]
    if Lp != L and not dt_softplus:
        g_bias_v = jnp.sum(g_dt[:, :L].astype(jnp.float32), axis=(0, 1))
    res = (
        g_xBC[:, :L],
        g_dt[:, :L],
        g_A[0].astype(jnp.asarray(A).dtype),
        g_cw,
        g_cb[0],
        g_D[0],
        g_bias_v,
        g_h0.reshape(G, N, H, Pd).transpose(0, 2, 1, 3),
    )
    if not need_edge_grad:
        return res
    # Convert the edge chunk's raw pre-activation spillover (g_pend = the
    # first/last 8 g_pre rows of the sequence-edge chunk) into the
    # gradient of the edge_hist rows via the depthwise conv transpose.
    # Forward conv: pre[i] = Σ_k w[k]·ext[base+i+k] with the history
    # occupying ext[base .. base+K-2] (base = 8-(K-1)), so
    #   g_hist[base+j] = Σ_{k≤j} w[k]·g_pre[j-k]          (j = 0..K-2).
    # Reverse (anti-causal): pre[i] = Σ_k w[k]·ext[i+K-1-k] with history
    # rows ext[T .. T+K-2] and pend = g_pre[T-8:], giving
    #   g_hist[j] = Σ_{k<K-1-j} w[k]·pend[8-(K-1)+j+k]    (j = 0..K-2).
    HB = _HIST_ROWS
    g_edge = jnp.zeros((G, HB, Wc), jnp.float32)
    if reverse:
        for j in range(K - 1):
            acc = jnp.zeros((G, Wc), jnp.float32)
            for k in range(K - 1 - j):
                acc = acc + cw_in[k] * g_pend[:, HB - (K - 1) + j + k]
            g_edge = g_edge.at[:, j].set(acc)
    else:
        base = HB - (K - 1)
        for j in range(K - 1):
            acc = jnp.zeros((G, Wc), jnp.float32)
            for k in range(j + 1):
                acc = acc + cw_in[k] * g_pend[:, j - k]
            g_edge = g_edge.at[:, base + j].set(acc)
    return res + (g_edge,)


# ===========================================================================
# custom_vjp wrappers (interface-compatible with ops/ssd_pallas.py)
# ===========================================================================

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def ssd_pallas_batched_chained(
    x, dt, A, B_mat, C, D, dt_bias, h_init,
    dt_softplus: bool = True,
    reverse: bool = False,
    chunk_size: int = 128,
    interpret: bool = False,
    seg_chunks: int = 8,
):
    """Head-batched chained Pallas SSD scan: returns (y, h_final)."""
    return ssd_pallas_batched_fwd_impl(
        x, dt, A, B_mat, C, D, dt_bias, dt_softplus, reverse, chunk_size,
        interpret, save_carries=False, h_init=h_init, seg_chunks=seg_chunks,
    )


def _chained_fwd(x, dt, A, B_mat, C, D, dt_bias, h_init,
                 dt_softplus, reverse, chunk_size, interpret, seg_chunks):
    y, hN, carries, T, nci = ssd_pallas_batched_fwd_impl(
        x, dt, A, B_mat, C, D, dt_bias, dt_softplus, reverse, chunk_size,
        interpret, save_carries=True, h_init=h_init, seg_chunks=seg_chunks,
    )
    return (y, hN), (x, dt, A, B_mat, C, D, dt_bias, carries, T, nci)


def _chained_bwd(dt_softplus, reverse, chunk_size, interpret, seg_chunks,
                 residuals, g):
    x, dt, A, B_mat, C, D, dt_bias, carries, T, nci = residuals
    g_y, g_hN = g
    (g_x, g_dt, g_A, g_B, g_C, g_D, g_bias, g_h0) = ssd_pallas_batched_bwd_impl(
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


ssd_pallas_batched_chained.defvjp(_chained_fwd, _chained_bwd)


def ssd_pallas_batched(
    x, dt, A, B_mat, C,
    D=None,
    dt_bias=None,
    dt_softplus: bool = False,
    reverse: bool = False,
    chunk_size: int = 128,
    interpret: bool = False,
    h_init=None,
    return_final_state: bool = False,
    seg_chunks: int = 8,
):
    """Drop-in for `ops/ssd_pallas.py ssd_pallas` (head-batched kernels)."""
    if h_init is None:
        G, _, H, Pd = x.shape
        N = B_mat.shape[-1]
        h_init = jnp.zeros((G, H, N, Pd), jnp.float32)
    y, hN = ssd_pallas_batched_chained(
        x, dt, A, B_mat, C, D, dt_bias, h_init,
        dt_softplus, reverse, chunk_size, interpret, seg_chunks,
    )
    if return_final_state:
        return y, hN
    return y


# ===========================================================================
# Fused-conv entry (xBC pre-conv in, conv+SiLU+split inside the kernel)
# ===========================================================================

@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def ssd_pallas_batched_fused_chained(
    xBC, dt, A, conv_w, conv_b, D, dt_bias, h_init,
    dims=None,            # (H, P, NG, N) — required, static
    dt_softplus: bool = True,
    reverse: bool = False,
    chunk_size: int = 128,
    interpret: bool = False,
    seg_chunks: int = 8,
):
    """Fused-conv head-batched chained scan: returns (y, h_final).

    ``xBC`` is the PRE-conv (G, L, H·P + 2·NG·N) tensor; the depthwise
    conv + SiLU + x/B/C split run inside the kernels (fwd and the
    recompute in bwd), so post-conv activations never exist in HBM —
    the memory strategy that lets 131k v2 training fit (`ops/ssd.py`
    fused mode, reference `mamba_ssm` fused path analog). Differentiable
    in xBC, dt, A, conv_w, conv_b, D, dt_bias, h_init."""
    return ssd_pallas_batched_fused_fwd_impl(
        xBC, dt, A, conv_w, conv_b, D, dt_bias, dims, dt_softplus, reverse,
        chunk_size, interpret, save_carries=False, h_init=h_init,
        seg_chunks=seg_chunks,
    )


def _fused_chained_fwd(xBC, dt, A, conv_w, conv_b, D, dt_bias, h_init,
                       dims, dt_softplus, reverse, chunk_size, interpret,
                       seg_chunks):
    y, hN, carries, T, nci = ssd_pallas_batched_fused_fwd_impl(
        xBC, dt, A, conv_w, conv_b, D, dt_bias, dims, dt_softplus, reverse,
        chunk_size, interpret, save_carries=True, h_init=h_init,
        seg_chunks=seg_chunks,
    )
    return (y, hN), (xBC, dt, A, conv_w, conv_b, D, dt_bias, carries, T,
                     nci)


def _fused_chained_bwd(dims, dt_softplus, reverse, chunk_size, interpret,
                       seg_chunks, residuals, g):
    xBC, dt, A, conv_w, conv_b, D, dt_bias, carries, T, nci = residuals
    g_y, g_hN = g
    (g_xBC, g_dt, g_A, g_cw, g_cb, g_D, g_bias, g_h0) = (
        ssd_pallas_batched_fused_bwd_impl(
            xBC, dt, A, conv_w, conv_b, D, dt_bias,
            g_y.astype(xBC.dtype), carries, dims, dt_softplus, reverse,
            T, nci, interpret, g_hN=g_hN,
        ))
    g_cw = g_cw.astype(jnp.asarray(conv_w).dtype).reshape(
        jnp.shape(conv_w))
    if conv_b is None:
        g_cb = None
    else:
        g_cb = g_cb.astype(jnp.asarray(conv_b).dtype).reshape(
            jnp.shape(conv_b))
    if D is None:
        g_D = None
    else:
        g_D = g_D.astype(jnp.asarray(D).dtype).reshape(jnp.shape(D))
    if dt_bias is None:
        g_bias = None
    else:
        g_bias = g_bias.astype(jnp.asarray(dt_bias).dtype).reshape(
            jnp.shape(dt_bias))
    return (g_xBC.astype(xBC.dtype), g_dt.astype(dt.dtype), g_A, g_cw,
            g_cb, g_D, g_bias, g_h0)


ssd_pallas_batched_fused_chained.defvjp(_fused_chained_fwd,
                                        _fused_chained_bwd)


def ssd_pallas_batched_fused(
    xBC, dt, A, conv_w,
    conv_b=None,
    D=None,
    dt_bias=None,
    dims=None,
    dt_softplus: bool = False,
    reverse: bool = False,
    chunk_size: int = 128,
    interpret: bool = False,
    h_init=None,
    return_final_state: bool = False,
    seg_chunks: int = 8,
):
    """Fused-conv drop-in: `ssd_chunked(conv_w=..., dims=...)` semantics
    on the head-batched Pallas kernels."""
    assert dims is not None, "dims=(H, P, NG, N) is required"
    H, Pd, NG, N = dims
    if h_init is None:
        G = xBC.shape[0]
        h_init = jnp.zeros((G, H, N, Pd), jnp.float32)
    y, hN = ssd_pallas_batched_fused_chained(
        xBC, dt, A, conv_w, conv_b, D, dt_bias, h_init,
        tuple(dims), dt_softplus, reverse, chunk_size, interpret,
        seg_chunks,
    )
    if return_final_state:
        return y, hN
    return y


# ===========================================================================
# Context-parallel fused-conv entry: edge_hist is a differentiable operand
# ===========================================================================

@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def ssd_pallas_batched_fused_cp(
    xBC, dt, A, conv_w, conv_b, D, dt_bias, h_init, edge_hist,
    dims=None,            # (H, P, NG, N) — required, static
    dt_softplus: bool = True,
    reverse: bool = False,
    chunk_size: int = 128,
    interpret: bool = False,
    seg_chunks: int = 8,
):
    """Fused-conv chained scan for a CONTEXT-PARALLEL shard.

    Identical to :func:`ssd_pallas_batched_fused_chained` except the
    sequence-edge conv history comes from ``edge_hist`` (G, 8, Wc) — the
    neighbor shard's boundary raw rows (rows BEFORE this shard for the
    forward direction, so only the last K-1 rows are read; rows AFTER it
    for reverse, first K-1 read) — instead of sequence-start zeros, and
    ``edge_hist`` is differentiable: its gradient is the depthwise
    conv-transpose spillover that the neighbor's raw rows receive from
    this shard (`parallel/seq_scan.py sequence_parallel_ssd_fused`
    ppermutes it back and jax's slice transpose adds it into the
    neighbor's g_xBC tail). Returns (y, h_final). Requires the local
    length to be a multiple of chunk_size·seg_chunks (no tail padding:
    padded rows would otherwise sit between the data and the neighbor)."""
    return ssd_pallas_batched_fused_fwd_impl(
        xBC, dt, A, conv_w, conv_b, D, dt_bias, dims, dt_softplus, reverse,
        chunk_size, interpret, save_carries=False, h_init=h_init,
        seg_chunks=seg_chunks, edge_hist=edge_hist,
    )


def _fused_cp_fwd(xBC, dt, A, conv_w, conv_b, D, dt_bias, h_init, edge_hist,
                  dims, dt_softplus, reverse, chunk_size, interpret,
                  seg_chunks):
    y, hN, carries, T, nci = ssd_pallas_batched_fused_fwd_impl(
        xBC, dt, A, conv_w, conv_b, D, dt_bias, dims, dt_softplus, reverse,
        chunk_size, interpret, save_carries=True, h_init=h_init,
        seg_chunks=seg_chunks, edge_hist=edge_hist,
    )
    return (y, hN), (xBC, dt, A, conv_w, conv_b, D, dt_bias, edge_hist,
                     carries, T, nci)


def _fused_cp_bwd(dims, dt_softplus, reverse, chunk_size, interpret,
                  seg_chunks, residuals, g):
    (xBC, dt, A, conv_w, conv_b, D, dt_bias, edge_hist, carries, T,
     nci) = residuals
    g_y, g_hN = g
    (g_xBC, g_dt, g_A, g_cw, g_cb, g_D, g_bias, g_h0, g_edge) = (
        ssd_pallas_batched_fused_bwd_impl(
            xBC, dt, A, conv_w, conv_b, D, dt_bias,
            g_y.astype(xBC.dtype), carries, dims, dt_softplus, reverse,
            T, nci, interpret, g_hN=g_hN, edge_hist=edge_hist,
            need_edge_grad=True,
        ))
    g_cw = g_cw.astype(jnp.asarray(conv_w).dtype).reshape(jnp.shape(conv_w))
    if conv_b is None:
        g_cb = None
    else:
        g_cb = g_cb.astype(jnp.asarray(conv_b).dtype).reshape(
            jnp.shape(conv_b))
    if D is None:
        g_D = None
    else:
        g_D = g_D.astype(jnp.asarray(D).dtype).reshape(jnp.shape(D))
    if dt_bias is None:
        g_bias = None
    else:
        g_bias = g_bias.astype(jnp.asarray(dt_bias).dtype).reshape(
            jnp.shape(dt_bias))
    return (g_xBC.astype(xBC.dtype), g_dt.astype(dt.dtype), g_A, g_cw,
            g_cb, g_D, g_bias, g_h0, g_edge.astype(edge_hist.dtype))


ssd_pallas_batched_fused_cp.defvjp(_fused_cp_fwd, _fused_cp_bwd)
