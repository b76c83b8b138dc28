"""Sequence-parallel (context-parallel) selective scan.

SURVEY.md §5.7 stretch goal: the reference reaches 131k tokens on a single
device (linear-time scan); true context parallelism is absent there. The
scan's associativity makes it cheap on TPU: shard the sequence axis across
the mesh, run the local scan per shard, and compose shard boundary states
with one tiny collective.

Algorithm (two-pass, exact):
1. local pass: each shard s computes its scan from h=0, giving y0_s and the
   shard-final state b_s = h_final(h0=0); the shard's total decay is
   analytic: A_prod_s = exp(A ⊙ sum_t delta[t])  (no extra scan needed);
2. boundary exchange: an exclusive associative scan over the n_s shard
   summaries ((d,N)-sized — bytes, not activations) gives each shard its
   true incoming state h0_s; implemented with `lax.all_gather` over the
   sequence axis + a tiny unrolled combine (n_s is the mesh axis size);
3. correction pass: re-run the local scan with h_init = h0_s.

Cost: 2× local scan compute; communication is O(n_s · d · N) bytes — this
trades FLOPs for memory capacity/bandwidth, exactly the right trade when a
single chip cannot hold the sequence. Fully differentiable: every op here
has an exact transpose (the chained Pallas kernel's VJP consumes g_hN and
emits dL/dh0, so shard-boundary adjoints chain exactly); grad parity vs the
single-device scan is tested on the 8-dev mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.6
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from caduceus_tpu.ops.selective_scan import _resolve_delta, selective_scan


def sequence_parallel_scan(
    u: jnp.ndarray,      # (G, L, d) — L sharded over `axis`
    delta: jnp.ndarray,
    A: jnp.ndarray,      # (d, N) replicated
    B_mat: jnp.ndarray,
    C: jnp.ndarray,
    D: Optional[jnp.ndarray] = None,
    z: Optional[jnp.ndarray] = None,
    delta_bias: Optional[jnp.ndarray] = None,
    delta_softplus: bool = False,
    reverse: bool = False,
    *,
    mesh: Mesh,
    axis: str = "data",
    chunk_size: int = 256,
    group_block: int = 8,  # pallas local scans: G-tile (see scan_pallas.py)
    local_impl: str = "xla",  # "xla" | "pallas" | "pallas_interpret"
) -> jnp.ndarray:
    """Exact selective scan with the sequence axis sharded over `axis`.

    ``local_impl="pallas"`` runs each shard's local scans through the
    chained Pallas kernel (`ops/scan_pallas.py selective_scan_pallas_chained`
    — explicit entry state in, final state out, exact dL/dh boundary
    adjoints), so context parallelism runs at kernel speed on TPU.
    """
    n_s = mesh.shape[axis]
    G, L, d = u.shape
    N = A.shape[-1]
    assert L % n_s == 0, f"L={L} not divisible by mesh axis {axis}={n_s}"

    seq_spec = P(None, axis, None)
    rep = P()

    def _varying(x):
        # under shard_map, constants created inside the body are "unvarying"
        # over the mesh axis; scan carries must match the (varying) outputs.
        if hasattr(lax, "pcast"):
            return lax.pcast(x, (axis,), to="varying")
        if hasattr(lax, "pvary"):
            return lax.pvary(x, (axis,))
        return x

    # parameters enter through in_specs as replicated operands (NOT closure
    # capture: a committed param sharding inside the Manual shard_map mesh
    # context trips mesh-consistency checks on newer jax)
    def local(u_l, delta_l, B_l, C_l, z_l, A, D, delta_bias):
        idx = lax.axis_index(axis)
        zero_h = _varying(jnp.zeros((G, d, N), jnp.float32))
        use_pallas = local_impl.startswith("pallas")
        if use_pallas:
            from caduceus_tpu.ops.scan_pallas import (
                selective_scan_pallas_chained,
            )

            interp = local_impl == "pallas_interpret"

            def local_scan(h0, with_outputs):
                # pallas state layout is (G, N, d); seq_scan carries (G, d, N)
                y, hN = selective_scan_pallas_chained(
                    u_l, delta_l, A, B_l, C_l,
                    D if with_outputs else None, delta_bias,
                    jnp.swapaxes(h0, 1, 2),
                    delta_softplus, reverse, chunk_size, group_block, interp,
                )
                return y, jnp.swapaxes(hN, 1, 2)
        else:
            def local_scan(h0, with_outputs):
                return selective_scan(
                    u_l, delta_l, A, B_l, C_l,
                    D=D if with_outputs else None, z=None,
                    delta_bias=delta_bias, delta_softplus=delta_softplus,
                    reverse=reverse, chunk_size=chunk_size,
                    return_final_state=True, h_init=h0,
                )

        # pass 1: local scan from zero state + final state
        y0, b_s = local_scan(zero_h, with_outputs=False)
        del y0  # only the boundary state is needed from pass 1
        # analytic total decay of this shard: exp(A ⊙ Σ_t delta)
        dsum = jnp.sum(
            _resolve_delta(delta_l, delta_bias, delta_softplus), axis=1
        )  # (G, d)
        A_prod = jnp.exp(dsum[..., None] * A.astype(jnp.float32)[None])  # (G,d,N)

        # boundary exchange: gather all shard summaries ((d,N)-sized), then
        # build the running state in scan order (reverse flips shard order)
        # and select this shard's incoming state — an exclusive prefix scan
        # unrolled over the (small) mesh axis.
        a_all = lax.all_gather(A_prod, axis)  # (n_s, G, d, N)
        b_all = lax.all_gather(b_s, axis)
        order = range(n_s - 1, -1, -1) if reverse else range(n_s)
        h_run = jnp.zeros_like(b_s)
        my_h0 = jnp.zeros_like(b_s)
        for s in order:
            my_h0 = jnp.where(idx == s, h_run, my_h0)
            h_run = a_all[s] * h_run + b_all[s]

        # pass 2: exact local scan with the true incoming state
        if use_pallas:
            y, _ = local_scan(my_h0, with_outputs=True)
            if z is not None:
                zf = z_l.astype(jnp.float32)
                y = (y.astype(jnp.float32) * (zf * jax.nn.sigmoid(zf))).astype(
                    y.dtype
                )
            return y
        y = selective_scan(
            u_l, delta_l, A, B_l, C_l, D=D, z=z_l if z is not None else None,
            delta_bias=delta_bias, delta_softplus=delta_softplus,
            reverse=reverse, chunk_size=chunk_size, h_init=my_h0,
        )
        return y

    z_in = z if z is not None else jnp.zeros((G, L, d), u.dtype)
    D_in = jnp.zeros((d,), jnp.float32) if D is None else D
    bias_in = (jnp.zeros((d,), jnp.float32) if delta_bias is None
               else delta_bias)
    has_D, has_bias = D is not None, delta_bias is not None
    from caduceus_tpu.parallel.mesh import shard_map_compat

    fn = shard_map_compat(
        lambda u_l, delta_l, B_l, C_l, z_l, A_, D_, b_: local(
            u_l, delta_l, B_l, C_l, z_l, A_,
            D_ if has_D else None, b_ if has_bias else None),
        mesh,
        in_specs=(seq_spec, seq_spec, P(None, axis, None), P(None, axis, None),
                  seq_spec, rep, rep, rep),
        out_specs=seq_spec,
    )
    return fn(u, delta, B_mat, C, z_in, A, D_in, bias_in)


def sequence_parallel_ssd(
    x: jnp.ndarray,      # (G, L, H, P) — L sharded over `axis`
    dt: jnp.ndarray,     # (G, L, H)
    A: jnp.ndarray,      # (H,) replicated, negative
    B_mat: jnp.ndarray,  # (G, L, NG, N)
    C: jnp.ndarray,      # (G, L, NG, N)
    D: Optional[jnp.ndarray] = None,
    dt_bias: Optional[jnp.ndarray] = None,
    dt_softplus: bool = False,
    reverse: bool = False,
    *,
    mesh: Mesh,
    axis: str = "data",
    chunk_size: int = 256,
    seg_chunks: int = 8,
    local_impl: str = "xla",  # "xla" | "pallas" | "pallas_interpret"
    head_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Exact Mamba-2 (SSD) scan with the sequence axis sharded over `axis`.

    The same two-pass construction as :func:`sequence_parallel_scan`, on the
    v2 recurrence (`ops/ssd.py`): the shard's total decay is analytic and
    *per head* — ``exp(A[h] · Σ_t dt[t,h])`` broadcast over (N, P) — so the
    boundary exchange moves one (G, H) decay plus the (G, H, N, P) shard
    state per shard. ``local_impl="pallas"`` runs both local passes through
    the chained Pallas kernel (`ops/ssd_pallas.py ssd_pallas_chained` —
    built for exactly this h_init/g_hN boundary contract); "xla" runs the
    MXU-chunked dual form.

    ``head_axis`` composes tensor parallelism with CP in the SAME
    shard_map: the H (and, when NG divides evenly, NG) axes additionally
    shard over that mesh axis. The two-pass body is unchanged — every
    operation is per-head independent and all collectives name ``axis``
    only — so the composition is purely a sharding-spec change.
    """
    from caduceus_tpu.ops.ssd import _resolve_dt, ssd_chunked

    n_s = mesh.shape[axis]
    G, L, H, P_hd = x.shape
    assert L % n_s == 0, f"L={L} not divisible by mesh axis {axis}={n_s}"
    N = B_mat.shape[-1]
    NG = B_mat.shape[-2]

    ntp = 1
    if head_axis is not None:
        ntp = mesh.shape[head_axis]
        assert head_axis != axis, "head_axis must differ from the CP axis"
        assert H % ntp == 0, f"nheads {H} not divisible by {head_axis}={ntp}"
        assert NG == 1 or NG % ntp == 0, (
            f"ngroups {NG} must be 1 (B/C replicated per head shard) or a "
            f"multiple of {head_axis}={ntp} (group-aligned head shards)")
    h_ax = head_axis  # None replicates
    g_ax = head_axis if (head_axis and NG % ntp == 0 and NG > 1) else None
    seq4 = P(None, axis, h_ax, None)
    seq3 = P(None, axis, h_ax)
    bc4 = P(None, axis, g_ax, None)
    par1 = P(h_ax)  # per-head (H,) parameters
    H_loc = H // ntp

    def _varying(t):
        if hasattr(lax, "pcast"):
            return lax.pcast(t, (axis,), to="varying")
        if hasattr(lax, "pvary"):
            return lax.pvary(t, (axis,))
        return t

    if local_impl.startswith("pallas"):
        from caduceus_tpu.ops.ssd_pallas import resolve_ssd_kernel

        _fn, _, _interp = resolve_ssd_kernel(local_impl)
        local_scan = partial(_fn, interpret=_interp)
    else:
        local_scan = ssd_chunked

    # parameters enter through in_specs as replicated operands (NOT closure
    # capture — see sequence_parallel_scan)
    def local(x_l, dt_l, B_l, C_l, A, D, dt_bias):
        idx = lax.axis_index(axis)
        zero_h = _varying(jnp.zeros((G, H_loc, N, P_hd), jnp.float32))

        # pass 1: local scan from zero state — only the final state is used
        y0, b_s = local_scan(
            x_l, dt_l, A, B_l, C_l, D=None, dt_bias=dt_bias,
            dt_softplus=dt_softplus, reverse=reverse, chunk_size=chunk_size,
            seg_chunks=seg_chunks, h_init=zero_h, return_final_state=True,
        )
        del y0

        # analytic per-head total decay of this shard: exp(A_h · Σ_t dt)
        dsum = jnp.sum(_resolve_dt(dt_l, dt_bias, dt_softplus), axis=1)  # (G,H)
        A_prod = jnp.exp(dsum * A.astype(jnp.float32)[None])[..., None, None]

        a_all = lax.all_gather(A_prod, axis)  # (n_s, G, H, 1, 1)
        b_all = lax.all_gather(b_s, axis)     # (n_s, G, H, N, P)
        order = range(n_s - 1, -1, -1) if reverse else range(n_s)
        h_run = jnp.zeros_like(b_s)
        my_h0 = jnp.zeros_like(b_s)
        for s in order:
            my_h0 = jnp.where(idx == s, h_run, my_h0)
            h_run = a_all[s] * h_run + b_all[s]

        # pass 2: exact local scan with the true incoming state
        return local_scan(
            x_l, dt_l, A, B_l, C_l, D=D, dt_bias=dt_bias,
            dt_softplus=dt_softplus, reverse=reverse, chunk_size=chunk_size,
            seg_chunks=seg_chunks, h_init=my_h0,
        )

    from caduceus_tpu.parallel.mesh import shard_map_compat

    D_in = jnp.zeros((H,), jnp.float32) if D is None else D
    bias_in = jnp.zeros((H,), jnp.float32) if dt_bias is None else dt_bias
    has_D, has_bias = D is not None, dt_bias is not None
    fn = shard_map_compat(
        lambda x_l, dt_l, B_l, C_l, A_, D_, b_: local(
            x_l, dt_l, B_l, C_l, A_,
            D_ if has_D else None, b_ if has_bias else None),
        mesh,
        in_specs=(seq4, seq3, bc4, bc4, par1, par1, par1),
        out_specs=seq4,
    )
    return fn(x, dt, B_mat, C, A, D_in, bias_in)


def sequence_parallel_ssd_fused(
    xBC: jnp.ndarray,    # (G, L, H·P + 2·NG·N) PRE-conv — L sharded
    dt: jnp.ndarray,     # (G, L, H)
    A: jnp.ndarray,      # (H,) replicated, negative
    conv_w: jnp.ndarray,  # (K, Wc)
    conv_b: Optional[jnp.ndarray] = None,
    D: Optional[jnp.ndarray] = None,
    dt_bias: Optional[jnp.ndarray] = None,
    dims=None,           # (H, P, NG, N) — required, static
    dt_softplus: bool = False,
    reverse: bool = False,
    *,
    mesh: Mesh,
    axis: str = "data",
    chunk_size: int = 128,
    seg_chunks: int = 8,
    interpret: bool = False,
    head_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Fused-conv context-parallel SSD: conv + SiLU + x/B/C split run
    INSIDE the per-shard Pallas kernels, with the cross-shard conv halo
    exchanged as ONE ppermute of 8 boundary raw rows.

    The unfused CP path (:func:`sequence_parallel_ssd`) runs the
    depthwise conv as a global XLA op on L-sharded activations, which
    materializes the post-conv (L, H·P + 2·NG·N) tensor in HBM — the
    exact working-set the fused kernels exist to kill (it is what pushed
    single-chip 131k v2 training out of 16 GB). Here each shard's kernels
    see the true history via ``edge_hist`` (the neighbor's boundary rows;
    `ops/ssd_pallas_batched.py ssd_pallas_batched_fused_cp`), so >131k
    contexts get the fused memory profile too. The boundary-state
    exchange is the same exact two-pass construction as
    :func:`sequence_parallel_ssd` (analytic per-head shard decay);
    gradients are exact — the edge_hist cotangent (the conv-transpose
    spillover into the neighbor's rows) rides the ppermute transpose back
    into the neighbor's g_xBC.

    Requires the per-shard length to be a multiple of
    ``chunk_size·seg_chunks`` (no tail padding between shards) and ≥ 8
    rows.

    ``head_axis`` (r5) composes tensor parallelism on the SAME shard_map
    via per-head LANE OWNERSHIP: the raw xBC stream is split back into its
    x / B / C lane groups outside the shard_map, each TP shard receives
    the x lanes (and conv-filter taps) of its own H/ntp heads plus the
    B/C lanes of its groups (replicated when ngroups == 1, group-sharded
    when ntp divides ngroups), re-concatenates them locally, and runs the
    SAME fused kernels at dims=(H/ntp, P, NG_loc, N). The depthwise conv
    is per-lane independent, so slicing its taps with the lanes is exact;
    when B/C are replicated their conv is recomputed per TP shard (2·N
    lanes — noise next to the H/ntp·P x lanes). This keeps the fused
    memory profile in CP×TP composed runs: the post-conv tensor still
    never exists in HBM (VERDICT r4 weak #5).
    """
    from caduceus_tpu.ops.ssd import _resolve_dt
    from caduceus_tpu.ops.ssd_pallas_batched import (
        _HIST_ROWS, ssd_pallas_batched_fused_cp)

    assert dims is not None, "dims=(H, P, NG, N) is required"
    H, Pd, NG, N = dims
    n_s = mesh.shape[axis]
    G, L, Wc = xBC.shape
    assert Wc == H * Pd + 2 * NG * N, (xBC.shape, dims)
    assert L % n_s == 0, f"L={L} not divisible by mesh axis {axis}={n_s}"
    L_loc = L // n_s
    assert L_loc >= _HIST_ROWS, (L_loc,)

    ntp = 1
    if head_axis is not None:
        ntp = mesh.shape[head_axis]
        assert head_axis != axis, "head_axis must differ from the CP axis"
        assert H % ntp == 0, f"nheads {H} not divisible by {head_axis}={ntp}"
        assert NG == 1 or NG % ntp == 0, (
            f"ngroups {NG} must be 1 (B/C replicated per head shard) or a "
            f"multiple of {head_axis}={ntp} (group-aligned head shards)")
    H_loc = H // ntp
    shard_grp = head_axis is not None and NG > 1 and NG % ntp == 0
    NG_loc = NG // ntp if shard_grp else NG

    def _varying(t):
        if hasattr(lax, "pcast"):
            return lax.pcast(t, (axis,), to="varying")
        if hasattr(lax, "pvary"):
            return lax.pvary(t, (axis,))
        return t

    def two_pass(xbc_l, dt_l, A_, cw, cb, D_, bias_):
        """Per-shard body shared by the plain-CP and CP×TP paths; operand
        shapes are local: xbc_l (G, L_loc, H_loc·P + 2·NG_loc·N)."""
        idx = lax.axis_index(axis)
        HB = _HIST_ROWS
        # one halo ppermute of the 8 boundary raw rows; shards with no
        # source (the sequence edge) receive ppermute's fill of zeros —
        # exactly the sequence-start history the kernel's zero edge means
        if reverse:
            rows = xbc_l[:, :HB]
            perm = [(s + 1, s) for s in range(n_s - 1)]
        else:
            rows = xbc_l[:, -HB:]
            perm = [(s, s + 1) for s in range(n_s - 1)]
        edge = lax.ppermute(rows, axis, perm)

        kw = dict(dims=(H_loc, Pd, NG_loc, N), dt_softplus=dt_softplus,
                  reverse=reverse, chunk_size=chunk_size,
                  interpret=interpret, seg_chunks=seg_chunks)
        zero_h = _varying(jnp.zeros((G, H_loc, N, Pd), jnp.float32))

        # pass 1: local scan from zero state — only the final state is used
        _, b_s = ssd_pallas_batched_fused_cp(
            xbc_l, dt_l, A_, cw, cb, None, bias_, zero_h, edge, **kw)

        # analytic per-head total decay of this shard: exp(A_h · Σ_t dt)
        dsum = jnp.sum(_resolve_dt(dt_l, bias_, dt_softplus), axis=1)
        A_prod = jnp.exp(dsum * A_.astype(jnp.float32)[None])[..., None, None]

        a_all = lax.all_gather(A_prod, axis)  # (n_s, G, H_loc, 1, 1)
        b_all = lax.all_gather(b_s, axis)     # (n_s, G, H_loc, N, P)
        order = range(n_s - 1, -1, -1) if reverse else range(n_s)
        h_run = jnp.zeros_like(b_s)
        my_h0 = jnp.zeros_like(b_s)
        for s in order:
            my_h0 = jnp.where(idx == s, h_run, my_h0)
            h_run = a_all[s] * h_run + b_all[s]

        # pass 2: exact local scan with the true incoming state
        y, _ = ssd_pallas_batched_fused_cp(
            xbc_l, dt_l, A_, cw, cb, D_, bias_, my_h0, edge, **kw)
        return y

    from caduceus_tpu.parallel.mesh import shard_map_compat

    cb_in = jnp.zeros((Wc,), jnp.float32) if conv_b is None else conv_b
    D_in = jnp.zeros((H,), jnp.float32) if D is None else D
    bias_in = jnp.zeros((H,), jnp.float32) if dt_bias is None else dt_bias
    has_cb, has_D, has_bias = (conv_b is not None, D is not None,
                               dt_bias is not None)

    if ntp == 1:
        seq3 = P(None, axis, None)
        par1 = P()
        fn = shard_map_compat(
            lambda x_l, dt_l, A_, cw, cb, D_, b_: two_pass(
                x_l, dt_l, A_, cw,
                cb if has_cb else None,
                D_ if has_D else None,
                b_ if has_bias else None),
            mesh,
            in_specs=(seq3, seq3, par1, par1, par1, par1, par1),
            out_specs=P(None, axis, None, None),
        )
        return fn(xBC, dt, A, conv_w, cb_in, D_in, bias_in)

    # --- CP×TP composed: split the lane groups so head_axis can own them
    xw, bw = H * Pd, NG * N
    x3, B3, C3 = xBC[..., :xw], xBC[..., xw:xw + bw], xBC[..., xw + bw:]
    cwx, cwB, cwC = conv_w[:, :xw], conv_w[:, xw:xw + bw], conv_w[:, xw + bw:]
    cbx, cbB, cbC = cb_in[:xw], cb_in[xw:xw + bw], cb_in[xw + bw:]
    g_ax = head_axis if shard_grp else None
    lane_x = P(None, axis, head_axis)
    lane_bc = P(None, axis, g_ax)
    parH = P(head_axis)

    def local_tp(x_l, B_l, C_l, dt_l, A_, cwx_l, cwB_l, cwC_l,
                 cbx_l, cbB_l, cbC_l, D_, b_):
        xbc_l = jnp.concatenate([x_l, B_l, C_l], axis=-1)
        cw_l = jnp.concatenate([cwx_l, cwB_l, cwC_l], axis=-1)
        cb_l = (jnp.concatenate([cbx_l, cbB_l, cbC_l])
                if has_cb else None)
        return two_pass(xbc_l, dt_l, A_, cw_l, cb_l,
                        D_ if has_D else None, b_ if has_bias else None)

    fn = shard_map_compat(
        local_tp,
        mesh,
        in_specs=(lane_x, lane_bc, lane_bc, P(None, axis, head_axis),
                  parH, P(None, head_axis), P(None, g_ax), P(None, g_ax),
                  parH, P(g_ax), P(g_ax), parH, parH),
        out_specs=P(None, axis, head_axis, None),
    )
    return fn(x3, B3, C3, dt, A, cwx, cwB, cwC, cbx, cbB, cbC,
              D_in, bias_in)
