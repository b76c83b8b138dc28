"""Mamba-2 mixer and BiMamba2 — MXU-resident SSM blocks (beyond reference).

The reference framework cannot express Mamba-2: it pins mamba-ssm
1.2.0.post1 (`caduceus_env.yml:50`), which predates the architecture
(Dao & Gu, arXiv:2405.21060). This module adds it as an additional model
family because on TPU the trade is decisive: Mamba-1's per-(channel, state)
decay forces the scan onto the VPU (the measured headline ceiling — see
PARITY.md "Roofline note"), while Mamba-2's scalar-per-head decay makes the
chunked dual form exact and stable, so the O(L) recurrence runs as batched
(T, T) @ (T, P) matmuls on the MXU (`ops/ssd.py`).

Semantics follow mamba-ssm 2.x ``Mamba2`` (defaults: norm_before_gate=False,
D_has_hdim=False, dt_limit unbounded):

    in_proj:  d_model -> [z (d_inner), xBC (d_inner + 2·NG·N), dt (H)]
    xBC:      depthwise causal conv (d_conv) + SiLU, split into x, B, C
    ssd:      per-head scan with dt = softplus(dt + dt_bias), A = -exp(A_log)
    norm:     gated RMSNorm  y = rmsnorm_groups(y · silu(z)) · w
    out_proj: d_inner -> d_model

``BiMamba2`` mirrors ``BiMamba``'s capability surface (the reference
`BiMambaWrapper` contract, `caduceus/modeling_caduceus.py:87-140`): the four
(weight-tie × combine-strategy) configurations plus ``bidirectional=False``.
Direction-specific parameters are the conv, dt_bias, A_log and D; weight
tying shares in_proj/out_proj/norm across directions, and the reverse
direction never materializes a flipped (G, L, ·) copy (`ops/ssd.py`
``reverse`` flips only transient per-chunk tensors).

Parallelism scope: DP and the Megatron in/out-proj specs apply unchanged.
``context_parallel_axis`` routes the scan through the exact two-pass
sequence-parallel SSD (`parallel/seq_scan.py sequence_parallel_ssd` — the
shard boundary state is (H, N, P) with an analytic per-head decay);
``tensor_parallel_axis`` shard_maps the scan over heads (requires
ngroups=1 so B/C replicate). Both sharded paths honor ``use_kernel``:
"pallas" runs the per-shard local scans through `ops/ssd_pallas.py`
(whose chained VJP implements the h_init/g_hN boundary contract CP needs).
With ``use_kernel='pallas_batched'`` (the TPU default) and CP alone, the
fused-conv kernels run per shard with the conv halo exchanged as one
ppermute of 8 boundary raw rows (`parallel/seq_scan.py
sequence_parallel_ssd_fused`), so >131k CP contexts keep the fused memory
profile; under CP+TP or the other kernels the depthwise conv + split run
as global ops on the sharded activations (XLA inserts halos).

``use_kernel='auto'`` resolves to the Pallas kernels on TPU; they are
gated on-device by `scripts/verify_tpu.py` (Mosaic-compiled fwd/bwd/chained
parity vs the XLA form at production head geometry) in addition to the
interpret-mode tests.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from caduceus_tpu.config import CaduceusConfig
from caduceus_tpu.models.mamba import (
    FrameDense,
    _residual_rescale,
    dt_proj_bias_init,
    torch_linear_init,
)
from caduceus_tpu.ops.ssd import ssd_chunked


def a_log_init_v2(a_min: float, a_max: float):
    """Mamba-2 A init: A ~ Uniform[a_min, a_max] per head, stored as log."""

    def init(key, shape, dtype=jnp.float32):
        a = jax.random.uniform(key, shape, jnp.float32, a_min, a_max)
        return jnp.log(a).astype(dtype)

    return init


def rms_norm_gated(y, z, weight, ngroups: int, eps: float):
    """Mamba-2 RMSNormGated (norm_before_gate=False): rmsnorm(y·silu(z))·w,
    RMS statistics taken per channel-group of size d_inner // ngroups."""
    dtype = y.dtype
    y = y.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
    g = y.reshape(*y.shape[:-1], ngroups, y.shape[-1] // ngroups)
    var = jnp.mean(jnp.square(g), axis=-1, keepdims=True)
    g = g * jax.lax.rsqrt(var + eps)
    y = g.reshape(y.shape) * weight.astype(jnp.float32)
    return y.astype(dtype)


class _DirectionParamsV2(nn.Module):
    """Per-direction Mamba-2 parameters: conv over xBC, dt_bias, A_log, D."""

    cfg: CaduceusConfig

    def setup(self):
        c = self.cfg
        s = c.ssm_cfg
        H = c.nheads
        d_conv_dim = c.d_inner + 2 * s.ngroups * s.d_state
        pdt = jnp.dtype(c.param_dtype)
        self.conv_w = self.param(
            "conv_w", torch_linear_init(s.d_conv), (s.d_conv, d_conv_dim), pdt
        )
        self.conv_b = (
            self.param("conv_b", torch_linear_init(s.d_conv), (d_conv_dim,), pdt)
            if s.conv_bias
            else None
        )
        self.dt_bias = self.param(
            "dt_bias",
            dt_proj_bias_init(s.dt_min, s.dt_max, s.dt_init_floor),
            (H,),
            pdt,
        )
        # A_log / D in fp32 always (same policy as v1: no weight decay, the
        # scan reads them in fp32)
        self.A_log = self.param(
            "A_log", a_log_init_v2(*s.a_init_range), (H,), jnp.float32
        )
        self.D = self.param("D", nn.initializers.ones, (H,), jnp.float32)

    def __call__(self, xBC_raw: jnp.ndarray, dt_raw: jnp.ndarray,
                 reverse: bool) -> jnp.ndarray:
        """conv -> split -> SSD for one direction.

        ``xBC_raw``: (..., L, d_inner + 2·NG·N) pre-conv; ``dt_raw``:
        (..., L, H). Returns the ungated scan output (..., L, d_inner).
        """
        c = self.cfg
        s = c.ssm_cfg
        H, P, NG, N = c.nheads, s.headdim, s.ngroups, s.d_state
        lead = xBC_raw.shape[:-2]
        L = xBC_raw.shape[-2]
        x3 = xBC_raw.reshape((-1, L, xBC_raw.shape[-1]))
        G = x3.shape[0]
        if c.context_parallel_axis or c.tensor_parallel_axis:
            return self._sharded_ssd(x3, dt_raw.reshape(G, L, H), reverse,
                                     lead)
        kernel = self._resolved_kernel()
        if kernel.startswith("pallas_batched"):
            # fused-conv head-batched path: the depthwise conv + SiLU +
            # x/B/C split run INSIDE the kernels, so the post-conv
            # (L, d_inner + 2·NG·N) tensor never exists in HBM — same
            # memory strategy as the XLA fused mode below, now on Pallas
            from caduceus_tpu.ops.ssd_pallas_batched import (
                ssd_pallas_batched_fused)

            y = ssd_pallas_batched_fused(
                x3,
                dt_raw.reshape(G, L, H),
                -jnp.exp(self.A_log),
                self.conv_w,
                conv_b=self.conv_b,
                D=self.D,
                dt_bias=self.dt_bias,
                dims=(H, P, NG, N),
                dt_softplus=True,
                reverse=reverse,
                chunk_size=s.ssd_chunk_size,
                interpret=kernel.endswith("_interpret"),
                seg_chunks=s.ssd_seg_chunks,
            )
            return y.reshape(*lead, L, c.d_inner)
        if kernel.startswith("pallas"):
            # Pallas path: the (T, T) chunk tiles live in VMEM
            # (`ops/ssd_pallas.py`); the conv runs as a global XLA op
            # (transient under remat spans)
            from caduceus_tpu.ops.conv import causal_conv1d
            from caduceus_tpu.ops.ssd_pallas import resolve_ssd_kernel

            ssd_fn, _, interp = resolve_ssd_kernel(kernel)
            xc = causal_conv1d(
                x3, self.conv_w.astype(x3.dtype),
                None if self.conv_b is None else self.conv_b.astype(x3.dtype),
                activation="silu", reverse=reverse,
            )
            y = ssd_fn(
                xc[..., : H * P].reshape(G, L, H, P),
                dt_raw.reshape(G, L, H),
                -jnp.exp(self.A_log),
                xc[..., H * P: H * P + NG * N].reshape(G, L, NG, N),
                xc[..., H * P + NG * N:].reshape(G, L, NG, N),
                D=self.D,
                dt_bias=self.dt_bias,
                dt_softplus=True,
                reverse=reverse,
                chunk_size=s.ssd_chunk_size,
                interpret=interp,
                seg_chunks=s.ssd_seg_chunks,
            )
            return y.reshape(*lead, L, c.d_inner)
        # XLA fused-conv mode: the depthwise conv + SiLU + x/B/C split run
        # inside the scan's checkpointed chunk bodies, so the post-conv
        # (L, d_inner + 2·NG·N) tensor never materializes at full length
        # (required to fit 131k training in 16 GB HBM)
        y = ssd_chunked(
            x3,
            dt_raw.reshape(G, L, H),
            -jnp.exp(self.A_log),
            None,
            None,
            D=self.D,
            dt_bias=self.dt_bias,
            dt_softplus=True,
            reverse=reverse,
            chunk_size=s.ssd_chunk_size,
            seg_chunks=s.ssd_seg_chunks,
            conv_w=self.conv_w.astype(x3.dtype),
            conv_b=(None if self.conv_b is None
                    else self.conv_b.astype(x3.dtype)),
            dims=(H, P, NG, N),
        )
        return y.reshape(*lead, L, c.d_inner)

    def _resolved_kernel(self) -> str:
        use_kernel = self.cfg.ssm_cfg.use_kernel
        if use_kernel == "auto":
            # head-batched kernels (fused-conv on the single-device path)
            # are the measured TPU frontier for v2 — -37% training-step
            # kernel cost vs the per-head kernel at the 131k geometry
            # (PARITY.md r4); on-device gate rows in scripts/verify_tpu.py
            use_kernel = ("xla" if jax.default_backend() == "cpu"
                          else "pallas_batched")
        return use_kernel

    def _sharded_ssd(self, x3: jnp.ndarray, dt3: jnp.ndarray, reverse: bool,
                     lead) -> jnp.ndarray:
        """CP/TP path: conv + x/B/C split as global ops (XLA inserts the
        halo exchange on L-sharded activations, exactly as the v1 `_cp_scan`
        does), then the SSD runs sharded — two-pass sequence-parallel over
        ``context_parallel_axis`` (`parallel/seq_scan.py
        sequence_parallel_ssd`) or per-head shard_map over
        ``tensor_parallel_axis`` (the scan is independent across heads once
        B/C are replicated, which ngroups=1 guarantees)."""
        from caduceus_tpu.ops.conv import causal_conv1d
        from caduceus_tpu.parallel.mesh import get_global_mesh

        c = self.cfg
        s = c.ssm_cfg
        H, P, NG, N = c.nheads, s.headdim, s.ngroups, s.d_state
        G, L = x3.shape[0], x3.shape[1]
        mesh = get_global_mesh()
        assert mesh is not None, (
            "tensor/context_parallel_axis is set but no mesh is registered — "
            "call caduceus_tpu.parallel.mesh.set_global_mesh (or with_mesh)"
        )
        kernel = self._resolved_kernel()
        # the fused per-shard kernels forbid tail padding (padded rows would
        # sit between real data and the CP neighbor's edge_hist rows), so the
        # per-shard length must be segment-aligned; otherwise fall back to
        # the unfused sequence_parallel_ssd path, which pads freely
        fused_cp_ok = False
        if kernel.startswith("pallas_batched") and c.context_parallel_axis:
            n_s = mesh.shape[c.context_parallel_axis]
            if L % n_s == 0:
                L_loc = L // n_s
                T = max(8, -(-min(s.ssd_chunk_size, L_loc) // 8) * 8)
                nci = max(1, min(s.ssd_seg_chunks, -(-L_loc // T)))
                fused_cp_ok = L_loc >= 8 and L_loc % (T * nci) == 0
        # CP×TP composed keeps the fused path via per-head lane ownership
        # (r5; VERDICT r4 weak #5) when the head/group counts split evenly
        # over the TP axis; otherwise (e.g. group-sliced ngroups) fall back
        # to the unfused composed path below.
        fused_tp_ok = not c.tensor_parallel_axis
        if c.tensor_parallel_axis and fused_cp_ok:
            ntp = mesh.shape[c.tensor_parallel_axis]
            fused_tp_ok = H % ntp == 0 and (NG == 1 or NG % ntp == 0)
        if fused_cp_ok and fused_tp_ok and c.context_parallel_axis:
            # fused-conv CP: conv + SiLU + split stay inside the per-shard
            # kernels; the halo is ONE ppermute of 8 boundary raw rows
            # (`parallel/seq_scan.py sequence_parallel_ssd_fused`), so
            # >131k CP contexts keep the fused memory profile — the
            # post-conv (L, d_inner + 2·NG·N) tensor never exists in HBM.
            # TP composes on the same shard_map via per-head lane
            # ownership (head_axis).
            from caduceus_tpu.parallel.seq_scan import (
                sequence_parallel_ssd_fused)

            y = sequence_parallel_ssd_fused(
                x3, dt3, -jnp.exp(self.A_log), self.conv_w,
                conv_b=self.conv_b, D=self.D, dt_bias=self.dt_bias,
                dims=(H, P, NG, N), dt_softplus=True, reverse=reverse,
                mesh=mesh, axis=c.context_parallel_axis,
                head_axis=c.tensor_parallel_axis,
                chunk_size=s.ssd_chunk_size, seg_chunks=s.ssd_seg_chunks,
                interpret=kernel.endswith("_interpret"),
            )
            return y.reshape(*lead, L, c.d_inner)
        xc = causal_conv1d(
            x3, self.conv_w.astype(x3.dtype),
            None if self.conv_b is None else self.conv_b.astype(x3.dtype),
            activation="silu", reverse=reverse,
        )
        xs = xc[..., : H * P].reshape(G, L, H, P)
        Bm = xc[..., H * P: H * P + NG * N].reshape(G, L, NG, N)
        Cm = xc[..., H * P + NG * N:].reshape(G, L, NG, N)
        A = -jnp.exp(self.A_log)

        if c.context_parallel_axis:
            from caduceus_tpu.parallel.seq_scan import sequence_parallel_ssd

            # CP, optionally composed with TP: head_axis additionally shards
            # H (and, when NG divides evenly, NG) inside the same shard_map
            y = sequence_parallel_ssd(
                xs, dt3, A, Bm, Cm, D=self.D, dt_bias=self.dt_bias,
                dt_softplus=True, reverse=reverse, mesh=mesh,
                axis=c.context_parallel_axis, chunk_size=s.ssd_chunk_size,
                seg_chunks=s.ssd_seg_chunks, local_impl=kernel,
                head_axis=c.tensor_parallel_axis,
            )
        else:
            from jax import lax as _lax
            from jax.sharding import PartitionSpec as Pt

            from caduceus_tpu.parallel.mesh import shard_map_compat

            ax = c.tensor_parallel_axis
            ntp = mesh.shape[ax]
            assert H % ntp == 0, f"nheads {H} not divisible by TP axis {ntp}"
            # B/C group layout per shard (heads are contiguous per group, so
            # H % ntp == 0 keeps shard boundaries group-aligned):
            #  - NG % ntp == 0: shard the NG axis too — zero B/C duplication
            #  - ntp % NG == 0: each shard's heads lie inside ONE group —
            #    replicate B/C and slice that group out locally
            if NG % ntp == 0:
                bc_spec, slice_group = Pt(None, None, ax, None), False
            else:
                assert ntp % NG == 0, (
                    f"ngroups {NG} and TP degree {ntp} must divide one "
                    f"another (group-aligned head shards)")
                bc_spec, slice_group = Pt(None, None, None, None), True

            if kernel.startswith("pallas"):
                from caduceus_tpu.ops.ssd_pallas import resolve_ssd_kernel
                import functools as _ft

                _fn, _, _interp = resolve_ssd_kernel(kernel)
                _ssd = _ft.partial(_fn, interpret=_interp)
            else:
                _ssd = ssd_chunked

            def call(x_, dt_, A_, D_, bias_, B_, C_):
                if slice_group:
                    g = (_lax.axis_index(ax) * NG) // ntp
                    B_ = _lax.dynamic_slice_in_dim(B_, g, 1, axis=2)
                    C_ = _lax.dynamic_slice_in_dim(C_, g, 1, axis=2)
                return _ssd(
                    x_, dt_, A_, B_, C_, D=D_, dt_bias=bias_,
                    dt_softplus=True, reverse=reverse,
                    chunk_size=s.ssd_chunk_size, seg_chunks=s.ssd_seg_chunks,
                )

            h4 = Pt(None, None, ax, None)
            h3 = Pt(None, None, ax)
            y = shard_map_compat(
                call, mesh,
                in_specs=(h4, h3, Pt(ax), Pt(ax), Pt(ax), bc_spec, bc_spec),
                out_specs=h4,
            )(xs, dt3, A, self.D, self.dt_bias, Bm, Cm)
        return y.reshape(*lead, L, c.d_inner)


def _split_zxbcdt(c: CaduceusConfig, zxbcdt: jnp.ndarray):
    s = c.ssm_cfg
    d_xbc = c.d_inner + 2 * s.ngroups * s.d_state
    return jnp.split(zxbcdt, [c.d_inner, c.d_inner + d_xbc], axis=-1)


class Mamba2Mixer(nn.Module):
    """Unidirectional Mamba-2 mixer (mamba-ssm 2.x ``Mamba2`` semantics)."""

    cfg: CaduceusConfig
    frame_conjugate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        s = c.ssm_cfg
        dtype = jnp.dtype(c.dtype)
        pdt = jnp.dtype(c.param_dtype)
        x = x.astype(dtype)
        conj = self.frame_conjugate
        d_in_proj = 2 * c.d_inner + 2 * s.ngroups * s.d_state + c.nheads
        in_proj = FrameDense(
            d_in_proj, use_bias=s.bias,
            kernel_init=torch_linear_init(c.d_model),
            param_dtype=pdt, dtype=dtype, flip_in=conj, name="in_proj",
        )
        out_proj = FrameDense(
            c.d_model, use_bias=s.bias,
            kernel_init=torch_linear_init(c.d_inner, scale=_residual_rescale(c)),
            param_dtype=pdt, dtype=dtype, flip_out=conj, name="out_proj",
        )
        norm_w = self.param("norm_w", nn.initializers.ones, (c.d_inner,), pdt)
        z, xBC_raw, dt_raw = _split_zxbcdt(c, in_proj(x))
        y = _DirectionParamsV2(c, name="fwd")(xBC_raw, dt_raw, reverse=conj)
        y = rms_norm_gated(y, z, norm_w, s.ngroups, c.norm_epsilon)
        return out_proj(y)


class BiMamba2(nn.Module):
    """Bidirectional Mamba-2 with structural weight sharing (the
    `BiMambaWrapper` capability surface on the v2 mixer)."""

    cfg: CaduceusConfig
    frame_conjugate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        conj = self.frame_conjugate
        if not c.bidirectional:
            return Mamba2Mixer(c, conj, name="mamba_fwd")(x)
        s = c.ssm_cfg
        dtype = jnp.dtype(c.dtype)
        pdt = jnp.dtype(c.param_dtype)
        x = x.astype(dtype)
        tied = c.bidirectional_weight_tie
        strategy = c.bidirectional_strategy
        # frame conjugation (see CaduceusBlock / models/mamba.py BiMamba):
        # d_model-channel flips on the projections, direction swap on scans
        rev_f = conj
        rev_r = not conj

        d_in_proj = 2 * c.d_inner + 2 * s.ngroups * s.d_state + c.nheads

        def dense(feats, fan_in, scale, name, flip_in=False, flip_out=False):
            return FrameDense(
                feats, use_bias=s.bias,
                kernel_init=torch_linear_init(fan_in, scale=scale),
                param_dtype=pdt, dtype=dtype,
                flip_in=flip_in, flip_out=flip_out, name=name,
            )

        rescale = _residual_rescale(c)
        in_proj = dense(d_in_proj, c.d_model, 1.0, "in_proj", flip_in=conj)
        out_proj = dense(c.d_model, c.d_inner, rescale, "out_proj",
                         flip_out=conj)
        norm_w = self.param("norm_w", nn.initializers.ones, (c.d_inner,), pdt)

        fwd = _DirectionParamsV2(c, name="fwd")
        rev = _DirectionParamsV2(c, name="rev")

        def gated(y, z):
            return rms_norm_gated(y, z, norm_w, s.ngroups, c.norm_epsilon)

        if tied:
            z, xBC_raw, dt_raw = _split_zxbcdt(c, in_proj(x))
            y_f = fwd(xBC_raw, dt_raw, reverse=rev_f)
            y_r = rev(xBC_raw, dt_raw, reverse=rev_r)
            if strategy == "add":
                # directional scan outputs combine pre-gate (the v1
                # fused-add contract): one gated norm, one out_proj
                return out_proj(gated(y_f + y_r, z))
            # ew_multiply with shared norm/out_proj weights
            return out_proj(gated(y_f, z)) * out_proj(gated(y_r, z))

        in_proj_rev = dense(d_in_proj, c.d_model, 1.0, "in_proj_rev",
                            flip_in=conj)
        out_proj_rev = dense(c.d_model, c.d_inner, rescale, "out_proj_rev",
                             flip_out=conj)
        norm_w_rev = self.param(
            "norm_w_rev", nn.initializers.ones, (c.d_inner,), pdt
        )
        z_f, xBC_f, dt_f = _split_zxbcdt(c, in_proj(x))
        z_r, xBC_r, dt_r = _split_zxbcdt(c, in_proj_rev(x))
        y_f = fwd(xBC_f, dt_f, reverse=rev_f)
        y_r = rev(xBC_r, dt_r, reverse=rev_r)
        o_f = out_proj(gated(y_f, z_f))
        o_r = out_proj_rev(
            rms_norm_gated(y_r, z_r, norm_w_rev, s.ngroups, c.norm_epsilon)
        )
        if strategy == "add":
            return o_f + o_r
        return o_f * o_r
