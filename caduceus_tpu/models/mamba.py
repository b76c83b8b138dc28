"""Mamba mixer and BiMamba (bidirectional Mamba) — TPU-native.

Re-designs the reference stack `BiMambaWrapper(Mamba)` — see
`caduceus/modeling_caduceus.py:87-140` wrapping mamba-ssm 1.2.0's `Mamba`
module (`mamba_simple.py`) — as a single fused module:

- one input projection evaluated once when directions share weights
  (`bidirectional_weight_tie`, reference ties post-hoc at
  `modeling_caduceus.py:114-118`; here the sharing is structural);
- the reverse direction never materializes `x.flip(1)` — the conv and scan
  take a ``reverse`` flag (index arithmetic, cf. SURVEY.md §7.3);
- with the "add" combine and tied projections, the SiLU gate and the output
  projection are applied once to the *sum* of directional scan outputs
  (algebraically identical: W(y_f·s(z)) + W(y_r·s(z)) = W((y_f+y_r)·s(z))),
  halving out-projection FLOPs vs the reference.

Parameter initializers reproduce the reference's torch init distributions
(mamba-ssm `Mamba.__init__` + GPT-2 residual rescale at
`caduceus/modeling_caduceus.py:325-341`) so loss trajectories are comparable.
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from caduceus_tpu.config import CaduceusConfig
from caduceus_tpu.ops.conv import causal_conv1d
from caduceus_tpu.ops.selective_scan import selective_scan

# Pallas kernel launch geometry (bench-sweepable)
_SCAN_CHUNK = int(os.environ.get("CADUCEUS_SCAN_CHUNK", 128))
_SCAN_GB = int(os.environ.get("CADUCEUS_SCAN_GROUP_BLOCK", 8))


# ---------------------------------------------------------------------------
# Initializers matching torch defaults used by the reference
# ---------------------------------------------------------------------------

def torch_linear_init(fan_in: int, scale: float = 1.0):
    """torch nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""
    bound = scale / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def dt_proj_kernel_init(dt_rank: int, dt_init: str, dt_scale: float):
    """mamba-ssm dt_proj weight init (`mamba_simple.py`)."""
    std = dt_rank**-0.5 * dt_scale
    if dt_init == "constant":
        return nn.initializers.constant(std)
    if dt_init == "random":
        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -std, std)
        return init
    raise NotImplementedError(dt_init)


def dt_proj_bias_init(dt_min: float, dt_max: float, dt_init_floor: float):
    """mamba-ssm dt_proj bias init: softplus^-1 of log-uniform dt."""

    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, jnp.float32)
            * (math.log(dt_max) - math.log(dt_min))
            + math.log(dt_min)
        )
        dt = jnp.clip(dt, min=dt_init_floor)
        # inverse softplus: x = dt + log(-expm1(-dt))
        inv_dt = dt + jnp.log(-jnp.expm1(-dt))
        return inv_dt.astype(dtype)

    return init


def a_log_init(d_state: int):
    """S4D-real init: A = -(1..N), stored as log (`mamba_simple.py`)."""

    def init(key, shape, dtype=jnp.float32):
        d_inner, n = shape
        a = jnp.tile(jnp.arange(1, n + 1, dtype=jnp.float32)[None], (d_inner, 1))
        return jnp.log(a).astype(dtype)

    return init


class FrameDense(nn.Module):
    """``nn.Dense``-compatible dense layer (identical param tree:
    kernel/bias) with optional *static* flips of the kernel's input rows /
    output columns (and the bias, with the output).

    This is the zero-cost parameter-side realization of the reference's
    fused RCPS block frame (`modeling_rcps.py:174-197`): conjugating a block
    by the strand-swap + (L, d)-reversal involution moves the d_model-channel
    reversal off the (B, L, d) activations — 2 HBM round trips of the
    residual stream per block — and onto the (d, ·) projection kernels,
    where a flip is O(d²) and folds into the matmul. See
    `models/caduceus.py CaduceusBlock` for the derivation.
    """

    features: int
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    param_dtype: Any = jnp.float32
    dtype: Any = None
    flip_in: bool = False
    flip_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dtype = x.dtype if self.dtype is None else jnp.dtype(self.dtype)
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features),
            jnp.dtype(self.param_dtype),
        )
        if self.flip_in:
            kernel = kernel[::-1]
        if self.flip_out:
            kernel = kernel[:, ::-1]
        if self.flip_in or self.flip_out:
            # materialize the flipped kernel as its own tiny copy: fused
            # into the dot, the negative-stride operand read knocks the
            # big (B·L, d) matmul off the MXU fast path (measured 5x
            # step-time regression on TPU without this barrier)
            kernel = jax.lax.optimization_barrier(kernel)
        y = x.astype(dtype) @ kernel.astype(dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                jnp.dtype(self.param_dtype),
            )
            if self.flip_out:
                bias = bias[::-1]
            y = y + bias.astype(dtype)
        return y


# ---------------------------------------------------------------------------
# Functional core
# ---------------------------------------------------------------------------

def ssm_branch(
    x: jnp.ndarray,  # (..., L, d_inner) — conv input (pre-activation)
    conv_w: jnp.ndarray,  # (K, d_inner)
    conv_b: Optional[jnp.ndarray],
    x_proj_w: jnp.ndarray,  # (d_inner, dt_rank + 2N)
    dt_proj_w: jnp.ndarray,  # (dt_rank, d_inner)
    dt_proj_b: jnp.ndarray,  # (d_inner,)
    A_log: jnp.ndarray,  # (d_inner, N)
    D: jnp.ndarray,  # (d_inner,)
    dt_rank: int,
    d_state: int,
    reverse: bool = False,
    chunk_size: int = 256,
    use_kernel: str = "xla",  # "xla" | "pallas" | "pallas_interpret"
    tp_axis: Optional[str] = None,
) -> jnp.ndarray:
    """One directional inner-SSM pass: conv → projections → selective scan.

    Returns the ungated scan output (..., L, d_inner); gating and output
    projection are the caller's responsibility (enables the add-combine
    fusion in BiMamba).
    """
    lead = x.shape[:-2]
    L, d_inner = x.shape[-2], x.shape[-1]
    x3 = x.reshape((-1, L, d_inner))

    xc = causal_conv1d(x3, conv_w, conv_b, activation="silu", reverse=reverse)

    dbc = xc @ x_proj_w.astype(xc.dtype)  # (B', L, dt_rank + 2N)
    dt, B_mat, C = jnp.split(dbc, [dt_rank, dt_rank + d_state], axis=-1)
    delta_raw = dt @ dt_proj_w.astype(dt.dtype)  # (B', L, d_inner)

    A = -jnp.exp(A_log.astype(jnp.float32))
    if use_kernel.startswith("pallas"):
        from caduceus_tpu.ops.scan_pallas import selective_scan_pallas

        interp = use_kernel == "pallas_interpret"

        def call(u_, d_, A_, B_, C_, D_, bias_):
            return selective_scan_pallas(
                u_, d_, A_, B_, C_, D_, None,
                True, reverse, _SCAN_CHUNK, _SCAN_GB, interp, bias_,
            )

        if tp_axis:
            # TP through the kernel: the scan is elementwise in d_inner, so
            # each 'model' shard runs the kernel on its d-slice — no
            # collectives inside (x_proj/out_proj psums live outside, via
            # the Megatron PartitionSpecs in `parallel/sharding.py`).
            from caduceus_tpu.parallel.mesh import get_global_mesh
            from jax.sharding import PartitionSpec as P

            mesh = get_global_mesh()
            assert mesh is not None, "tp_axis set but no global mesh"
            d3 = P(None, None, tp_axis)
            n3 = P(None, None, None)
            y = _shard_map_compat(
                call, mesh,
                in_specs=(d3, d3, P(tp_axis, None), n3, n3, P(tp_axis),
                          P(tp_axis)),
                out_specs=d3,
            )(xc, delta_raw, A, B_mat, C, D, dt_proj_b)
        else:
            y = call(xc, delta_raw, A, B_mat, C, D, dt_proj_b)
    else:
        y = selective_scan(
            xc,
            delta_raw,
            A,
            B_mat,
            C,
            D=D,
            z=None,
            delta_bias=dt_proj_b,
            delta_softplus=True,
            reverse=reverse,
            chunk_size=chunk_size,
        )
    return y.reshape(*lead, L, d_inner)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class _DirectionParams(nn.Module):
    """Per-direction inner-SSM parameters (conv + dt/B/C projections + A, D)."""

    cfg: CaduceusConfig
    name_prefix: str = ""

    def setup(self):
        c = self.cfg
        s = c.ssm_cfg
        d_inner, dt_rank = c.d_inner, c.dt_rank
        pdt = jnp.dtype(c.param_dtype)
        self.conv_w = self.param(
            "conv_w", torch_linear_init(s.d_conv), (s.d_conv, d_inner), pdt
        )
        self.conv_b = (
            self.param("conv_b", torch_linear_init(s.d_conv), (d_inner,), pdt)
            if s.conv_bias
            else None
        )
        self.x_proj_w = self.param(
            "x_proj_w", torch_linear_init(d_inner), (d_inner, dt_rank + 2 * s.d_state), pdt
        )
        self.dt_proj_w = self.param(
            "dt_proj_w",
            dt_proj_kernel_init(dt_rank, s.dt_init, s.dt_scale),
            (dt_rank, d_inner),
            pdt,
        )
        self.dt_proj_b = self.param(
            "dt_proj_b",
            dt_proj_bias_init(s.dt_min, s.dt_max, s.dt_init_floor),
            (d_inner,),
            pdt,
        )
        # A_log and D are kept in fp32 always (reference marks them
        # `_no_weight_decay` and the CUDA kernel reads them in fp32).
        self.A_log = self.param("A_log", a_log_init(s.d_state), (d_inner, s.d_state), jnp.float32)
        self.D = self.param("D", nn.initializers.ones, (d_inner,), jnp.float32)

    def _resolved_kernel(self) -> str:
        use_kernel = self.cfg.ssm_cfg.use_kernel
        if use_kernel == "auto":
            # the Pallas kernel targets real TPUs (backend "tpu", or "axon"
            # in tunneled containers); interpret mode is for tests
            use_kernel = "xla" if jax.default_backend() == "cpu" else "pallas"
        return use_kernel

    def projections(self, x: jnp.ndarray, reverse: bool):
        """Conv + input-dependent projections; returns (xc, delta_raw, B, C)
        flattened to (G, L, ·)."""
        c = self.cfg
        lead = x.shape[:-2]
        L, d_inner = x.shape[-2], x.shape[-1]
        x3 = x.reshape((-1, L, d_inner))
        xc = causal_conv1d(
            x3, self.conv_w.astype(x.dtype),
            None if self.conv_b is None else self.conv_b.astype(x.dtype),
            activation="silu", reverse=reverse,
        )
        dbc = xc @ self.x_proj_w.astype(xc.dtype)
        dt, B_mat, C = jnp.split(
            dbc, [c.dt_rank, c.dt_rank + c.ssm_cfg.d_state], axis=-1
        )
        delta_raw = dt @ self.dt_proj_w.astype(dt.dtype)
        return xc, delta_raw, B_mat, C, lead

    def __call__(self, x: jnp.ndarray, reverse: bool, chunk_size: int) -> jnp.ndarray:
        c = self.cfg
        return ssm_branch(
            x,
            self.conv_w.astype(x.dtype),
            None if self.conv_b is None else self.conv_b.astype(x.dtype),
            self.x_proj_w,
            self.dt_proj_w,
            self.dt_proj_b,
            self.A_log,
            self.D,
            dt_rank=c.dt_rank,
            d_state=c.ssm_cfg.d_state,
            reverse=reverse,
            chunk_size=chunk_size,
            use_kernel=self._resolved_kernel(),
            tp_axis=c.tensor_parallel_axis,
        )


def _shard_map_compat(fn, mesh, in_specs, out_specs):
    from caduceus_tpu.parallel.mesh import shard_map_compat

    return shard_map_compat(fn, mesh, in_specs, out_specs)


def _tp_mesh(cfg: CaduceusConfig):
    from caduceus_tpu.parallel.mesh import get_global_mesh

    mesh = get_global_mesh()
    assert mesh is not None, (
        "tensor_parallel_axis is set but no mesh is registered — call "
        "caduceus_tpu.parallel.mesh.set_global_mesh(mesh) (or use with_mesh)"
    )
    return mesh


def _cp_scan(dp: "_DirectionParams", cfg: CaduceusConfig, xi: jnp.ndarray,
             reverse: bool) -> jnp.ndarray:
    """Context-parallel directional scan: conv/projections run as global ops
    on the L-sharded activations (XLA inserts the halo exchanges), the scan
    itself runs as the exact two-pass sequence-parallel algorithm
    (`parallel/seq_scan.py`; capability beyond the reference, SURVEY §5.7)."""
    from caduceus_tpu.parallel.mesh import get_global_mesh
    from caduceus_tpu.parallel.seq_scan import sequence_parallel_scan

    mesh = get_global_mesh()
    assert mesh is not None, (
        "context_parallel_axis is set but no mesh is registered — call "
        "caduceus_tpu.parallel.mesh.set_global_mesh(mesh) (or use with_mesh)"
    )
    xc, draw, B_mat, C, lead = dp.projections(xi, reverse=reverse)
    y = sequence_parallel_scan(
        xc, draw, -jnp.exp(dp.A_log.astype(jnp.float32)), B_mat, C,
        D=dp.D, delta_bias=dp.dt_proj_b, delta_softplus=True,
        reverse=reverse, mesh=mesh, axis=cfg.context_parallel_axis,
        chunk_size=_SCAN_CHUNK, group_block=_SCAN_GB,
        local_impl=dp._resolved_kernel(),
    )
    L, di = xi.shape[-2], xi.shape[-1]
    return y.reshape(*lead, L, di)


class MambaMixer(nn.Module):
    """Unidirectional Mamba mixer (reference `Mamba`, mamba-ssm 1.2.0).

    in_proj → [conv → SiLU → selective scan] → gate → out_proj.
    """

    cfg: CaduceusConfig
    scan_chunk_size: int = 256
    frame_conjugate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        d_inner = c.d_inner
        dtype = jnp.dtype(c.dtype)
        x = x.astype(dtype)
        conj = self.frame_conjugate

        in_proj = FrameDense(
            2 * d_inner,
            use_bias=c.ssm_cfg.bias,
            kernel_init=torch_linear_init(c.d_model),
            param_dtype=jnp.dtype(c.param_dtype),
            dtype=dtype,
            flip_in=conj,
            name="in_proj",
        )
        out_proj = FrameDense(
            c.d_model,
            use_bias=c.ssm_cfg.bias,
            kernel_init=torch_linear_init(
                d_inner, scale=_residual_rescale(c)
            ),
            param_dtype=jnp.dtype(c.param_dtype),
            dtype=dtype,
            flip_out=conj,
            name="out_proj",
        )
        xz = in_proj(x)
        xi, z = jnp.split(xz, 2, axis=-1)
        direction = _DirectionParams(c, name="fwd")
        if c.context_parallel_axis:
            y = _cp_scan(direction, c, xi, reverse=conj)
        else:
            y = direction(xi, reverse=conj, chunk_size=self.scan_chunk_size)
        y = y * jax.nn.silu(z)
        return out_proj(y)


def _residual_rescale(c: CaduceusConfig) -> float:
    """GPT-2 prenorm-residual rescale of out_proj init
    (`caduceus/modeling_caduceus.py:325-341`)."""
    if not c.rescale_prenorm_residual:
        return 1.0
    return 1.0 / math.sqrt(c.n_residuals_per_layer * c.n_layer)


class BiMamba(nn.Module):
    """Bidirectional Mamba (reference `BiMambaWrapper`,
    `caduceus/modeling_caduceus.py:87-140`) with structural weight sharing.

    Handles all four reference configurations:
      (tie, add)          — fully fused: 1 in_proj, 1 gate, 1 out_proj
      (tie, ew_multiply)  — 1 in_proj, shared-out_proj applied per direction
      (untie, add/mul)    — separate projections per direction
    and ``bidirectional=False`` → plain Mamba.
    """

    cfg: CaduceusConfig
    scan_chunk_size: int = 256
    frame_conjugate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        conj = self.frame_conjugate
        if not c.bidirectional:
            return MambaMixer(c, self.scan_chunk_size, conj,
                              name="mamba_fwd")(x)

        d_inner = c.d_inner
        dtype = jnp.dtype(c.dtype)
        pdt = jnp.dtype(c.param_dtype)
        x = x.astype(dtype)
        tied = c.bidirectional_weight_tie
        strategy = c.bidirectional_strategy
        # frame conjugation (see CaduceusBlock): the (L, d_model)-reversal
        # halves land on the projections (FrameDense flips) and the
        # L-reversal on the scans — each (projection, direction-params) pair
        # keeps its pairing but traverses the sequence the other way.
        rev_f = conj          # traversal direction of the fwd param set
        rev_r = not conj      # traversal direction of the rev param set

        def dense(feats, fan_in, scale, name, flip_in=False, flip_out=False):
            return FrameDense(
                feats,
                use_bias=c.ssm_cfg.bias,
                kernel_init=torch_linear_init(fan_in, scale=scale),
                param_dtype=pdt,
                dtype=dtype,
                flip_in=flip_in,
                flip_out=flip_out,
                name=name,
            )

        rescale = _residual_rescale(c)
        in_proj = dense(2 * d_inner, c.d_model, 1.0, "in_proj", flip_in=conj)
        out_proj = dense(c.d_model, d_inner, rescale, "out_proj",
                         flip_out=conj)

        fwd = _DirectionParams(c, name="fwd")
        rev = _DirectionParams(c, name="rev")

        def run_both(xi_f, xi_r):
            """Run both directional inner scans; uses the paired-direction
            Pallas kernel (single launch, double VPU width) when on TPU."""
            if c.context_parallel_axis:
                return (_cp_scan(fwd, c, xi_f, reverse=rev_f),
                        _cp_scan(rev, c, xi_r, reverse=rev_r))
            kernel = fwd._resolved_kernel()
            if kernel.startswith("pallas"):
                from caduceus_tpu.ops.scan_pallas_bidir import (
                    bidir_selective_scan_pallas,
                )

                xc_f, draw_f, B_f, C_f, lead = fwd.projections(
                    xi_f, reverse=rev_f)
                xc_r, draw_r, B_r, C_r, _ = rev.projections(
                    xi_r, reverse=rev_r)
                interp = kernel == "pallas_interpret"

                def call(uf, df, Bf, Cf, ur, dr, Br, Cr, Af, Ar, Df, Dr,
                         bf, br):
                    return bidir_selective_scan_pallas(
                        uf, df, Bf, Cf, ur, dr, Br, Cr, Af, Ar, Df, Dr,
                        bf, br, True, _SCAN_CHUNK, _SCAN_GB, interp,
                    )

                # the paired kernel scans set 1 forward and set 2 reversed;
                # under conjugation the fwd param set traverses reversed, so
                # the sets swap slots (and the outputs swap back)
                if conj:
                    args = (
                        xc_r, draw_r, B_r, C_r, xc_f, draw_f, B_f, C_f,
                        -jnp.exp(rev.A_log.astype(jnp.float32)),
                        -jnp.exp(fwd.A_log.astype(jnp.float32)),
                        rev.D, fwd.D, rev.dt_proj_b, fwd.dt_proj_b,
                    )
                else:
                    args = (
                        xc_f, draw_f, B_f, C_f, xc_r, draw_r, B_r, C_r,
                        -jnp.exp(fwd.A_log.astype(jnp.float32)),
                        -jnp.exp(rev.A_log.astype(jnp.float32)),
                        fwd.D, rev.D, fwd.dt_proj_b, rev.dt_proj_b,
                    )
                ax = c.tensor_parallel_axis
                if ax:
                    # TP: per-shard kernel on the d_inner slice (see
                    # ssm_branch; zero collectives inside the scan)
                    from jax.sharding import PartitionSpec as P

                    mesh = _tp_mesh(c)
                    d3 = P(None, None, ax)
                    n3 = P(None, None, None)
                    call = _shard_map_compat(
                        call, mesh,
                        in_specs=(d3, d3, n3, n3, d3, d3, n3, n3,
                                  P(ax, None), P(ax, None),
                                  P(ax), P(ax), P(ax), P(ax)),
                        out_specs=(d3, d3),
                    )
                y_1, y_2 = call(*args)
                y_f, y_r = (y_2, y_1) if conj else (y_1, y_2)
                L, di = xi_f.shape[-2], xi_f.shape[-1]
                return (y_f.reshape(*lead, L, di), y_r.reshape(*lead, L, di))
            y_f = fwd(xi_f, reverse=rev_f, chunk_size=self.scan_chunk_size)
            y_r = rev(xi_r, reverse=rev_r, chunk_size=self.scan_chunk_size)
            return y_f, y_r

        if tied:
            xz = in_proj(x)
            xi, z = jnp.split(xz, 2, axis=-1)
            y_f, y_r = run_both(xi, xi)
            gate = jax.nn.silu(z)
            if strategy == "add":
                return out_proj((y_f + y_r) * gate)
            # ew_multiply with shared out_proj weights
            return out_proj(y_f * gate) * out_proj(y_r * gate)

        # untied: independent projections per direction
        in_proj_rev = dense(2 * d_inner, c.d_model, 1.0, "in_proj_rev",
                            flip_in=conj)
        out_proj_rev = dense(c.d_model, d_inner, rescale, "out_proj_rev",
                             flip_out=conj)
        xz_f = in_proj(x)
        xz_r = in_proj_rev(x)
        xi_f, z_f = jnp.split(xz_f, 2, axis=-1)
        xi_r, z_r = jnp.split(xz_r, 2, axis=-1)
        y_f, y_r = run_both(xi_f, xi_r)
        o_f = out_proj(y_f * jax.nn.silu(z_f))
        o_r = out_proj_rev(y_r * jax.nn.silu(z_r))
        if strategy == "add":
            return o_f + o_r
        return o_f * o_r
