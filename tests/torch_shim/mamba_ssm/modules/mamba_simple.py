"""CPU torch `Mamba` / `Block` with mamba-ssm 1.2.0 parameter layout and
slow-path (reference) forward semantics.

Parameter names/shapes match the CUDA package exactly (in_proj, conv1d,
x_proj, dt_proj, A_log, D, out_proj), so state dicts round-trip with real
checkpoints; the forward implements the selective-scan recurrence
  h_t = exp(Δ_t ⊗ A) ∘ h_{t-1} + Δ_t u_t ⊗ B_t ;  y_t = C_t · h_t + D u_t
with the SiLU gate, exactly as `caduceus_tpu/ops/selective_scan.py` cites.
"""

import math

import torch
import torch.nn.functional as F
from torch import nn

from mamba_ssm.ops.triton.layernorm import RMSNorm, layer_norm_fn, rms_norm_fn


class Mamba(nn.Module):
    def __init__(
        self,
        d_model,
        d_state=16,
        d_conv=4,
        expand=2,
        dt_rank="auto",
        dt_min=0.001,
        dt_max=0.1,
        dt_init="random",
        dt_scale=1.0,
        dt_init_floor=1e-4,
        conv_bias=True,
        bias=False,
        use_fast_path=True,  # accepted, ignored (no fused CUDA path here)
        layer_idx=None,
        device=None,
        dtype=None,
    ):
        factory_kwargs = {"device": device, "dtype": dtype}
        super().__init__()
        self.d_model = d_model
        self.d_state = d_state
        self.d_conv = d_conv
        self.expand = expand
        self.d_inner = int(expand * d_model)
        self.dt_rank = math.ceil(d_model / 16) if dt_rank == "auto" else dt_rank
        self.layer_idx = layer_idx

        self.in_proj = nn.Linear(d_model, self.d_inner * 2, bias=bias,
                                 **factory_kwargs)
        self.conv1d = nn.Conv1d(
            self.d_inner, self.d_inner, kernel_size=d_conv,
            groups=self.d_inner, padding=d_conv - 1, bias=conv_bias,
            **factory_kwargs,
        )
        self.x_proj = nn.Linear(self.d_inner, self.dt_rank + 2 * d_state,
                                bias=False, **factory_kwargs)
        self.dt_proj = nn.Linear(self.dt_rank, self.d_inner, bias=True,
                                 **factory_kwargs)

        # dt projection init: uniform weight at rank^-0.5 scale; bias =
        # softplus^-1 of a log-uniform dt in [dt_min, dt_max]
        dt_init_std = self.dt_rank**-0.5 * dt_scale
        if dt_init == "constant":
            nn.init.constant_(self.dt_proj.weight, dt_init_std)
        elif dt_init == "random":
            nn.init.uniform_(self.dt_proj.weight, -dt_init_std, dt_init_std)
        dt = torch.exp(
            torch.rand(self.d_inner, **factory_kwargs)
            * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min)
        ).clamp(min=dt_init_floor)
        inv_dt = dt + torch.log(-torch.expm1(-dt))
        with torch.no_grad():
            self.dt_proj.bias.copy_(inv_dt)

        # S4D-real A: A[d, n] = n+1
        A = torch.arange(1, d_state + 1, dtype=torch.float32,
                         device=device).repeat(self.d_inner, 1)
        self.A_log = nn.Parameter(torch.log(A))
        # real mamba_ssm marks both as weight-decay-exempt; the reference's
        # add_optimizer_hooks (src/utils/optim_groups.py:36) reads this
        # attribute, so optimizer-trajectory parity needs it on the shim too
        self.A_log._no_weight_decay = True
        self.D = nn.Parameter(torch.ones(self.d_inner, **factory_kwargs))
        self.D._no_weight_decay = True
        self.out_proj = nn.Linear(self.d_inner, d_model, bias=bias,
                                  **factory_kwargs)

    def forward(self, hidden_states, inference_params=None):
        assert inference_params is None, "shim implements training path only"
        B, L, _ = hidden_states.shape
        xz = self.in_proj(hidden_states)            # (B, L, 2*d_inner)
        x, z = xz.chunk(2, dim=-1)
        x = self.conv1d(x.transpose(1, 2))[..., :L]  # causal depthwise conv
        x = F.silu(x).transpose(1, 2)                # (B, L, d_inner)

        x_dbl = self.x_proj(x)
        dt, Bm, Cm = torch.split(
            x_dbl, [self.dt_rank, self.d_state, self.d_state], dim=-1
        )
        delta = F.softplus(self.dt_proj(dt)).float()  # (B, L, d_inner)
        A = -torch.exp(self.A_log.float())            # (d_inner, N)
        xf = x.float()
        Bm, Cm = Bm.float(), Cm.float()

        h = x.new_zeros((B, self.d_inner, self.d_state), dtype=torch.float32)
        ys = []
        for t in range(L):
            dA = torch.exp(delta[:, t, :, None] * A)
            h = dA * h + (delta[:, t, :, None] * xf[:, t, :, None]
                          * Bm[:, t, None, :])
            ys.append((h * Cm[:, t, None, :]).sum(-1))
        y = torch.stack(ys, dim=1) + self.D.float() * xf
        y = (y * F.silu(z.float())).to(hidden_states.dtype)
        return self.out_proj(y)


class Block(nn.Module):
    """Prenorm residual block: Add -> Norm -> Mixer, returning
    (hidden_states, residual) — the mamba-ssm v1 contract the reference's
    `create_block` builds on (`caduceus/modeling_caduceus.py:33-85`)."""

    def __init__(self, dim, mixer_cls, norm_cls=nn.LayerNorm,
                 fused_add_norm=False, residual_in_fp32=False):
        super().__init__()
        self.residual_in_fp32 = residual_in_fp32
        self.fused_add_norm = fused_add_norm
        self.mixer = mixer_cls(dim)
        self.norm = norm_cls(dim)

    def forward(self, hidden_states, residual=None, inference_params=None):
        if not self.fused_add_norm:
            residual = (hidden_states + residual
                        if residual is not None else hidden_states)
            hidden_states = self.norm(residual.to(self.norm.weight.dtype))
            if self.residual_in_fp32:
                residual = residual.to(torch.float32)
        else:
            fused = rms_norm_fn if isinstance(self.norm, RMSNorm) else layer_norm_fn
            hidden_states, residual = fused(
                hidden_states, self.norm.weight, self.norm.bias,
                residual=residual, prenorm=True,
                residual_in_fp32=self.residual_in_fp32, eps=self.norm.eps,
            )
        hidden_states = self.mixer(hidden_states,
                                   inference_params=inference_params)
        return hidden_states, residual
