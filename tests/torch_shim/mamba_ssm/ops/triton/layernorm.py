"""CPU stand-ins for mamba-ssm's Triton (fused) norm ops.

`layer_norm_fn` / `rms_norm_fn` implement the fused add+norm contract the
reference relies on (`caduceus/modeling_caduceus.py:241-275`,
`modeling_rcps.py:176-200`): residual_out = x + residual (optionally fp32),
out = norm(residual_out) in the weight dtype; prenorm=True returns both.
"""

import torch
from torch import nn


class RMSNorm(nn.Module):
    def __init__(self, hidden_size, eps=1e-5, device=None, dtype=None):
        super().__init__()
        self.eps = eps
        self.weight = nn.Parameter(
            torch.ones(hidden_size, device=device, dtype=dtype)
        )
        self.register_parameter("bias", None)

    def forward(self, x):
        dt = x.dtype
        xf = x.float()
        var = xf.pow(2).mean(dim=-1, keepdim=True)
        return (xf * torch.rsqrt(var + self.eps)).to(dt) * self.weight


def _add_norm(x, weight, bias, residual, prenorm, residual_in_fp32, eps,
              rms: bool):
    if residual is not None:
        residual_out = x + residual
    else:
        residual_out = x
    if residual_in_fp32:
        residual_out = residual_out.to(torch.float32)
    h = residual_out.to(weight.dtype).float()
    if rms:
        var = h.pow(2).mean(dim=-1, keepdim=True)
        out = h * torch.rsqrt(var + eps)
    else:
        mu = h.mean(dim=-1, keepdim=True)
        var = (h - mu).pow(2).mean(dim=-1, keepdim=True)
        out = (h - mu) * torch.rsqrt(var + eps)
    out = out.to(weight.dtype) * weight
    if bias is not None:
        out = out + bias
    return (out, residual_out) if prenorm else out


def layer_norm_fn(x, weight, bias, residual=None, eps=1e-6, prenorm=False,
                  residual_in_fp32=False, **_unused):
    return _add_norm(x, weight, bias, residual, prenorm, residual_in_fp32,
                     eps, rms=False)


def rms_norm_fn(x, weight, bias, residual=None, eps=1e-6, prenorm=False,
                residual_in_fp32=False, **_unused):
    return _add_norm(x, weight, bias, residual, prenorm, residual_in_fp32,
                     eps, rms=True)
