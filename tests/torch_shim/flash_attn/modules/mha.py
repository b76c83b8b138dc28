import torch
import torch.nn.functional as F
from torch import nn


class MHA(nn.Module):
    """flash-attn v2 MHA, non-fused path: packed Wqkv ([q|k|v] heads-major,
    head_dim fastest), scaled dot-product attention, out_proj."""

    def __init__(self, embed_dim, num_heads, causal=False, layer_idx=None,
                 dropout=0.0, qkv_proj_bias=True, out_proj_bias=True,
                 softmax_scale=None, device=None, dtype=None, **_unused):
        super().__init__()
        factory_kwargs = {"device": device, "dtype": dtype}
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.causal = causal
        self.layer_idx = layer_idx
        self.dropout_p = dropout
        self.softmax_scale = softmax_scale
        self.Wqkv = nn.Linear(embed_dim, 3 * embed_dim, bias=qkv_proj_bias,
                              **factory_kwargs)
        self.out_proj = nn.Linear(embed_dim, embed_dim, bias=out_proj_bias,
                                  **factory_kwargs)

    def forward(self, x, **kwargs):
        B, L, d = x.shape
        qkv = self.Wqkv(x)
        q, k, v = qkv.chunk(3, dim=-1)
        rs = lambda t: t.view(B, L, self.num_heads, self.head_dim).transpose(1, 2)
        out = F.scaled_dot_product_attention(
            rs(q), rs(k), rs(v), is_causal=self.causal,
            dropout_p=self.dropout_p if self.training else 0.0,
            scale=self.softmax_scale,
        )
        out = out.transpose(1, 2).reshape(B, L, d)
        return self.out_proj(out)


class ParallelMHA(nn.Module):
    def __init__(self, *a, **k):
        raise NotImplementedError("tensor-parallel path not shimmed")
