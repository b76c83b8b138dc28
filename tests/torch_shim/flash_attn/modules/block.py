"""flash-attn v2 `Block` (prenorm, non-fused path): Dropout -> Add -> LN ->
Mixer, then Dropout -> Add -> LN -> MLP, returning (hidden_states, residual).
Parameter names: norm1, norm2, mixer, mlp."""

import torch
from torch import nn


class Block(nn.Module):
    def __init__(
        self,
        dim,
        mixer_cls=None,
        mlp_cls=None,
        norm_cls=nn.LayerNorm,
        dropout_cls=nn.Dropout,
        prenorm=True,
        resid_dropout1=0.0,
        resid_dropout2=0.0,
        drop_path1=0.0,
        drop_path2=0.0,
        fused_dropout_add_ln=False,
        return_residual=False,
        residual_in_fp32=False,
        sequence_parallel=False,
        mark_shared_params=False,
    ):
        super().__init__()
        assert prenorm and not fused_dropout_add_ln, (
            "shim implements the prenorm non-fused path only"
        )
        self.prenorm = prenorm
        self.residual_in_fp32 = residual_in_fp32
        self.mixer = mixer_cls(dim) if mixer_cls is not None else nn.Identity()
        self.dropout1 = dropout_cls(resid_dropout1)
        self.norm1 = norm_cls(dim)
        self.mlp = mlp_cls(dim) if mlp_cls is not None else nn.Identity()
        if not isinstance(self.mlp, nn.Identity):
            self.dropout2 = dropout_cls(resid_dropout2)
            self.norm2 = norm_cls(dim)

    def forward(self, hidden_states, residual=None, mixer_subset=None,
                mixer_kwargs=None):
        dropped = self.dropout1(hidden_states)
        residual = (dropped + residual) if residual is not None else dropped
        hidden_states = self.norm1(residual.to(dtype=self.norm1.weight.dtype))
        if self.residual_in_fp32:
            residual = residual.to(torch.float32)
        hidden_states = self.mixer(hidden_states, **(mixer_kwargs or {}))
        if not isinstance(self.mlp, nn.Identity):
            dropped = self.dropout2(hidden_states)
            residual = dropped + residual
            hidden_states = self.norm2(
                residual.to(dtype=self.norm2.weight.dtype)
            )
            if self.residual_in_fp32:
                residual = residual.to(torch.float32)
            hidden_states = self.mlp(hidden_states)
        return hidden_states, residual
