import torch.nn.functional as F
from torch import nn


class Mlp(nn.Module):
    """flash-attn Mlp: fc1 -> activation -> fc2."""

    def __init__(self, in_features, hidden_features=None, out_features=None,
                 activation=F.gelu, bias1=True, bias2=True,
                 return_residual=False, device=None, dtype=None):
        super().__init__()
        factory_kwargs = {"device": device, "dtype": dtype}
        hidden_features = hidden_features or 4 * in_features
        out_features = out_features or in_features
        self.activation = activation
        self.fc1 = nn.Linear(in_features, hidden_features, bias=bias1,
                             **factory_kwargs)
        self.fc2 = nn.Linear(hidden_features, out_features, bias=bias2,
                             **factory_kwargs)

    def forward(self, x):
        return self.fc2(self.activation(self.fc1(x)))


class FusedMLP(nn.Module):
    def __init__(self, *a, **k):
        raise NotImplementedError("fused path not shimmed")


class ParallelFusedMLP(nn.Module):
    def __init__(self, *a, **k):
        raise NotImplementedError("tensor-parallel path not shimmed")
