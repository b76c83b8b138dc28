"""Activation registry (reference `src/models/nn/activation.py:9-42`)."""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def squared_relu(x):
    return jnp.square(jax.nn.relu(x))


def laplace(x, mu: float = math.sqrt(0.5), sigma: float = math.sqrt(0.25)):
    return 0.5 * (1.0 + jax.lax.erf((x - mu) / (sigma * math.sqrt(2.0))))


def glu(x, axis: int = -1):
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


_ACTIVATIONS = {
    None: lambda x: x,
    "id": lambda x: x,
    "identity": lambda x: x,
    "linear": lambda x: x,
    "none": lambda x: x,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "sqrelu": squared_relu,
    "laplace": laplace,
    "glu": glu,
}


def get_activation(name: Optional[str]) -> Callable:
    key = name.lower() if isinstance(name, str) else name
    if key not in _ACTIVATIONS:
        raise NotImplementedError(f"activation '{name}' not implemented")
    return _ACTIVATIONS[key]
