"""Parameter partition specs for tensor parallelism.

The reference inherits dormant flash-attn TP code (ColumnParallelLinear
etc., `src/models/sequence/long_conv_lm.py:42-127` — never enabled by any
config, SURVEY.md §2.4). Here TP is expressed as data: a map from parameter
paths to PartitionSpecs over the ('data', 'model') mesh. Applying them to a
pjit-ed step makes XLA insert the collectives.

Megatron-style layout for the Mamba block:
- in_proj kernel  (d_model, 2*d_inner) → shard output dim  ('model' on axis 1)
- inner SSM params (conv, x_proj, dt_proj, A_log, D) → shard d_inner
- out_proj kernel (d_inner, d_model)  → shard input dim   ('model' on axis 0)
so each model shard runs an independent slice of the scan and the out_proj
contraction produces the psum.

Scope note: on the XLA scan path these specs alone make pjit shard the
inner scan; on the Pallas path set ``tensor_parallel_axis`` on the model
config as well, which shard_maps the kernel over its d_inner slice
(``models/mamba.py``) — TP==DP parity is tested both ways
(`tests/test_sharding.py`). With the reference's model sizes (d_model 256)
TP is not profitable — these specs keep the capability parameterized, as
the survey prescribes.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from caduceus_tpu.parallel.mesh import MODEL_AXIS

# suffix-match rules, first hit wins: (path substring, spec)
_TP_RULES = (
    (("in_proj", "kernel"), P(None, MODEL_AXIS)),
    (("in_proj_rev", "kernel"), P(None, MODEL_AXIS)),
    (("out_proj", "kernel"), P(MODEL_AXIS, None)),
    (("out_proj_rev", "kernel"), P(MODEL_AXIS, None)),
    (("conv_w",), P(None, MODEL_AXIS)),
    (("conv_b",), P(MODEL_AXIS)),
    (("x_proj_w",), P(MODEL_AXIS, None)),
    (("dt_proj_w",), P(None, MODEL_AXIS)),
    (("dt_proj_b",), P(MODEL_AXIS)),
    (("A_log",), P(MODEL_AXIS, None)),
    (("D",), P(MODEL_AXIS)),
    # MLP (Hyena LM) Megatron split
    (("fc1", "kernel"), P(None, MODEL_AXIS)),
    (("fc1", "bias"), P(MODEL_AXIS)),
    (("fc2", "kernel"), P(MODEL_AXIS, None)),
    (("Wqkv", "kernel"), P(None, MODEL_AXIS)),
    (("Wqkv", "bias"), P(MODEL_AXIS)),
)


def _path_names(path) -> tuple:
    return tuple(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def param_partition_specs(params: Any) -> Any:
    """PartitionSpec pytree for `params`: TP rules where they match,
    replicated otherwise."""

    def decide(path, leaf):
        names = _path_names(path)
        for pattern, spec in _TP_RULES:
            if len(names) >= len(pattern) and tuple(names[-len(pattern):]) == pattern:
                if len(spec) <= leaf.ndim:
                    return spec
        return P()

    return jax.tree_util.tree_map_with_path(decide, params)


def shard_params(mesh: Mesh, params: Any) -> Any:
    """device_put params with their TP specs over `mesh`."""
    specs = param_partition_specs(params)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )
