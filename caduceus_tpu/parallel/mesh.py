"""Device mesh + sharding helpers.

The reference's distributed layer is PL-DDP over NCCL (`train.py:629-639`)
with dormant flash-attn tensor-parallel hooks (SURVEY.md §2.4). Here the
equivalent is a first-class `jax.sharding.Mesh` with axes:

- ``data``  — batch sharding (DP); gradient psum inserted by XLA.
- ``model`` — parameter/activation sharding (TP). Dormant in the reference;
  here PartitionSpecs are parameterized so TP is a mesh-shape change, not a
  code change.

One process per host; arrays are global (jax.make_array_from_process_local
handled by the data loader placing per-host shards).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SEQ_AXIS = "seq"


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: int = 1,
    seq: int = 1,
) -> Mesh:
    """Mesh over all (or given) devices: ('data', 'model') — or
    ('data', 'model', 'seq') when ``seq > 1``, for composing tensor
    parallelism (params/heads over 'model') with context parallelism
    (sequence over 'seq') in one run.

    Defaults to pure data parallelism (model=seq=1), matching the
    reference's only exercised strategy (SURVEY.md §2.4).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % (model * seq) == 0, (
            f"{n} devices not divisible by model*seq={model * seq}")
        data = n // (model * seq)
    assert data * model * seq == n, (
        f"mesh {data}x{model}x{seq} != {n} devices")
    if seq > 1:
        dev_array = np.asarray(devices).reshape(data, model, seq)
        return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh, cp: bool = False) -> NamedSharding:
    """Batch tensors: sharded over 'data' on the leading axis; with
    ``cp`` (context parallelism) the sequence axis additionally shards
    over 'model'."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS) if cp else P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, cp: bool = False):
    """Place a host-local numpy batch onto the mesh, sharded over 'data'
    (and, with ``cp``, the sequence axis over 'model').

    Single-process: device_put with the named sharding. Multi-host: each
    process contributes its local rows via
    ``jax.make_array_from_process_local_data``.
    """
    sharding = batch_sharding(mesh, cp=cp)
    data_size = mesh.shape[DATA_AXIS]
    model_size = mesh.shape[MODEL_AXIS]
    for k, v in (batch.items() if isinstance(batch, dict) else []):
        if v.shape[0] % data_size != 0:
            raise ValueError(
                f"batch axis of '{k}' ({v.shape[0]}) must be divisible by the "
                f"mesh 'data' axis ({data_size}); set batch_size to a multiple "
                f"of the data-parallel degree or pass a smaller mesh"
            )
        if cp and v.ndim > 1 and v.shape[1] % model_size != 0:
            raise ValueError(
                f"sequence axis of '{k}' ({v.shape[1]}) must be divisible by "
                f"the mesh 'model' axis ({model_size}) under context "
                f"parallelism"
            )
    if mesh.devices.size == 1:
        # Plain (uncommitted) placement. Semantically identical on one
        # device, and it avoids committing the jitted step's donated state
        # to a NamedSharding — which, through the axon remote-TPU tunnel,
        # flips every later dispatch onto a slow path (~6 s/step measured
        # at the 131k headline config; local TPU VMs are unaffected).
        return jax.device_put(batch)

    def leaf_sharding(x):
        # rank-1 entries (e.g. per-row metadata) can't take the L spec
        if cp and getattr(x, "ndim", 0) < 2:
            return NamedSharding(mesh, P(DATA_AXIS))
        return sharding

    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, leaf_sharding(x)), batch
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(leaf_sharding(x), x),
        batch,
    )


# ---------------------------------------------------------------------------
# Ambient mesh registry
#
# Model code (e.g. the context-parallel scan switch on BiMamba) needs the
# active Mesh to build shard_map regions, but flax modules are constructed
# from config alone. The runtime (Trainer / VEP / dryrun) registers its mesh
# here; jax 0.9's `jax.sharding.use_mesh` ambient-mesh API is not available
# in this environment, so this is the equivalent explicit context.
# ---------------------------------------------------------------------------

_GLOBAL_MESH: Optional[Mesh] = None


def set_global_mesh(mesh: Optional[Mesh]) -> None:
    global _GLOBAL_MESH
    _GLOBAL_MESH = mesh


def get_global_mesh() -> Optional[Mesh]:
    return _GLOBAL_MESH


class with_mesh:
    """Context manager: `with with_mesh(mesh): ...`"""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self._prev = None

    def __enter__(self):
        self._prev = get_global_mesh()
        set_global_mesh(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        set_global_mesh(self._prev)
        return False


def shard_map_compat(fn, mesh, in_specs, out_specs):
    """shard_map with varying-axes checking disabled, across jax versions
    (check_vma / check_rep naming) — required for pallas_call bodies, whose
    out ShapeDtypeStructs carry no vma annotation."""
    try:
        from jax import shard_map as _sm
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map as _sm
    for kw in ({"check_vma": False}, {"check_rep": False}, {}):
        try:
            return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                       **kw)
        except TypeError:
            continue
    raise RuntimeError("no compatible shard_map signature")
