"""Orbax checkpointing: params + optimizer state + step + data-iterator state.

Replaces PL `ModelCheckpoint` (`src/utils/registry.py:49-51`,
`configs/callbacks/checkpoint.yaml`) and the fault-tolerant sampler state
plumbing (`src/dataloaders/genomics.py:198-205`): a checkpoint restores the
exact (model, optimizer, schedule step, mid-epoch data position) tuple.

Also provides backbone-only loading for fine-tuning — the semantics of
`load_backbone` (`src/models/sequence/dna_embedding.py:198-255`): pretrained
backbone weights are grafted into a freshly-initialized downstream model,
keeping scratch init for head/decoder params.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def _manager(path: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(path),
        options=ocp.CheckpointManagerOptions(max_to_keep=2, create=True),
    )


def _state_dict(state):
    d = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    if getattr(state, "ema_params", None) is not None:
        d["ema_params"] = state.ema_params
    return d


def save_checkpoint(path: str, state, loader_state: Optional[dict] = None) -> str:
    step = int(jax.device_get(state.step))
    mgr = _manager(path)
    mgr.save(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(_state_dict(state)),
        ),
    )
    mgr.wait_until_finished()
    if loader_state is not None and jax.process_index() == 0:
        with open(os.path.join(path, f"loader_state_{step}.json"), "w") as f:
            json.dump(loader_state, f)
    mgr.close()
    return os.path.join(path, str(step))


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    mgr = _manager(path)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(path: str, state_template) -> Tuple[Any, Optional[dict]]:
    """Restore into the structure of `state_template` (a TrainState)."""
    from caduceus_tpu.train.trainer import TrainState

    mgr = _manager(path)
    step = mgr.latest_step()
    assert step is not None, f"no checkpoint under {path}"
    template = _state_dict(state_template)
    if jax.device_count() == 1:
        # Single-device fast path: restore against an ABSTRACT template
        # (ShapeDtypeStruct — structure, incl. optax NamedTuples, is kept;
        # arrays come back as host numpy) instead of concrete device
        # arrays. Orbax's concrete-template restore places every leaf on
        # device one array at a time, which is pathological through a
        # remote/tunneled TPU (~0.2-2 s per transfer × ~800 leaves ≈ tens
        # of minutes for an 8M-param TrainState — measured on the r5 arm-A
        # resume). Host arrays enter the jitted step uncommitted and are
        # staged in one batch on first dispatch (also keeping the
        # uncommitted-placement tunnel fast path; see parallel/mesh.py).
        # Multi-device runs keep the concrete template: its shardings are
        # the restore layout.
        import numpy as np

        def _host(x):
            if hasattr(x, "shape") and hasattr(x, "dtype"):
                return np.zeros(x.shape, x.dtype)
            return np.asarray(x)

        template = jax.tree_util.tree_map(_host, template)

    def _restore(tpl):
        return mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(tpl)),
        )["state"]

    want_ema = "ema_params" in template
    try:
        restored = _restore(template)
    except ValueError as first_err:
        # EMA-presence mismatch: the run and the caller's template may
        # disagree about ema_params (e.g. `eval`/`serve` restoring an
        # EMA-enabled run with a default TrainerConfig, or resuming a
        # non-EMA run with EMA newly enabled). Retry with the toggled
        # template; if THAT also fails, the mismatch was something else
        # (wrong architecture, corrupt checkpoint) — surface the
        # original error, not a misleading ema-flavored one.
        if want_ema:
            alt = {k: v for k, v in template.items() if k != "ema_params"}
        else:
            alt = dict(template, ema_params=template["params"])
        try:
            restored = _restore(alt)
        except ValueError:
            raise first_err
    mgr.close()
    loader_state = None
    lpath = os.path.join(path, f"loader_state_{step}.json")
    if os.path.exists(lpath):
        with open(lpath) as f:
            loader_state = json.load(f)
    # EMA presence in the returned state follows the CALLER's template,
    # not the checkpoint: a run resumed with EMA newly enabled seeds the
    # EMA from the restored params (tree_map in the train step needs a
    # real tree), and a run resumed with EMA disabled drops the stale
    # checkpoint EMA (it would never update, yet eval would report
    # frozen '/ema' metrics from it).
    ema = None
    if want_ema:
        ema = restored.get("ema_params")
        if ema is None:
            ema = restored["params"]
    return TrainState(
        restored["params"], restored["opt_state"], restored["step"],
        ema,
    ), loader_state


def load_run_params(run_dir: str, prefer_ema: bool = True):
    """Parameters-only restore from a training run's latest checkpoint,
    WITHOUT a TrainState template — deployment loaders (serve, generate)
    must not need to reconstruct the run's optimizer/EMA configuration
    just to read weights. Returns (params, step). ``prefer_ema`` serves
    the EMA weights when the run kept them (the reference's eval-swap
    protocol)."""
    path = os.path.join(run_dir, "checkpoints")
    step = latest_step(path)
    assert step is not None, f"no checkpoint in {run_dir}"
    mgr = _manager(path)
    raw = mgr.restore(step)  # raw pytree, no template
    mgr.close()
    state = raw.get("state", raw)
    params = None
    if prefer_ema:
        params = state.get("ema_params")
    if params is None:
        params = state["params"]
    return params, step


def save_params(path: str, params) -> None:
    """Weights-only artifact (for releasing pretrained backbones)."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), params)
    ckpt.wait_until_finished()
    ckpt.close()


def load_params(path: str, template=None):
    ckpt = ocp.StandardCheckpointer()
    out = ckpt.restore(os.path.abspath(path), template) if template is not None else ckpt.restore(os.path.abspath(path))
    ckpt.close()
    return out


def load_backbone(pretrained_params, scratch_params, freeze: bool = False):
    """Graft pretrained backbone params into a downstream model's tree.

    Semantics of `load_backbone` (`dna_embedding.py:198-255`): every leaf
    under 'backbone' whose path exists in the pretrained tree is replaced;
    head/decoder/score leaves keep their scratch init.
    Returns the merged params pytree.
    """
    flat_pre = dict(jax.tree_util.tree_flatten_with_path(pretrained_params)[0])
    flat_scr, treedef = jax.tree_util.tree_flatten_with_path(scratch_params)
    merged = []
    for path, leaf in flat_scr:
        if path in flat_pre and flat_pre[path].shape == leaf.shape:
            merged.append(flat_pre[path].astype(leaf.dtype))
        else:
            merged.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, merged)
