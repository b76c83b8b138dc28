"""Optimizer + LR schedule.

Parity targets:
- AdamW with betas (0.9, 0.95), wd 0.1 (`configs/experiment/hg38/hg38.yaml:47-50`);
- per-parameter weight-decay exemption for biases / norms / embeddings
  (`src/utils/optim_groups.py:14-38`) and for the SSM's A_log / D
  (mamba-ssm marks them `_no_weight_decay`) — realized here as an optax mask
  over param-tree paths instead of mutable `_optim` attribute tags;
- timm-style cosine schedule with linear warmup prefix
  (`src/utils/optim/schedulers.py:65-87`, `configs/experiment/hg38/hg38.yaml:39-46`):
  warmup_t steps from warmup_lr_init → lr, then cosine lr → lr_min over
  t_initial steps;
- gradient clipping by global norm (`trainer.gradient_clip_val: 1.0`).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

# param-name suffixes exempt from weight decay
_NO_DECAY_TOKENS = (
    "bias",
    "norm_w",
    "norm_b",
    "norm_f_w",
    "norm_f_b",
    "embedding",
    "A_log",
    "D",
    "dt_proj_b",
    "conv_b",
)


def weight_decay_mask(params: Any) -> Any:
    """True where weight decay applies (2D+ kernels only)."""

    def decide(path, leaf) -> bool:
        names = [str(getattr(p, "key", getattr(p, "name", p))) for p in path]
        if any(n in _NO_DECAY_TOKENS for n in names):
            return False
        return jnp.ndim(leaf) >= 2

    return jax.tree_util.tree_map_with_path(decide, params)


def cosine_warmup_schedule(
    lr: float,
    warmup_t: int,
    t_initial: int,
    lr_min: float = 0.0,
    warmup_lr_init: float = 1e-6,
) -> optax.Schedule:
    """TimmCosineLRScheduler semantics with warmup_prefix=True: the cosine
    phase spans `t_initial` steps *after* warmup."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr_init + (lr - warmup_lr_init) * jnp.minimum(step, warmup_t) / jnp.maximum(warmup_t, 1)
        t = jnp.clip(step - warmup_t, 0, t_initial)
        cos = lr_min + 0.5 * (lr - lr_min) * (1 + jnp.cos(jnp.pi * t / jnp.maximum(t_initial, 1)))
        return jnp.where(step < warmup_t, warm, cos)

    return schedule


def constant_schedule(lr: float) -> optax.Schedule:
    return lambda step: lr


def constant_warmup_schedule(lr: float, warmup_t: int,
                             warmup_lr_init: float = 1e-6) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr_init + (lr - warmup_lr_init) * jnp.minimum(step, warmup_t) / jnp.maximum(warmup_t, 1)
        return jnp.where(step < warmup_t, warm, lr)
    return schedule


def linear_warmup_schedule(lr: float, warmup_t: int, t_initial: int,
                           lr_min: float = 0.0,
                           warmup_lr_init: float = 1e-6) -> optax.Schedule:
    """Linear warmup then linear decay to lr_min."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr_init + (lr - warmup_lr_init) * jnp.minimum(step, warmup_t) / jnp.maximum(warmup_t, 1)
        t = jnp.clip(step - warmup_t, 0, t_initial)
        dec = lr + (lr_min - lr) * t / jnp.maximum(t_initial, 1)
        return jnp.where(step < warmup_t, warm, dec)
    return schedule


def inv_sqrt_schedule(lr: float, warmup_t: int,
                      warmup_lr_init: float = 1e-6) -> optax.Schedule:
    """InvSqrt (`src/utils/optim/schedulers.py`): lr * sqrt(warmup/step)."""
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr_init + (lr - warmup_lr_init) * jnp.minimum(step, warmup_t) / jnp.maximum(warmup_t, 1)
        decay = lr * jnp.sqrt(jnp.maximum(warmup_t, 1) / jnp.maximum(step, jnp.maximum(warmup_t, 1)))
        return jnp.where(step < warmup_t, warm, decay)
    return schedule


def multistep_schedule(lr: float, milestones, gamma: float = 0.1) -> optax.Schedule:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        k = jnp.zeros((), jnp.float32)
        for m in milestones:
            k = k + (step >= m)
        return lr * gamma**k
    return schedule


# name → factory, mirroring the reference scheduler registry
# (`src/utils/registry.py:13-23`).
SCHEDULE_REGISTRY = {
    "constant": constant_schedule,
    "constant_warmup": constant_warmup_schedule,
    "linear_warmup": linear_warmup_schedule,
    "cosine_warmup": cosine_warmup_schedule,
    "cosine_warmup_timm": cosine_warmup_schedule,
    "inv_sqrt": inv_sqrt_schedule,
    "multistep": multistep_schedule,
}


def make_optimizer(
    lr: float = 8e-3,
    weight_decay: float = 0.1,
    betas=(0.9, 0.95),
    warmup_t: int = 0,
    t_initial: int = 10_000,
    lr_min: float = 0.0,
    warmup_lr_init: float = 1e-6,
    gradient_clip: Optional[float] = 1.0,
    params_example: Any = None,
    schedule_name: str = "cosine_warmup_timm",
):
    """AdamW + LR schedule + clipping; returns (tx, schedule_fn)."""
    if schedule_name in ("cosine_warmup", "cosine_warmup_timm"):
        schedule = cosine_warmup_schedule(lr, warmup_t, t_initial, lr_min, warmup_lr_init)
    elif schedule_name == "constant":
        schedule = constant_schedule(lr)
    elif schedule_name == "constant_warmup":
        schedule = constant_warmup_schedule(lr, warmup_t, warmup_lr_init)
    elif schedule_name == "linear_warmup":
        schedule = linear_warmup_schedule(lr, warmup_t, t_initial, lr_min, warmup_lr_init)
    elif schedule_name == "inv_sqrt":
        schedule = inv_sqrt_schedule(lr, warmup_t, warmup_lr_init)
    else:
        raise KeyError(f"unknown schedule: {schedule_name} (have {list(SCHEDULE_REGISTRY)})")
    mask = weight_decay_mask if params_example is None else weight_decay_mask(params_example)
    chain = []
    if gradient_clip is not None:
        chain.append(optax.clip_by_global_norm(gradient_clip))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=betas[0],
            b2=betas[1],
            eps=1e-8,
            weight_decay=weight_decay,
            mask=mask,
        )
    )
    return optax.chain(*chain), schedule
