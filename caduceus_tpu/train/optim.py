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

from typing import Any, Callable, Optional

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


def _path_names(path):
    return [str(getattr(p, "key", getattr(p, "name", p))) for p in path]


def weight_decay_mask(params: Any) -> Any:
    """True where weight decay applies (2D+ kernels only)."""

    def decide(path, leaf) -> bool:
        names = _path_names(path)
        if any(n in _NO_DECAY_TOKENS for n in names):
            return False
        return jnp.ndim(leaf) >= 2

    return jax.tree_util.tree_map_with_path(decide, params)


# ---------------------------------------------------------------------------
# Per-parameter optimizer hyperparameters
#
# The reference registers per-param lr/wd via mutable `_optim` tags
# (`src/utils/train.py:154-170` OptimModule.register; consumed by
# `train.py:460-541`), e.g. the Hyena implicit-filter MLP (lr=`layer.lr`,
# wd=0 — `src/models/sequence/hyena.py:211`, `configs/model/hyena.yaml:22-24`)
# and the positional embedding z (lr_pos_emb; frozen when 0 —
# `hyena.py:114-115`). Here the same effect is an optax transform scaling the
# post-AdamW *update* leaf-wise: Adam's normalized update times factor f is
# exactly AdamW with base_lr*f (wd scales along, matching the reference's
# wd=0 on every registered group). factor 0.0 == register_buffer (frozen).
# ---------------------------------------------------------------------------

def lr_multiplier_tree(params: Any, base_lr: float, overrides) -> Any:
    """Build a per-leaf lr-factor tree.

    ``overrides``: sequence of (match, lr) pairs, first match wins; ``match``
    is a substring tested against the "/".join(path) or a callable
    names->bool; ``lr`` is the absolute learning rate for that group (the
    reference's `_optim["lr"]`), converted to a factor of ``base_lr``.
    """

    def decide(path, leaf):
        names = _path_names(path)
        joined = "/".join(names)
        for match, lr in overrides:
            hit = match(names) if callable(match) else (match in joined)
            if hit:
                return float(lr) / float(base_lr) if base_lr else 0.0
        return 1.0

    return jax.tree_util.tree_map_with_path(decide, params)


def lr_override_membership(params: Any, overrides) -> Any:
    """True where any override group matched (these carry wd=0 in the
    reference regardless of their lr — `src/utils/train.py:157`)."""

    def decide(path, leaf):
        names = _path_names(path)
        joined = "/".join(names)
        return any(
            (m(names) if callable(m) else (m in joined)) for m, _ in overrides
        )

    return jax.tree_util.tree_map_with_path(decide, params)


def layer_decay_multipliers(params: Any, decay: float,
                            get_layer_id=None) -> Any:
    """Layer-wise lr decay (`train.py:496-541`): lr · decay^(max_layer - id).

    ``get_layer_id(names) -> int`` maps a param path to its layer index;
    the default parses the `layers_{i}` / `mixer_{i}` / `ln1_{i}` naming of
    this package's backbones (embedding = layer 0, head = max layer, like
    the reference's `get_num_layer`).
    """
    import re

    def default_layer_id(names):
        for n in names:
            m = re.fullmatch(r"(?:layers|mixer|ln1|ln2|mlp)_(\d+)", n)
            if m:
                return int(m.group(1)) + 1
        if any(n in ("embedding", "pos_embedding") for n in names):
            return 0
        return None  # head / final norm → max layer

    get_layer_id = get_layer_id or default_layer_id
    ids = []

    def collect(path, leaf):
        lid = get_layer_id(_path_names(path))
        ids.append(lid if lid is not None else -1)
        return lid

    id_tree = jax.tree_util.tree_map_with_path(collect, params)
    max_id = max((i for i in ids if i >= 0), default=0) + 1

    def to_factor(lid):
        lid = max_id if lid is None else lid
        return decay ** (max_id - lid)

    return jax.tree_util.tree_map(to_factor, id_tree,
                                  is_leaf=lambda x: x is None or isinstance(x, int))


def hyena_lr_overrides(base_lr: float, lr_filter: Optional[float] = None,
                       lr_pos_emb: float = 0.0,
                       modulation_lr: float = 0.0):
    """The reference Hyena `_optim` groups (`configs/model/hyena.yaml:22-24`,
    `src/models/sequence/hyena.py:108-137,211`): implicit-filter MLP at
    ``lr_filter`` (default = base lr) with wd 0, pos-emb z at ``lr_pos_emb``
    (0 = frozen buffer), modulation deltas at ``modulation_lr`` (0 = frozen).
    """
    lr_filter = base_lr if lr_filter is None else lr_filter
    return [
        (lambda names: "filter_fn" in names and "pos_emb_z" in names, lr_pos_emb),
        (lambda names: "filter_fn" in names and "deltas" in names, modulation_lr),
        (lambda names: "filter_fn" in names, lr_filter),
    ]


def scale_updates_by_tree(factors: Any) -> optax.GradientTransformation:
    """Multiply each update leaf by its factor (per-param lr realization)."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        scaled = jax.tree_util.tree_map(
            lambda u, f: u * jnp.asarray(f, u.dtype), updates, factors
        )
        return scaled, state

    return optax.GradientTransformation(init, update)


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
    lr_overrides=None,
    layer_decay: Optional[float] = None,
    wd_mask_fn: Optional[Callable] = None,
):
    """AdamW + LR schedule + clipping; returns (tx, schedule_fn).

    ``lr_overrides`` (list of (match, lr), see :func:`lr_multiplier_tree`)
    and ``layer_decay`` reproduce the reference's `_optim` param groups and
    layer-wise lr decay; both require ``params_example``.
    """
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
    override_factors = None
    factors = None
    if lr_overrides or layer_decay is not None:
        assert params_example is not None, (
            "lr_overrides/layer_decay need params_example to build the "
            "per-leaf factor tree"
        )
        factors = jax.tree_util.tree_map(lambda _: 1.0, params_example)
        if lr_overrides:
            override_factors = lr_multiplier_tree(params_example, lr, lr_overrides)
            factors = override_factors
        if layer_decay is not None:
            # layer-decay groups KEEP weight decay (`train.py:503-508`)
            ld = layer_decay_multipliers(params_example, layer_decay)
            factors = jax.tree_util.tree_map(lambda a, b: a * b, factors, ld)

    # ``wd_mask_fn`` overrides the default decay mask. One known use: the
    # reference's executed decay set differs from its documented intent —
    # `add_optimizer_hooks` (src/utils/optim_groups.py:25-33) blacklists
    # torch's nn norm classes but NOT mamba_ssm's custom RMSNorm, so the
    # reference hg38 runs DECAY RMSNorm weights; our default mask implements
    # the documented intent (norms exempt). Trajectory-parity tests inject
    # the executed-semantics mask here.
    mask_src = wd_mask_fn if wd_mask_fn is not None else weight_decay_mask
    if params_example is None:
        mask = mask_src
    else:
        mask = mask_src(params_example)
        if lr_overrides:
            # `_optim` override groups carry wd=0 in the reference
            # (`src/utils/train.py:157` register defaults wd=0.0)
            member = lr_override_membership(params_example, lr_overrides)
            mask = jax.tree_util.tree_map(
                lambda m, o: bool(m) and not o, mask, member
            )
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
    if factors is not None:
        chain.append(scale_updates_by_tree(factors))
    return optax.chain(*chain), schedule
