"""Dropout threading + per-parameter optimizer groups (Hyena parity).

Reference anchors: embed/resid dropout `src/models/sequence/long_conv_lm.py:
252-253,288-309`; recurrence dropout `src/models/sequence/hyena.py:326,405`;
`_optim` per-param lr/wd groups `src/utils/train.py:154-170` +
`configs/model/hyena.yaml:22-24`; layer-decay `train.py:496-541`.
"""

import jax
import jax.numpy as jnp
import numpy as np

from caduceus_tpu.models.hyena import HyenaLMHeadModel
from caduceus_tpu.train.optim import (
    hyena_lr_overrides,
    layer_decay_multipliers,
    lr_multiplier_tree,
    make_optimizer,
)
from caduceus_tpu.train.trainer import TrainState, make_train_step


def _model_and_params(embed_dropout=0.5, resid_dropout=0.3):
    model = HyenaLMHeadModel(
        d_model=16, n_layer=2, vocab_size=12, l_max=32,
        hyena_kwargs={"dropout": 0.2},
        embed_dropout=embed_dropout, resid_dropout=resid_dropout,
    )
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 32), 0, 12)
    params = model.init(jax.random.PRNGKey(1), ids)
    return model, params, ids


def test_dropout_stochastic_in_train_deterministic_in_eval():
    model, params, ids = _model_and_params()
    r1, r2 = jax.random.PRNGKey(10), jax.random.PRNGKey(11)
    y1 = model.apply(params, ids, train=True, rngs={"dropout": r1})
    y2 = model.apply(params, ids, train=True, rngs={"dropout": r2})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))
    e1 = model.apply(params, ids)
    e2 = model.apply(params, ids)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    # eval differs from any single train draw (masking really applied)
    assert not np.allclose(np.asarray(e1), np.asarray(y1))


def test_hyena_filter_lr_groups():
    _, params, _ = _model_and_params(0.0, 0.0)
    lr = 1e-3
    tx, _ = make_optimizer(
        lr=lr, warmup_t=0, t_initial=100, params_example=params,
        lr_overrides=hyena_lr_overrides(lr, lr_filter=1e-4, lr_pos_emb=0.0),
        gradient_clip=None,
    )
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)

    flat = dict(jax.tree_util.tree_flatten_with_path(updates)[0])

    def get(substr):
        hits = [v for k, v in flat.items()
                if substr in "/".join(str(getattr(p, "key", p)) for p in k)]
        assert hits, substr
        return hits

    # pos_emb z frozen (lr_pos_emb=0 → register_buffer in the reference)
    for u in get("pos_emb_z"):
        np.testing.assert_array_equal(np.asarray(u), 0.0)
    for u in get("deltas"):
        np.testing.assert_array_equal(np.asarray(u), 0.0)
    # filter MLP trains at 1e-4: update magnitude 1/10 of a default kernel
    filt = np.abs(np.asarray(get("filter_fn/mlp_in/kernel")[0])).mean()
    base = np.abs(np.asarray(get("backbone/mlp_0/fc1/kernel")[0])).mean()
    assert 5 < base / filt < 20, (base, filt)


def test_lr_override_zero_grad_no_decay():
    """Filter groups carry wd=0: with zero grads their update must be 0,
    while decayed kernels still get the wd pull."""
    _, params, _ = _model_and_params(0.0, 0.0)
    tx, _ = make_optimizer(
        lr=1e-3, warmup_t=0, t_initial=100, params_example=params,
        lr_overrides=hyena_lr_overrides(1e-3), gradient_clip=None,
    )
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    saw_decay = False
    for path, u in flat:
        names = [str(getattr(p, "key", p)) for p in path]
        joined = "/".join(names)
        if "filter_fn" in joined:
            np.testing.assert_array_equal(np.asarray(u), 0.0, err_msg=joined)
        elif "fc1/kernel" in joined:
            assert float(np.abs(np.asarray(u)).max()) > 0, joined
            saw_decay = True
    assert saw_decay


def test_layer_decay_ordering():
    _, params, _ = _model_and_params(0.0, 0.0)
    f = layer_decay_multipliers(params["params"], 0.5)
    flat = jax.tree_util.tree_flatten_with_path(f)[0]
    vals = {"/".join(str(getattr(p, "key", p)) for p in path): v
            for path, v in flat}
    emb = vals["backbone/embedding"]
    l0 = vals["backbone/mixer_0/in_proj/kernel"]
    l1 = vals["backbone/mixer_1/in_proj/kernel"]
    head = vals["backbone/ln_f/scale"]
    assert emb < l0 < l1 <= head == 1.0


def test_train_step_with_dropout_runs():
    model, params, ids = _model_and_params()
    tx, _ = make_optimizer(lr=1e-3, warmup_t=0, t_initial=10,
                           params_example=params)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(model.apply, tx, ignore_index=4,
                                   accum_steps=2, dropout=True))
    batch = {"input_ids": np.asarray(jnp.tile(ids, (2, 1))),
             "targets": np.asarray(jnp.tile(ids, (2, 1)))}
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1


def test_lr_multiplier_tree_substring_match():
    params = {"a": {"kernel": jnp.ones((2, 2))}, "b": {"kernel": jnp.ones(2)}}
    t = lr_multiplier_tree(params, 1e-3, [("a/", 1e-4)])
    assert t["a"]["kernel"] == 0.1 and t["b"]["kernel"] == 1.0
