"""Mamba-2 / SSD tests: the chunked dual form vs the sequential oracle,
single-step recurrence, state chaining, and the Caduceus-2 model family
(RC equivariance with the v2 mixer, train-step smoke).

The SSD op (`ops/ssd.py`) and model family (`models/mamba2.py`) are beyond
the reference (it pins mamba-ssm 1.2.0, pre-Mamba-2); semantics follow
mamba-ssm 2.x `Mamba2` / arXiv:2405.21060.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from caduceus_tpu.config import CaduceusConfig, SSMConfig
from caduceus_tpu.models.caduceus import CaduceusForMaskedLM
from caduceus_tpu.ops.ssd import ssd_chunked, ssd_ref, ssd_step
from caduceus_tpu.tokenization import CaduceusTokenizer


def make_inputs(G=2, L=100, H=4, P=8, NG=2, N=16, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda s, sc=1.0: jnp.asarray(rng.standard_normal(s) * sc, jnp.float32)
    x = mk((G, L, H, P))
    dt = mk((G, L, H), 0.5)
    A = -jnp.exp(mk((H,), 0.5))
    B = mk((G, L, NG, N))
    C = mk((G, L, NG, N))
    D = mk((H,))
    bias = mk((H,), 0.1)
    return x, dt, A, B, C, D, bias


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("chunk", [16, 32, 100])
def test_chunked_matches_oracle(reverse, chunk):
    x, dt, A, B, C, D, bias = make_inputs()
    y0, h0 = ssd_ref(x, dt, A, B, C, D, bias, True, reverse,
                     return_final_state=True)
    y1, h1 = ssd_chunked(x, dt, A, B, C, D, bias, True, reverse,
                         chunk_size=chunk, return_final_state=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1),
                               rtol=1e-4, atol=1e-4)


def test_chunked_odd_length_padding():
    # L=77 not a multiple of the chunk: identity pad steps must not
    # perturb y or the final state
    x, dt, A, B, C, D, bias = make_inputs(L=77)
    y0, h0 = ssd_ref(x, dt, A, B, C, D, bias, True, False,
                     return_final_state=True)
    y1, h1 = ssd_chunked(x, dt, A, B, C, D, bias, True, False,
                         chunk_size=32, return_final_state=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reverse", [False, True])
def test_chunked_padding_no_softplus_with_bias(reverse):
    """ADVICE r2 regression: with dt_softplus=False and a nonzero dt_bias,
    the raw-dt pad value must be -dt_bias (resolved dt = 0), not 0 — a zero
    raw pad leaks `bias`-sized decay/drive steps into the final state."""
    x, dt, A, B, C, D, bias = make_inputs(L=77)
    bias = bias + 0.7  # make the leak large if the pad is wrong
    y0, h0 = ssd_ref(x, dt, A, B, C, D, bias, False, reverse,
                     return_final_state=True)
    y1, h1 = ssd_chunked(x, dt, A, B, C, D, bias, False, reverse,
                         chunk_size=32, return_final_state=True)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1),
                               rtol=1e-4, atol=1e-4)


def test_grads_match_oracle():
    x, dt, A, B, C, D, bias = make_inputs(L=64)

    def loss(f):
        return lambda *a: jnp.sum(f(*a, D, bias, True, False) ** 2)

    g0 = jax.grad(loss(ssd_ref), argnums=(0, 1, 2, 3, 4))(x, dt, A, B, C)
    g1 = jax.grad(loss(ssd_chunked), argnums=(0, 1, 2, 3, 4))(x, dt, A, B, C)
    for a, b in zip(g0, g1):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max() + 1e-9
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-5)
        assert np.isfinite(b).all()


def test_step_matches_scan():
    x, dt, A, B, C, D, bias = make_inputs(G=1, L=40)
    y0 = ssd_ref(x, dt, A, B, C, D, bias, True, False)
    G, L, H, P = x.shape
    N = B.shape[-1]
    h = jnp.zeros((G, H, N, P), jnp.float32)
    ys = []
    for t in range(L):
        h, yt = ssd_step(h, x[:, t], dt[:, t], A, B[:, t], C[:, t], D,
                         bias, True)
        ys.append(yt)
    np.testing.assert_allclose(
        np.asarray(y0), np.asarray(jnp.stack(ys, axis=1)),
        rtol=1e-4, atol=1e-4)


def test_state_chaining():
    # split the sequence; final state of the head chains into the tail
    x, dt, A, B, C, D, bias = make_inputs(L=96)
    y_full = ssd_chunked(x, dt, A, B, C, D, bias, True, False, 32)
    cut = 40
    _, h_mid = ssd_chunked(x[:, :cut], dt[:, :cut], A, B[:, :cut],
                           C[:, :cut], D, bias, True, False, 32,
                           return_final_state=True)
    y_tail = ssd_chunked(x[:, cut:], dt[:, cut:], A, B[:, cut:], C[:, cut:],
                         D, bias, True, False, 32, h_init=h_mid)
    np.testing.assert_allclose(np.asarray(y_full[:, cut:]),
                               np.asarray(y_tail), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_conv_matches_composed(reverse):
    # fused-conv mode == causal_conv1d -> split -> oracle
    from caduceus_tpu.ops.conv import causal_conv1d

    rng = np.random.default_rng(3)
    G, L, H, P, NG, N, K = 2, 100, 4, 8, 2, 16, 4
    ch = H * P + 2 * NG * N
    mk = lambda s, sc=1.0: jnp.asarray(rng.standard_normal(s) * sc,
                                       jnp.float32)
    xBC = mk((G, L, ch))
    dt = mk((G, L, H), 0.5)
    A = -jnp.exp(mk((H,), 0.5))
    D, bias = mk((H,)), mk((H,), 0.1)
    cw, cb = mk((K, ch), 0.3), mk((ch,), 0.1)
    xc = causal_conv1d(xBC, cw, cb, activation="silu", reverse=reverse)
    x_in, B, C = jnp.split(xc, [H * P, H * P + NG * N], axis=-1)
    y0 = ssd_ref(x_in.reshape(G, L, H, P), dt, A, B.reshape(G, L, NG, N),
                 C.reshape(G, L, NG, N), D, bias, True, reverse)
    y1 = ssd_chunked(xBC, dt, A, None, None, D, bias, True, reverse,
                     chunk_size=32, conv_w=cw, conv_b=cb, dims=(H, P, NG, N))
    np.testing.assert_allclose(np.asarray(y0),
                               np.asarray(y1.reshape(G, L, H, P)),
                               rtol=1e-4, atol=1e-4)
    g = jax.grad(lambda w: jnp.sum(ssd_chunked(
        xBC, dt, A, None, None, D, bias, True, reverse, 48,
        conv_w=w, conv_b=cb, dims=(H, P, NG, N)) ** 2))(cw)
    assert bool(jnp.isfinite(g).all())


@pytest.mark.parametrize("seg_chunks", [1, 3])
def test_seg_chunks_invariance(seg_chunks):
    x, dt, A, B, C, D, bias = make_inputs(L=96)
    y0 = ssd_ref(x, dt, A, B, C, D, bias, True, False)
    y1 = ssd_chunked(x, dt, A, B, C, D, bias, True, False, 16,
                     seg_chunks=seg_chunks)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-4)


def test_single_group_broadcast():
    # NG=1 (the mamba-ssm default): every head shares one B/C
    x, dt, A, B, C, D, bias = make_inputs(NG=1, N=8)
    y0 = ssd_ref(x, dt, A, B, C, D, bias, True, False)
    y1 = ssd_chunked(x, dt, A, B, C, D, bias, True, False, 32)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Model family
# ---------------------------------------------------------------------------

def v2_config(**kw) -> CaduceusConfig:
    tok = CaduceusTokenizer()
    defaults = dict(
        d_model=32,
        n_layer=2,
        vocab_size=tok.vocab_size,
        ssm_cfg=SSMConfig(version=2, d_state=16, headdim=8),
        rcps=True,
        complement_map=tok.complement_map,
        dtype="float32",
    )
    defaults.update(kw)
    return CaduceusConfig(**defaults)


def _rc_ids(cfg, ids):
    cm = cfg.padded_complement_map()
    comp = jnp.asarray([cm.get(i, i) for i in range(cfg.padded_vocab_size)])
    return jnp.flip(comp[ids], axis=1), comp


@pytest.mark.parametrize("tie", [True, False])
@pytest.mark.parametrize("strategy", ["add", "ew_multiply"])
def test_caduceus2_rc_equivariance(tie, strategy):
    cfg = v2_config(bidirectional_weight_tie=tie,
                    bidirectional_strategy=strategy)
    model = CaduceusForMaskedLM(cfg)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 48), 7, 11)
    params = model.init(jax.random.PRNGKey(0), ids)
    logits = model.apply(params, ids)
    rc_ids, comp = _rc_ids(cfg, ids)
    lo_rc = model.apply(params, rc_ids)
    np.testing.assert_allclose(
        np.asarray(lo_rc),
        np.asarray(jnp.flip(logits, axis=1)[..., comp]),
        rtol=6e-4, atol=2e-3,
    )


def test_caduceus2_variants_build():
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 32), 7, 11)
    for kw in (dict(rcps=False), dict(rcps=False, bidirectional=False),
               dict(rcps=False, fused_add_norm=False)):
        cfg = v2_config(**kw)
        model = CaduceusForMaskedLM(cfg)
        params = model.init(jax.random.PRNGKey(0), ids)
        out = model.apply(params, ids)
        assert out.shape == (2, 32, cfg.padded_vocab_size)


def test_caduceus2_train_step_learns():
    from caduceus_tpu.train.trainer import TrainState, make_train_step

    cfg = v2_config(n_layer=1)
    model = CaduceusForMaskedLM(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(7, 11, (4, 64)), jnp.int32),
        "targets": jnp.asarray(rng.integers(7, 11, (4, 64)), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch["input_ids"])
    tx = optax.adam(1e-2)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(model.apply, tx, ignore_index=4))
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.1, losses


def test_v2_config_validation():
    with pytest.raises(ValueError):
        v2_config(ssm_cfg=SSMConfig(version=2, headdim=7))
    # r3: CP+TP on DISTINCT axes and ngroups>1 TP are now supported
    # (test_v2_cp_tp_composed / test_v2_tp_ngroups_gt1); only the
    # same-axis combination is rejected
    v2_config(tensor_parallel_axis="model", context_parallel_axis="seq")
    v2_config(tensor_parallel_axis="model",
              ssm_cfg=SSMConfig(version=2, headdim=8, ngroups=2))
    with pytest.raises(ValueError):
        v2_config(tensor_parallel_axis="model",
                  context_parallel_axis="model")
    with pytest.raises(NotImplementedError):
        v2_config(ssm_cfg=SSMConfig(version=3))


# ---------------------------------------------------------------------------
# v2 parallelism: sequence-parallel SSD (CP) and per-head shard_map (TP)
# ---------------------------------------------------------------------------

@pytest.fixture
def mesh8():
    from caduceus_tpu.parallel.mesh import make_mesh

    assert jax.device_count() >= 8
    return make_mesh(jax.devices()[:8])


@pytest.mark.parametrize("reverse", [False, True])
def test_sequence_parallel_ssd_matches_full(mesh8, reverse):
    from caduceus_tpu.parallel.seq_scan import sequence_parallel_ssd

    x, dt, A, B, C, D, bias = make_inputs(L=128)
    got = sequence_parallel_ssd(
        x, dt, A, B, C, D=D, dt_bias=bias, dt_softplus=True, reverse=reverse,
        mesh=mesh8, axis="data", chunk_size=8,
    )
    want = ssd_chunked(x, dt, A, B, C, D=D, dt_bias=bias, dt_softplus=True,
                       reverse=reverse, chunk_size=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_sequence_parallel_ssd_ragged_no_softplus(mesh8):
    """ADVICE r2 repro: dt_softplus=False + nonzero dt_bias with a shard
    length that is NOT a multiple of chunk_size·seg_chunks — the pass-1
    boundary states must still be exact (final-state error was 2.38 before
    the `ssd_chunked` pad fix)."""
    from caduceus_tpu.parallel.seq_scan import sequence_parallel_ssd

    # 8 shards of length 17: ragged vs chunk_size=8, seg_chunks=8
    x, dt, A, B, C, D, bias = make_inputs(L=136)
    bias = bias + 0.7
    got = sequence_parallel_ssd(
        x, dt, A, B, C, D=D, dt_bias=bias, dt_softplus=False,
        mesh=mesh8, axis="data", chunk_size=8, seg_chunks=8,
    )
    want = ssd_ref(x, dt, A, B, C, D, bias, False, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("reverse", [False, True])
def test_sequence_parallel_ssd_pallas_local_impl(mesh8, reverse):
    """CP with the chained Pallas SSD kernel as the local scan: forward and
    gradients match the single-device XLA form."""
    from caduceus_tpu.parallel.seq_scan import sequence_parallel_ssd

    x, dt, A, B, C, D, bias = make_inputs(L=128)

    def loss_cp(args):
        x, dt, A, B, C, D, bias = args
        y = sequence_parallel_ssd(
            x, dt, A, B, C, D=D, dt_bias=bias, dt_softplus=True,
            reverse=reverse, mesh=mesh8, axis="data", chunk_size=8,
            local_impl="pallas_interpret")
        return jnp.sum(jnp.square(y))

    def loss_ref(args):
        x, dt, A, B, C, D, bias = args
        y = ssd_chunked(x, dt, A, B, C, D=D, dt_bias=bias, dt_softplus=True,
                        reverse=reverse, chunk_size=8)
        return jnp.sum(jnp.square(y))

    args = (x, dt, A, B, C, D, bias)
    v_cp, g_cp = jax.value_and_grad(loss_cp)(args)
    v_ref, g_ref = jax.value_and_grad(loss_ref)(args)
    np.testing.assert_allclose(float(v_cp), float(v_ref), rtol=1e-4)
    for n, a, b in zip("x dt A B C D bias".split(), g_cp, g_ref):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=5e-4, err_msg=f"{n} reverse={reverse}")


def test_v2_model_context_parallel(mesh8):
    """context_parallel_axis on the v2 RCPS model: L-sharded forward and
    backward match the unsharded model."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from caduceus_tpu.parallel.mesh import with_mesh

    B, L = 2, 128
    ids = np.random.default_rng(0).integers(7, 11, (B, L)).astype(np.int32)
    plain = CaduceusForMaskedLM(v2_config())
    params = plain.init(jax.random.PRNGKey(0), ids)
    want = plain.apply(params, ids)

    cp_model = CaduceusForMaskedLM(v2_config(context_parallel_axis="data"))
    ids_sharded = jax.device_put(
        jnp.asarray(ids), NamedSharding(mesh8, P(None, "data"))
    )
    with with_mesh(mesh8):
        got = jax.jit(cp_model.apply)(params, ids_sharded)

        def loss(p, x):
            return jnp.sum(jnp.square(cp_model.apply(p, x).astype(jnp.float32)))

        g_cp = jax.jit(jax.grad(loss))(params, ids_sharded)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)

    def loss_plain(p, x):
        return jnp.sum(jnp.square(plain.apply(p, x).astype(jnp.float32)))

    g_ref = jax.jit(jax.grad(loss_plain))(params, jnp.asarray(ids))
    for a, b in zip(jax.tree_util.tree_leaves(g_cp),
                    jax.tree_util.tree_leaves(g_ref)):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=5e-4)


def test_v2_tp_step_matches_dp_step():
    """tensor_parallel_axis on the v2 model: the SSD runs per-head-shard
    under shard_map; (data=4, model=2) step numerics match single-device."""
    import optax

    from caduceus_tpu.parallel.mesh import make_mesh, shard_batch, with_mesh
    from caduceus_tpu.parallel.sharding import shard_params
    from caduceus_tpu.train.trainer import TrainState, make_train_step

    assert jax.device_count() >= 8
    rng = np.random.default_rng(0)
    batch = {
        "input_ids": rng.integers(7, 11, (4, 32), dtype=np.int32),
        "targets": rng.integers(7, 11, (4, 32), dtype=np.int32),
    }
    ref_model = CaduceusForMaskedLM(v2_config())
    params = ref_model.init(jax.random.PRNGKey(0), batch["input_ids"][:1])
    tx = optax.adam(1e-3)

    s_1 = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_ref = jax.jit(make_train_step(ref_model.apply, tx))
    s_1, m_1 = step_ref(s_1, batch)

    mesh = make_mesh(jax.devices()[:8], model=2)
    tp_model = CaduceusForMaskedLM(v2_config(tensor_parallel_axis="model"))
    with with_mesh(mesh):
        p_tp = shard_params(mesh, params)
        s_tp = TrainState(p_tp, jax.jit(tx.init)(p_tp),
                          jnp.zeros((), jnp.int32))
        step_tp = jax.jit(make_train_step(tp_model.apply, tx))
        s_tp, m_tp = step_tp(s_tp, shard_batch(mesh, batch))

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s_tp.params),
                    jax.tree_util.tree_leaves(s_1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("ntp,ngroups", [(2, 2), (4, 2)])
def test_v2_tp_ngroups_gt1(ntp, ngroups):
    """ngroups>1 tensor parallelism (VERDICT r2 #8): group-aligned head
    shards — NG % ntp == 0 shards B/C over groups (zero duplication);
    ntp % NG == 0 replicates B/C and slices the shard's group locally.
    Forward parity vs the unsharded model."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from caduceus_tpu.parallel.mesh import make_mesh, with_mesh
    from caduceus_tpu.parallel.sharding import shard_params

    assert jax.device_count() >= 8
    B, L = 2, 64
    ids = np.random.default_rng(3).integers(7, 11, (B, L)).astype(np.int32)
    plain = CaduceusForMaskedLM(v2_config(
        ssm_cfg=SSMConfig(version=2, d_state=16, headdim=8, ngroups=ngroups)))
    params = plain.init(jax.random.PRNGKey(0), ids)
    want = plain.apply(params, ids)

    mesh = make_mesh(jax.devices()[:8], model=ntp)
    tp_model = CaduceusForMaskedLM(v2_config(
        ssm_cfg=SSMConfig(version=2, d_state=16, headdim=8, ngroups=ngroups),
        tensor_parallel_axis="model"))
    with with_mesh(mesh):
        p_tp = shard_params(mesh, params)
        got = jax.jit(tp_model.apply)(p_tp, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_v2_cp_tp_composed():
    """CP+TP composition (VERDICT r2 #8): a (data=2, model=2, seq=2) mesh,
    params/heads sharded over 'model' AND the sequence sharded over 'seq'
    in the same run — forward and parameter gradients match the unsharded
    model. The config.py rejection is gone; distinct axes are required."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from caduceus_tpu.parallel.mesh import make_mesh, with_mesh
    from caduceus_tpu.parallel.sharding import shard_params

    assert jax.device_count() >= 8
    B, L = 2, 128
    ids = np.random.default_rng(4).integers(7, 11, (B, L)).astype(np.int32)
    plain = CaduceusForMaskedLM(v2_config())
    params = plain.init(jax.random.PRNGKey(0), ids)
    want = plain.apply(params, ids)

    mesh = make_mesh(jax.devices()[:8], data=2, model=2, seq=2)
    assert dict(mesh.shape) == {"data": 2, "model": 2, "seq": 2}
    comp = CaduceusForMaskedLM(v2_config(
        tensor_parallel_axis="model", context_parallel_axis="seq"))
    ids_sharded = jax.device_put(
        jnp.asarray(ids), NamedSharding(mesh, P(None, "seq")))
    with with_mesh(mesh):
        p_sh = shard_params(mesh, params)
        got = jax.jit(comp.apply)(p_sh, ids_sharded)

        def loss(p, x):
            return jnp.sum(jnp.square(comp.apply(p, x).astype(jnp.float32)))

        g = jax.jit(jax.grad(loss))(p_sh, ids_sharded)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)

    def loss_plain(p, x):
        return jnp.sum(jnp.square(plain.apply(p, x).astype(jnp.float32)))

    g_ref = jax.grad(loss_plain)(params, jnp.asarray(ids))
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_ref)):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=5e-4)


def test_v2_same_axis_cp_tp_rejected():
    with pytest.raises(ValueError):
        v2_config(tensor_parallel_axis="model",
                  context_parallel_axis="model")


def test_v2_model_context_parallel_fused_kernel(mesh8):
    """CP with use_kernel='pallas_batched_interpret' takes the FUSED-conv
    sequence-parallel path (`sequence_parallel_ssd_fused` — conv + SiLU +
    split inside the per-shard kernels, halo as one 8-row ppermute):
    forward and backward match the unsharded XLA model."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from caduceus_tpu.parallel.mesh import with_mesh

    B, L = 2, 128
    ids = np.random.default_rng(3).integers(7, 11, (B, L)).astype(np.int32)
    plain = CaduceusForMaskedLM(v2_config())
    params = plain.init(jax.random.PRNGKey(0), ids)
    want = plain.apply(params, ids)

    cp_model = CaduceusForMaskedLM(v2_config(
        context_parallel_axis="data",
        ssm_cfg=SSMConfig(version=2, d_state=16, headdim=8,
                          use_kernel="pallas_batched_interpret"),
    ))
    ids_sharded = jax.device_put(
        jnp.asarray(ids), NamedSharding(mesh8, P(None, "data"))
    )
    with with_mesh(mesh8):
        got = jax.jit(cp_model.apply)(params, ids_sharded)

        def loss(p, x):
            return jnp.sum(jnp.square(cp_model.apply(p, x).astype(jnp.float32)))

        g_cp = jax.jit(jax.grad(loss))(params, ids_sharded)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)

    def loss_plain(p, x):
        return jnp.sum(jnp.square(plain.apply(p, x).astype(jnp.float32)))

    g_ref = jax.jit(jax.grad(loss_plain))(params, jnp.asarray(ids))
    for a, b in zip(jax.tree_util.tree_leaves(g_cp),
                    jax.tree_util.tree_leaves(g_ref)):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=5e-4)


def test_v2_cp_fused_fallback_unaligned_shard(mesh8):
    """ADVICE r4: per-shard lengths not segment-aligned (L_loc % Ts != 0)
    cannot use the fused-CP kernels (edge_hist forbids tail padding); the
    model must fall back to the unfused sequence-parallel path instead of
    assert-failing at trace time. L=384 over 8 shards -> L_loc=48; chunk 16
    x seg 2 -> Ts=32, 48 % 32 != 0."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from caduceus_tpu.parallel.mesh import with_mesh

    B, L = 2, 384
    ids = np.random.default_rng(7).integers(7, 11, (B, L)).astype(np.int32)
    ssm = SSMConfig(version=2, d_state=16, headdim=8,
                    ssd_chunk_size=16, ssd_seg_chunks=2)
    plain = CaduceusForMaskedLM(v2_config(ssm_cfg=ssm))
    params = plain.init(jax.random.PRNGKey(0), ids)
    want = plain.apply(params, ids)

    cp_model = CaduceusForMaskedLM(v2_config(
        context_parallel_axis="data",
        ssm_cfg=SSMConfig(version=2, d_state=16, headdim=8,
                          ssd_chunk_size=16, ssd_seg_chunks=2,
                          use_kernel="pallas_batched_interpret"),
    ))
    ids_sharded = jax.device_put(
        jnp.asarray(ids), NamedSharding(mesh8, P(None, "data")))
    with with_mesh(mesh8):
        got = jax.jit(cp_model.apply)(params, ids_sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("ngroups", [1, 2])
def test_v2_cp_tp_composed_fused_kernel(ngroups):
    """r5 (VERDICT r4 #4): CP×TP composed on the FUSED-conv path — per-head
    lane ownership keeps conv+SiLU+split inside the per-shard kernels on a
    (data=2, model=2, seq=2) mesh. ngroups=1 replicates B/C lanes per TP
    shard; ngroups=2 shards the groups with the heads. Forward and
    parameter gradients match the unsharded model."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from caduceus_tpu.parallel.mesh import make_mesh, with_mesh
    from caduceus_tpu.parallel.sharding import shard_params

    assert jax.device_count() >= 8
    B, L = 2, 128
    ids = np.random.default_rng(11).integers(7, 11, (B, L)).astype(np.int32)
    ssm = dict(version=2, d_state=16, headdim=8, ngroups=ngroups)
    plain = CaduceusForMaskedLM(v2_config(ssm_cfg=SSMConfig(**ssm)))
    params = plain.init(jax.random.PRNGKey(0), ids)
    want = plain.apply(params, ids)

    mesh = make_mesh(jax.devices()[:8], data=2, model=2, seq=2)
    comp = CaduceusForMaskedLM(v2_config(
        tensor_parallel_axis="model", context_parallel_axis="seq",
        ssm_cfg=SSMConfig(use_kernel="pallas_batched_interpret", **ssm)))
    ids_sharded = jax.device_put(
        jnp.asarray(ids), NamedSharding(mesh, P(None, "seq")))
    with with_mesh(mesh):
        p_sh = shard_params(mesh, params)
        got = jax.jit(comp.apply)(p_sh, ids_sharded)

        def loss(p, x):
            return jnp.sum(jnp.square(comp.apply(p, x).astype(jnp.float32)))

        g = jax.jit(jax.grad(loss))(p_sh, ids_sharded)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)

    def loss_plain(p, x):
        return jnp.sum(jnp.square(plain.apply(p, x).astype(jnp.float32)))

    g_ref = jax.grad(loss_plain)(params, jnp.asarray(ids))
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_ref)):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=5e-4)
