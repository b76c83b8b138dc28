"""Head-batched Pallas SSD kernels vs the XLA oracle — interpret mode on CPU.

`ops/ssd_pallas_batched.py` restructures the SSD chunk algebra so the MXU
sees full-width (T, H·P) matmuls with an (N, H·P) state layout instead of a
per-head loop; the math is identical to `ops/ssd.py` (`ssd_ref` /
`ssd_chunked`), so numerics must match exactly with fp32 carries and within
the bf16 precision class with the default carries (same contract as
tests/test_ssd_pallas.py for the base kernel).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from caduceus_tpu.ops.ssd import ssd_chunked, ssd_ref
from caduceus_tpu.ops.ssd_pallas_batched import (
    ssd_pallas_batched,
    ssd_pallas_batched_chained,
)


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
@pytest.mark.parametrize("chunk", [16, 100])  # 100: single padded chunk
def test_fwd_matches_oracle(reverse, chunk):
    x, dt, A, B, C, D, bias = make_inputs()
    want, hN_want = ssd_ref(x, dt, A, B, C, D, bias, True, reverse,
                            return_final_state=True)
    got, hN = ssd_pallas_batched(
        x, dt, A, B, C, D=D, dt_bias=bias, dt_softplus=True,
        reverse=reverse, chunk_size=chunk, interpret=True,
        return_final_state=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hN), np.asarray(hN_want),
                               rtol=1e-4, atol=1e-4)


def test_fwd_single_group():
    # NG=1 (the mamba-ssm default): one B/C shared by every head — the
    # layout the head-batching is designed for (one full-width matmul)
    x, dt, A, B, C, D, bias = make_inputs(NG=1, N=8)
    want = ssd_ref(x, dt, A, B, C, D, bias, True, False)
    got = ssd_pallas_batched(
        x, dt, A, B, C, D=D, dt_bias=bias, dt_softplus=True,
        chunk_size=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reverse", [False, True])
def test_grads_match_oracle_fp32_carries(reverse):
    x, dt, A, B, C, D, bias = make_inputs()
    gy = jnp.asarray(
        np.random.default_rng(7).standard_normal(x.shape), jnp.float32)

    def f_ref(*args):
        return jnp.sum(ssd_chunked(
            *args[:5], D=args[5], dt_bias=args[6], dt_softplus=True,
            reverse=reverse, chunk_size=16) * gy)

    def f_pal(*args):
        return jnp.sum(ssd_pallas_batched(
            *args[:5], D=args[5], dt_bias=args[6], dt_softplus=True,
            reverse=reverse, chunk_size=16, interpret=True) * gy)

    args = (x, dt, A, B, C, D, bias)
    g_ref = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
    g_pal = jax.grad(f_pal, argnums=tuple(range(7)))(*args)
    for name, a, b in zip("x dt A B C D bias".split(), g_pal, g_ref):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / s, np.asarray(b) / s, atol=2e-5,
            err_msg=f"grad mismatch: {name} (reverse={reverse})")


def test_grads_single_group():
    # NG=1: the production configuration's gradient path (group-batched
    # gB/gC accumulate over every head in one matmul pair)
    x, dt, A, B, C, D, bias = make_inputs(NG=1, N=8)
    gy = jnp.asarray(
        np.random.default_rng(3).standard_normal(x.shape), jnp.float32)

    def f_ref(*args):
        return jnp.sum(ssd_chunked(
            *args[:5], D=args[5], dt_bias=args[6], dt_softplus=True,
            chunk_size=16) * gy)

    def f_pal(*args):
        return jnp.sum(ssd_pallas_batched(
            *args[:5], D=args[5], dt_bias=args[6], dt_softplus=True,
            chunk_size=16, interpret=True) * gy)

    args = (x, dt, A, B, C, D, bias)
    g_ref = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
    g_pal = jax.grad(f_pal, argnums=tuple(range(7)))(*args)
    for name, a, b in zip("x dt A B C D bias".split(), g_pal, g_ref):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / s, np.asarray(b) / s, atol=2e-5,
            err_msg=f"grad mismatch: {name}")


def test_grads_bf16_carries_within_class(monkeypatch):
    monkeypatch.setenv("CADUCEUS_SSD_CARRY_DTYPE", "bfloat16")
    x, dt, A, B, C, D, bias = make_inputs()

    def f_ref(*args):
        return jnp.sum(jnp.square(ssd_chunked(
            *args[:5], D=args[5], dt_bias=args[6], dt_softplus=True,
            chunk_size=16)))

    def f_pal(*args):
        return jnp.sum(jnp.square(ssd_pallas_batched(
            *args[:5], D=args[5], dt_bias=args[6], dt_softplus=True,
            chunk_size=16, interpret=True)))

    args = (x, dt, A, B, C, D, bias)
    g_ref = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
    g_pal = jax.grad(f_pal, argnums=tuple(range(7)))(*args)
    for name, a, b in zip("x dt A B C D bias".split(), g_pal, g_ref):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / s, np.asarray(b) / s, atol=5e-3,
            err_msg=f"grad mismatch: {name}")


def test_chained_state_and_adjoint():
    """Two chained segments == one full scan, for outputs AND gradients
    (the g_hN → g_h0 boundary-adjoint contract used by CP/prefill)."""
    x, dt, A, B, C, D, bias = make_inputs(L=64)
    half = 32

    def full(x, dt, B, C):
        y, hN = ssd_pallas_batched_chained(
            x, dt, A, B, C, D, bias,
            jnp.zeros((x.shape[0], A.shape[0], B.shape[-1], x.shape[-1]),
                      jnp.float32),
            True, False, 16, True)
        return jnp.sum(jnp.square(y)) + jnp.sum(hN)

    def seg(x, dt, B, C):
        h0 = jnp.zeros((x.shape[0], A.shape[0], B.shape[-1], x.shape[-1]),
                       jnp.float32)
        y1, h1 = ssd_pallas_batched_chained(
            x[:, :half], dt[:, :half], A, B[:, :half], C[:, :half], D, bias,
            h0, True, False, 16, True)
        y2, h2 = ssd_pallas_batched_chained(
            x[:, half:], dt[:, half:], A, B[:, half:], C[:, half:], D, bias,
            h1, True, False, 16, True)
        y = jnp.concatenate([y1, y2], axis=1)
        return jnp.sum(jnp.square(y)) + jnp.sum(h2)

    v_full, g_full = jax.value_and_grad(full, argnums=(0, 1, 2, 3))(x, dt, B, C)
    v_seg, g_seg = jax.value_and_grad(seg, argnums=(0, 1, 2, 3))(x, dt, B, C)
    np.testing.assert_allclose(float(v_seg), float(v_full), rtol=1e-5)
    for name, a, b in zip("x dt B C".split(), g_seg, g_full):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / s, np.asarray(b) / s, atol=5e-3,
            err_msg=f"chained grad mismatch: {name}")


def test_model_batched_matches_xla():
    """BiMamba2 end-to-end: use_kernel=pallas_batched_interpret ==
    use_kernel=xla (forward and parameter gradients) — pins the
    resolve_ssd_kernel dispatch through models/mamba2.py."""
    from caduceus_tpu.config import CaduceusConfig, SSMConfig
    from caduceus_tpu.models.caduceus import CaduceusForMaskedLM
    from caduceus_tpu.tokenization import CaduceusTokenizer

    tok = CaduceusTokenizer()

    def build(kernel):
        cfg = CaduceusConfig(
            d_model=32, n_layer=2, vocab_size=tok.vocab_size,
            ssm_cfg=SSMConfig(version=2, d_state=16, headdim=8,
                              ssd_chunk_size=16, use_kernel=kernel),
            rcps=True, complement_map=tok.complement_map,
            dtype="float32", param_dtype="float32",
        )
        return CaduceusForMaskedLM(cfg)

    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 48), 7, 11)
    m_xla = build("xla")
    m_bat = build("pallas_batched_interpret")
    params = m_xla.init(jax.random.PRNGKey(0), ids)

    want = m_xla.apply(params, ids)
    got = m_bat.apply(params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=2e-4)

    def loss(model):
        def f(p):
            return jnp.mean(jnp.square(model.apply(p, ids)))
        return f

    g_xla = jax.grad(loss(m_xla))(params)
    g_bat = jax.grad(loss(m_bat))(params)
    for (ka, a), (kb, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_bat),
            jax.tree_util.tree_leaves_with_path(g_xla)):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / s, np.asarray(b) / s, atol=5e-3,
            err_msg=f"model grad mismatch at {jax.tree_util.keystr(ka)}")


def test_batched_rejected_for_v1():
    from caduceus_tpu.config import CaduceusConfig, SSMConfig

    with pytest.raises(ValueError, match="pallas_batched"):
        CaduceusConfig(ssm_cfg=SSMConfig(version=1,
                                         use_kernel="pallas_batched"))


def test_sequence_parallel_batched_local_impl():
    """CP with the batched chained kernel as the local scan: forward and
    gradients match the single-device XLA form (pins the
    local_impl='pallas_batched*' dispatch in parallel/seq_scan.py)."""
    from caduceus_tpu.ops.ssd import ssd_chunked
    from caduceus_tpu.parallel.mesh import make_mesh
    from caduceus_tpu.parallel.seq_scan import sequence_parallel_ssd

    assert jax.device_count() >= 8
    mesh8 = make_mesh(jax.devices()[:8])
    x, dt, A, B, C, D, bias = make_inputs(L=128, NG=1, N=16)

    def loss_cp(args):
        x, dt, A, B, C, D, bias = args
        y = sequence_parallel_ssd(
            x, dt, A, B, C, D=D, dt_bias=bias, dt_softplus=True,
            mesh=mesh8, axis="data", chunk_size=8,
            local_impl="pallas_batched_interpret")
        return jnp.sum(jnp.square(y))

    def loss_ref(args):
        x, dt, A, B, C, D, bias = args
        y = ssd_chunked(x, dt, A, B, C, D=D, dt_bias=bias, dt_softplus=True,
                        chunk_size=8)
        return jnp.sum(jnp.square(y))

    args = (x, dt, A, B, C, D, bias)
    v_cp, g_cp = jax.value_and_grad(loss_cp)(args)
    v_ref, g_ref = jax.value_and_grad(loss_ref)(args)
    np.testing.assert_allclose(float(v_cp), float(v_ref), rtol=1e-4)
    for n, a, b in zip("x dt A B C D bias".split(), g_cp, g_ref):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=5e-4, err_msg=n)


def make_fused_inputs(G=2, L=100, H=4, P=8, NG=2, N=16, K=4, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda s, sc=1.0: jnp.asarray(rng.standard_normal(s) * sc,
                                       jnp.float32)
    Wc = H * P + 2 * NG * N
    xBC = mk((G, L, Wc))
    dt = mk((G, L, H), 0.5)
    A = -jnp.exp(mk((H,), 0.5))
    D = mk((H,))
    bias = mk((H,), 0.1)
    cw = mk((K, Wc), 0.5)
    cb = mk((Wc,), 0.1)
    return xBC, dt, A, cw, cb, D, bias, (H, P, NG, N)


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_fwd_matches_oracle(reverse):
    """Fused-conv mode vs `ssd_chunked`'s fused-conv mode: conv + SiLU +
    split inside the kernel, including the segment-boundary conv history
    rows and final-state parity."""
    from caduceus_tpu.ops.ssd_pallas_batched import ssd_pallas_batched_fused

    xBC, dt, A, cw, cb, D, bias, dims = make_fused_inputs()
    want, hN_want = ssd_chunked(
        xBC, dt, A, None, None, D=D, dt_bias=bias, dt_softplus=True,
        reverse=reverse, chunk_size=16, conv_w=cw, conv_b=cb, dims=dims,
        return_final_state=True, seg_chunks=2)
    got, hN = ssd_pallas_batched_fused(
        xBC, dt, A, cw, conv_b=cb, D=D, dt_bias=bias, dims=dims,
        dt_softplus=True, reverse=reverse, chunk_size=16, interpret=True,
        return_final_state=True, seg_chunks=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hN), np.asarray(hN_want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_grads_match_oracle(reverse):
    """Full fused adjoint incl. conv weight/bias grads and the conv
    transpose's cross-chunk/cross-segment spillover carry."""
    from caduceus_tpu.ops.ssd_pallas_batched import ssd_pallas_batched_fused

    xBC, dt, A, cw, cb, D, bias, dims = make_fused_inputs()
    gy = jnp.asarray(np.random.default_rng(7).standard_normal(
        (xBC.shape[0], xBC.shape[1], dims[0], dims[1])), jnp.float32)

    def f_ref(*args):
        return jnp.sum(ssd_chunked(
            args[0], args[1], args[2], None, None, D=args[5],
            dt_bias=args[6], dt_softplus=True, reverse=reverse,
            chunk_size=16, conv_w=args[3], conv_b=args[4], dims=dims,
            seg_chunks=2) * gy)

    def f_pal(*args):
        return jnp.sum(ssd_pallas_batched_fused(
            args[0], args[1], args[2], args[3], conv_b=args[4], D=args[5],
            dt_bias=args[6], dims=dims, dt_softplus=True, reverse=reverse,
            chunk_size=16, interpret=True, seg_chunks=2) * gy)

    args = (xBC, dt, A, cw, cb, D, bias)
    g_ref = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
    g_pal = jax.grad(f_pal, argnums=tuple(range(7)))(*args)
    for name, a, b in zip("xBC dt A cw cb D bias".split(), g_pal, g_ref):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / s, np.asarray(b) / s, atol=2e-5,
            err_msg=f"fused grad mismatch: {name} (reverse={reverse})")


def test_fused_grads_aligned_geometry():
    """128-aligned piece boundaries select the single full-width adjoint
    piece (`_fused_aligned`); must match the oracle like the per-piece
    branch does."""
    from caduceus_tpu.ops.ssd_pallas_batched import (
        _fused_aligned, ssd_pallas_batched_fused)

    xBC, dt, A, cw, cb, D, bias, dims = make_fused_inputs(
        H=2, P=64, NG=1, N=128, L=96)
    assert _fused_aligned(*dims)
    gy = jnp.asarray(np.random.default_rng(5).standard_normal(
        (xBC.shape[0], xBC.shape[1], dims[0], dims[1])), jnp.float32)

    def f_ref(*args):
        return jnp.sum(ssd_chunked(
            args[0], args[1], args[2], None, None, D=args[5],
            dt_bias=args[6], dt_softplus=True, chunk_size=16,
            conv_w=args[3], conv_b=args[4], dims=dims, seg_chunks=2) * gy)

    def f_pal(*args):
        return jnp.sum(ssd_pallas_batched_fused(
            args[0], args[1], args[2], args[3], conv_b=args[4], D=args[5],
            dt_bias=args[6], dims=dims, dt_softplus=True, chunk_size=16,
            interpret=True, seg_chunks=2) * gy)

    args = (xBC, dt, A, cw, cb, D, bias)
    g_ref = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
    g_pal = jax.grad(f_pal, argnums=tuple(range(7)))(*args)
    for name, a, b in zip("xBC dt A cw cb D bias".split(), g_pal, g_ref):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / s, np.asarray(b) / s, atol=2e-5,
            err_msg=f"aligned fused grad mismatch: {name}")


def test_fused_chained_state():
    """Chained fused segments: h_init threads exactly (the conv history at
    the chain boundary comes from each segment's own xBC, matching the
    model's full-sequence semantics only at conv-state-free boundaries —
    so, like `ssd_chunked`, the chain contract covers the SSD state)."""
    from caduceus_tpu.ops.ssd_pallas_batched import ssd_pallas_batched_fused

    xBC, dt, A, cw, cb, D, bias, dims = make_fused_inputs(L=64)
    H, P, NG, N = dims
    G = xBC.shape[0]
    h0 = jnp.asarray(
        np.random.default_rng(11).standard_normal((G, H, N, P)),
        jnp.float32)
    want, hN_want = ssd_chunked(
        xBC, dt, A, None, None, D=D, dt_bias=bias, dt_softplus=True,
        chunk_size=16, conv_w=cw, conv_b=cb, dims=dims, h_init=h0,
        return_final_state=True, seg_chunks=2)
    got, hN = ssd_pallas_batched_fused(
        xBC, dt, A, cw, conv_b=cb, D=D, dt_bias=bias, dims=dims,
        dt_softplus=True, chunk_size=16, interpret=True, h_init=h0,
        return_final_state=True, seg_chunks=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hN), np.asarray(hN_want),
                               rtol=1e-4, atol=1e-4)


def test_h_init_threading():
    """Nonzero h_init: batched == base-oracle with the same initial state."""
    x, dt, A, B, C, D, bias = make_inputs(L=48)
    G, _, H, P = x.shape
    N = B.shape[-1]
    h0 = jnp.asarray(
        np.random.default_rng(11).standard_normal((G, H, N, P)), jnp.float32)
    want, hN_want = ssd_ref(x, dt, A, B, C, D, bias, True, False,
                            h_init=h0, return_final_state=True)
    got, hN = ssd_pallas_batched(
        x, dt, A, B, C, D=D, dt_bias=bias, dt_softplus=True,
        chunk_size=16, interpret=True, h_init=h0, return_final_state=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hN), np.asarray(hN_want),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("ng", [1, 2])
@pytest.mark.parametrize("reverse", [False, True])
def test_fused_cp_edge_hist_contract(reverse, ng):
    """ssd_pallas_batched_fused_cp: two manually-chained shards (edge_hist
    = neighbor boundary rows, h_init = neighbor final state) reproduce the
    full-sequence fused scan — forward AND gradients, including the
    cross-shard conv-transpose spillover carried by the edge_hist
    cotangent (the kernel's emitted pend scratch)."""
    from caduceus_tpu.ops.ssd_pallas_batched import (
        _HIST_ROWS, ssd_pallas_batched_fused_cp)

    G, L, H, P, NG, N = 2, 64, 4, 8, ng, 16
    xBC, dt, A, cw, cb, D, bias, dims = make_fused_inputs(
        G=G, L=L, H=H, P=P, NG=NG, N=N)
    gy = jnp.asarray(
        np.random.default_rng(5).standard_normal((G, L, H, P)), jnp.float32)
    HB = _HIST_ROWS
    kw = dict(dims=dims, dt_softplus=True, reverse=reverse, chunk_size=8,
              interpret=True, seg_chunks=4)

    def loss_full(args):
        xBC, dt, A, cw, cb, D, bias = args
        y = ssd_chunked(xBC, dt, A, None, None, D=D, dt_bias=bias,
                        dt_softplus=True, reverse=reverse, chunk_size=8,
                        conv_w=cw, conv_b=cb, dims=dims)
        return jnp.sum(y.reshape(G, L, H, P) * gy)

    def loss_shards(args):
        xBC, dt, A, cw, cb, D, bias = args
        h0 = jnp.zeros((G, H, N, P), jnp.float32)
        x0, x1 = xBC[:, :L // 2], xBC[:, L // 2:]
        d0, d1 = dt[:, :L // 2], dt[:, L // 2:]
        if not reverse:
            zero_e = jnp.zeros((G, HB, xBC.shape[-1]), jnp.float32)
            y0, hN = ssd_pallas_batched_fused_cp(
                x0, d0, A, cw, cb, D, bias, h0, zero_e, **kw)
            y1, _ = ssd_pallas_batched_fused_cp(
                x1, d1, A, cw, cb, D, bias, hN, x0[:, -HB:], **kw)
        else:
            zero_e = jnp.zeros((G, HB, xBC.shape[-1]), jnp.float32)
            y1, hN = ssd_pallas_batched_fused_cp(
                x1, d1, A, cw, cb, D, bias, h0, zero_e, **kw)
            y0, _ = ssd_pallas_batched_fused_cp(
                x0, d0, A, cw, cb, D, bias, hN, x1[:, :HB], **kw)
        return jnp.sum(jnp.concatenate([y0, y1], axis=1) * gy)

    args = (xBC, dt, A, cw, cb, D, bias)
    v_s, g_s = jax.value_and_grad(loss_shards)(args)
    v_f, g_f = jax.value_and_grad(loss_full)(args)
    np.testing.assert_allclose(float(v_s), float(v_f), rtol=1e-5)
    for n, a, b in zip("xBC dt A cw cb D bias".split(), g_s, g_f):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=1e-5, err_msg=n)


@pytest.mark.parametrize("reverse", [False, True])
def test_sequence_parallel_fused(reverse):
    """Fused-conv CP through shard_map on the 8-device mesh: one halo
    ppermute of 8 boundary raw rows + per-shard fused kernels match the
    single-device fused XLA scan, forward and all gradients."""
    from caduceus_tpu.parallel.mesh import make_mesh
    from caduceus_tpu.parallel.seq_scan import sequence_parallel_ssd_fused

    assert jax.device_count() >= 8
    mesh8 = make_mesh(jax.devices()[:8])
    G, L, H, P, NG, N = 2, 128, 4, 8, 1, 16
    xBC, dt, A, cw, cb, D, bias, dims = make_fused_inputs(
        G=G, L=L, H=H, P=P, NG=NG, N=N)
    gy = jnp.asarray(
        np.random.default_rng(9).standard_normal((G, L, H, P)), jnp.float32)

    def loss_cp(args):
        xBC, dt, A, cw, cb, D, bias = args
        y = sequence_parallel_ssd_fused(
            xBC, dt, A, cw, conv_b=cb, D=D, dt_bias=bias, dims=dims,
            dt_softplus=True, reverse=reverse, mesh=mesh8, axis="data",
            chunk_size=8, seg_chunks=2, interpret=True)
        return jnp.sum(y * gy)

    def loss_ref(args):
        xBC, dt, A, cw, cb, D, bias = args
        y = ssd_chunked(xBC, dt, A, None, None, D=D, dt_bias=bias,
                        dt_softplus=True, reverse=reverse, chunk_size=8,
                        conv_w=cw, conv_b=cb, dims=dims)
        return jnp.sum(y.reshape(G, L, H, P) * gy)

    args = (xBC, dt, A, cw, cb, D, bias)
    v_cp, g_cp = jax.value_and_grad(loss_cp)(args)
    v_ref, g_ref = jax.value_and_grad(loss_ref)(args)
    np.testing.assert_allclose(float(v_cp), float(v_ref), rtol=1e-5)
    for n, a, b in zip("xBC dt A cw cb D bias".split(), g_cp, g_ref):
        s = float(np.abs(np.asarray(b)).max()) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / s, np.asarray(b) / s,
                                   atol=2e-5, err_msg=n)
