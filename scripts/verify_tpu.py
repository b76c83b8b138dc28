"""On-device numerics gate: real Mosaic kernels vs the XLA oracle.

The interpret-mode tests (tests/test_scan_pallas*.py, test_ssd_pallas.py)
validate kernel MATH on CPU; this script validates the actual Mosaic
COMPILATION on the attached TPU — v1 selective scan (fwd/bwd, single- and
paired-direction) against the XLA chunked-scan oracle
(`ops/selective_scan.py`), and the v2 SSD kernels (fwd/bwd/chained
boundary-adjoint contract, `ops/ssd_pallas.py`) against the XLA dual form
(`ops/ssd.py`) — with the scale-aware tolerances of the interpret tests.
Mosaic-vs-interpret divergence (layout bugs, bf16 rounding surprises,
dynamic-slice miscompiles) fails loudly here instead of shipping silently
(VERDICT r1 "what's weak" #2; r2 #2 for the SSD kernel).

Run (also reachable via `BENCH_VERIFY=1 python bench.py`):
    python scripts/verify_tpu.py

Exit code 0 = all checks passed. Prints one line per check.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from caduceus_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def _inputs(key, G, L, d, N, dtype=jnp.float32):
    ks = jax.random.split(key, 7)
    u = jax.random.normal(ks[0], (G, L, d), dtype)
    delta = (jax.random.normal(ks[1], (G, L, d)) * 0.5).astype(dtype)
    A = -jnp.exp(jax.random.normal(ks[2], (d, N)) * 0.5)
    B = jax.random.normal(ks[3], (G, L, N), dtype)
    C = jax.random.normal(ks[4], (G, L, N), dtype)
    D = jax.random.normal(ks[5], (d,))
    dt_bias = jax.random.normal(ks[6], (d,)) * 0.1
    return u, delta, A, B, C, D, dt_bias


def _check(name, got, want, atol, failures):
    got = np.asarray(jax.device_get(got), np.float32)
    want = np.asarray(jax.device_get(want), np.float32)
    scale = float(np.abs(want).max()) + 1e-9
    err = float(np.abs(got - want).max()) / scale
    ok = err <= atol
    print(f"{'PASS' if ok else 'FAIL'}  {name:45s} rel-err {err:.2e} "
          f"(tol {atol:.0e})")
    if not ok:
        failures.append(name)


def main():
    from caduceus_tpu.ops.scan_pallas import selective_scan_pallas
    from caduceus_tpu.ops.scan_pallas_bidir import bidir_selective_scan_pallas
    from caduceus_tpu.ops.selective_scan import selective_scan

    backend = jax.default_backend()
    print(f"backend: {backend}, device: {jax.devices()[0].device_kind}")
    if backend == "cpu":
        print("WARNING: running the 'real Mosaic' gate on CPU exercises "
              "interpret mode only")

    # realistic d/N so production tile paths compile; modest L for speed
    G, L, d, N = 4, 2048, 512, 16
    u, delta, A, B, C, D, dt_bias = _inputs(jax.random.PRNGKey(0), G, L, d, N)
    failures = []

    # ---- forward, both directions ----
    for reverse in (False, True):
        y_k = jax.jit(
            lambda u, delta, A, B, C, D, dt_bias, r=reverse:
            selective_scan_pallas(u, delta, A, B, C, D, None, True, r,
                                  128, 8, False, dt_bias)
        )(u, delta, A, B, C, D, dt_bias)
        y_o = jax.jit(
            lambda u, delta, A, B, C, D, dt_bias, r=reverse:
            selective_scan(u, delta, A, B, C, D=D, delta_bias=dt_bias,
                           delta_softplus=True, reverse=r)
        )(u, delta, A, B, C, D, dt_bias)
        _check(f"fwd kernel reverse={reverse}", y_k, y_o, 2e-3, failures)

    # ---- paired-direction forward ----
    yf, yr = jax.jit(
        lambda u, delta, B, C, A, D, bias: bidir_selective_scan_pallas(
            u, delta, B, C, u, delta, B, C, A, A, D, D, bias, bias,
            True, 128, 8, False)
    )(u, delta, B, C, A, D, dt_bias)
    y_of = selective_scan(u, delta, A, B, C, D=D, delta_bias=dt_bias,
                          delta_softplus=True, reverse=False)
    y_or = selective_scan(u, delta, A, B, C, D=D, delta_bias=dt_bias,
                          delta_softplus=True, reverse=True)
    _check("bidir kernel fwd-direction", yf, y_of, 2e-3, failures)
    _check("bidir kernel rev-direction", yr, y_or, 2e-3, failures)

    # ---- backward: kernel VJP vs autodiff through the XLA oracle ----
    args = (u, delta, A, B, C, D, dt_bias)
    names = ["u", "delta", "A", "B", "C", "D", "dt_bias"]

    def loss_k(args):
        u, delta, A, B, C, D, dt_bias = args
        y = selective_scan_pallas(u, delta, A, B, C, D, None,
                                  True, False, 128, 8, False, dt_bias)
        return jnp.sum(jnp.square(y.astype(jnp.float32))) / y.size

    def loss_o(args):
        u, delta, A, B, C, D, dt_bias = args
        y = selective_scan(u, delta, A, B, C, D=D, delta_bias=dt_bias,
                           delta_softplus=True)
        return jnp.sum(jnp.square(y.astype(jnp.float32))) / y.size

    g_k = jax.jit(jax.grad(loss_k))(args)
    g_o = jax.jit(jax.grad(loss_o))(args)
    for n, a, b in zip(names, g_k, g_o):
        # bf16 h/dA scratch in the bwd kernel → ~0.2% relative noise
        _check(f"bwd grad {n}", a, b, 5e-3, failures)

    # ---- paired backward (opt-in path, CADUCEUS_BIDIR_BWD=1) ----
    os.environ["CADUCEUS_BIDIR_BWD"] = "1"

    def loss_bidir(args):
        u, delta, A, B, C, D, dt_bias = args
        yf, yr = bidir_selective_scan_pallas(
            u, delta, B, C, u, delta, B, C, A, A, D, D, dt_bias, dt_bias,
            True, 128, 8, False)
        y = yf + yr
        return jnp.sum(jnp.square(y.astype(jnp.float32))) / y.size

    def loss_bidir_o(args):
        u, delta, A, B, C, D, dt_bias = args
        yf = selective_scan(u, delta, A, B, C, D=D, delta_bias=dt_bias,
                            delta_softplus=True, reverse=False)
        yr = selective_scan(u, delta, A, B, C, D=D, delta_bias=dt_bias,
                            delta_softplus=True, reverse=True)
        y = yf + yr
        return jnp.sum(jnp.square(y.astype(jnp.float32))) / y.size

    g_bk = jax.jit(jax.grad(loss_bidir))(args)
    g_bo = jax.jit(jax.grad(loss_bidir_o))(args)
    for n, a, b in zip(names, g_bk, g_bo):
        _check(f"paired-bwd grad {n}", a, b, 5e-3, failures)
    del os.environ["CADUCEUS_BIDIR_BWD"]

    # ---- SSD (Mamba-2) Pallas kernels: fwd/bwd/chained vs the XLA form ----
    # production v2 head geometry (d_inner=512, headdim=64 → H=8, P=64,
    # NG=1, N=128); fp32 inputs select fp32 carries, so the adjoint is
    # near-exact to the XLA VJP.
    from caduceus_tpu.ops.ssd import ssd_chunked
    from caduceus_tpu.ops.ssd_pallas import ssd_pallas, ssd_pallas_chained

    G2, L2, H2, P2, NG2, N2 = 2, 2048, 8, 64, 1, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 7)
    xs = jax.random.normal(ks[0], (G2, L2, H2, P2))
    dts = (jax.random.normal(ks[1], (G2, L2, H2)) * 0.5)
    As = -jnp.exp(jax.random.normal(ks[2], (H2,)) * 0.5)
    Bs = jax.random.normal(ks[3], (G2, L2, NG2, N2))
    Cs = jax.random.normal(ks[4], (G2, L2, NG2, N2))
    Ds = jax.random.normal(ks[5], (H2,))
    bs = jax.random.normal(ks[6], (H2,)) * 0.1

    for reverse in (False, True):
        y_k = jax.jit(
            lambda *a, r=reverse: ssd_pallas(
                *a[:5], D=a[5], dt_bias=a[6], dt_softplus=True, reverse=r,
                chunk_size=256, seg_chunks=4)
        )(xs, dts, As, Bs, Cs, Ds, bs)
        y_o = jax.jit(
            lambda *a, r=reverse: ssd_chunked(
                *a[:5], D=a[5], dt_bias=a[6], dt_softplus=True, reverse=r,
                chunk_size=256, seg_chunks=4)
        )(xs, dts, As, Bs, Cs, Ds, bs)
        _check(f"ssd fwd kernel reverse={reverse}", y_k, y_o, 2e-3, failures)

    def ssd_loss(fn):
        def loss(args):
            y = fn(*args[:5], D=args[5], dt_bias=args[6], dt_softplus=True,
                   chunk_size=256, seg_chunks=4)
            return jnp.sum(jnp.square(y.astype(jnp.float32))) / y.size
        return loss

    ssd_args = (xs, dts, As, Bs, Cs, Ds, bs)
    ssd_names = ["x", "dt", "A", "B", "C", "D", "dt_bias"]
    g_sk = jax.jit(jax.grad(ssd_loss(ssd_pallas)))(ssd_args)
    g_so = jax.jit(jax.grad(ssd_loss(ssd_chunked)))(ssd_args)
    for n, a, b in zip(ssd_names, g_sk, g_so):
        _check(f"ssd bwd grad {n}", a, b, 5e-3, failures)

    # chained h_init/g_hN boundary contract: two chained segments == one
    # full scan for value AND input gradients (the CP/prefill contract)
    half = L2 // 2
    zero_h = jnp.zeros((G2, H2, N2, P2), jnp.float32)

    def chain_full(x, dt, B, C):
        y, hN = ssd_pallas_chained(x, dt, As, B, C, Ds, bs, zero_h,
                                   True, False, 256, False, 4)
        return jnp.sum(jnp.square(y)) / y.size + jnp.sum(hN)

    def chain_seg(x, dt, B, C):
        y1, h1 = ssd_pallas_chained(
            x[:, :half], dt[:, :half], As, B[:, :half], C[:, :half],
            Ds, bs, zero_h, True, False, 256, False, 4)
        y2, h2 = ssd_pallas_chained(
            x[:, half:], dt[:, half:], As, B[:, half:], C[:, half:],
            Ds, bs, h1, True, False, 256, False, 4)
        y = jnp.concatenate([y1, y2], axis=1)
        return jnp.sum(jnp.square(y)) / y.size + jnp.sum(h2)

    vf, gf = jax.jit(jax.value_and_grad(chain_full, argnums=(0, 1, 2, 3)))(
        xs, dts, Bs, Cs)
    vs_, gs_ = jax.jit(jax.value_and_grad(chain_seg, argnums=(0, 1, 2, 3)))(
        xs, dts, Bs, Cs)
    _check("ssd chained value", vs_, vf, 1e-4, failures)
    for n, a, b in zip(["x", "dt", "B", "C"], gs_, gf):
        _check(f"ssd chained grad {n}", a, b, 5e-3, failures)

    # ---- head-batched SSD kernels (ops/ssd_pallas_batched.py) ----
    # same production geometry + contracts as the base SSD rows; Mosaic
    # compilation of the (N, H·P)-layout kernels is what this verifies
    # (interpret mode cannot see TPU lowering bugs).
    from caduceus_tpu.ops.ssd_pallas_batched import (
        ssd_pallas_batched, ssd_pallas_batched_chained)

    for reverse in (False, True):
        y_k = jax.jit(
            lambda *a, r=reverse: ssd_pallas_batched(
                *a[:5], D=a[5], dt_bias=a[6], dt_softplus=True, reverse=r,
                chunk_size=128, seg_chunks=8)
        )(xs, dts, As, Bs, Cs, Ds, bs)
        y_o = jax.jit(
            lambda *a, r=reverse: ssd_chunked(
                *a[:5], D=a[5], dt_bias=a[6], dt_softplus=True, reverse=r,
                chunk_size=128, seg_chunks=8)
        )(xs, dts, As, Bs, Cs, Ds, bs)
        _check(f"ssd-batched fwd kernel reverse={reverse}", y_k, y_o, 2e-3,
               failures)

    def ssd_b_loss(fn):
        def loss(args):
            y = fn(*args[:5], D=args[5], dt_bias=args[6], dt_softplus=True,
                   chunk_size=128, seg_chunks=8)
            return jnp.sum(jnp.square(y.astype(jnp.float32))) / y.size
        return loss

    g_sk = jax.jit(jax.grad(ssd_b_loss(ssd_pallas_batched)))(ssd_args)
    g_so = jax.jit(jax.grad(ssd_b_loss(ssd_chunked)))(ssd_args)
    for n, a, b in zip(ssd_names, g_sk, g_so):
        _check(f"ssd-batched bwd grad {n}", a, b, 5e-3, failures)

    def chain_b_seg(x, dt, B, C):
        y1, h1 = ssd_pallas_batched_chained(
            x[:, :half], dt[:, :half], As, B[:, :half], C[:, :half],
            Ds, bs, zero_h, True, False, 128, False, 8)
        y2, h2 = ssd_pallas_batched_chained(
            x[:, half:], dt[:, half:], As, B[:, half:], C[:, half:],
            Ds, bs, h1, True, False, 128, False, 8)
        y = jnp.concatenate([y1, y2], axis=1)
        return jnp.sum(jnp.square(y)) / y.size + jnp.sum(h2)

    vsb, gsb = jax.jit(jax.value_and_grad(chain_b_seg, argnums=(0, 1, 2, 3)))(
        xs, dts, Bs, Cs)
    _check("ssd-batched chained value", vsb, vf, 1e-4, failures)
    for n, a, b in zip(["x", "dt", "B", "C"], gsb, gf):
        _check(f"ssd-batched chained grad {n}", a, b, 5e-3, failures)

    # ---- fused-conv head-batched SSD kernels ----
    # conv + SiLU + x/B/C split inside the kernel (the production
    # pallas_batched model path); verifies Mosaic lowering of the in-kernel
    # conv, the segment-boundary history rows, and the conv-transpose
    # spillover carry in the adjoint.
    from caduceus_tpu.ops.ssd_pallas_batched import ssd_pallas_batched_fused

    Wc = H2 * P2 + 2 * NG2 * N2
    kf = jax.random.split(jax.random.PRNGKey(3), 3)
    xbc = jax.random.normal(kf[0], (G2, L2, Wc))
    cw = jax.random.normal(kf[1], (4, Wc)) * 0.5
    cb = jax.random.normal(kf[2], (Wc,)) * 0.1
    dims2 = (H2, P2, NG2, N2)

    for reverse in (False, True):
        y_k = jax.jit(
            lambda *a, r=reverse: ssd_pallas_batched_fused(
                a[0], a[1], a[2], a[3], conv_b=a[4], D=a[5], dt_bias=a[6],
                dims=dims2, dt_softplus=True, reverse=r,
                chunk_size=128, seg_chunks=8)
        )(xbc, dts, As, cw, cb, Ds, bs)
        y_o = jax.jit(
            lambda *a, r=reverse: ssd_chunked(
                a[0], a[1], a[2], None, None, D=a[5], dt_bias=a[6],
                dt_softplus=True, reverse=r, chunk_size=128, seg_chunks=8,
                conv_w=a[3], conv_b=a[4], dims=dims2)
        )(xbc, dts, As, cw, cb, Ds, bs)
        _check(f"ssd-fused fwd kernel reverse={reverse}", y_k, y_o, 2e-3,
               failures)

    def ssd_fused_loss(fused, dims_):
        def loss(args):
            if fused:
                y = ssd_pallas_batched_fused(
                    args[0], args[1], args[2], args[3], conv_b=args[4],
                    D=args[5], dt_bias=args[6], dims=dims_,
                    dt_softplus=True, chunk_size=128, seg_chunks=8)
            else:
                y = ssd_chunked(
                    args[0], args[1], args[2], None, None, D=args[5],
                    dt_bias=args[6], dt_softplus=True, chunk_size=128,
                    seg_chunks=8, conv_w=args[3], conv_b=args[4],
                    dims=dims_)
            return jnp.sum(jnp.square(y.astype(jnp.float32))) / y.size
        return loss

    fused_args = (xbc, dts, As, cw, cb, Ds, bs)
    g_fk = jax.jit(jax.grad(ssd_fused_loss(True, dims2)))(fused_args)
    g_fo = jax.jit(jax.grad(ssd_fused_loss(False, dims2)))(fused_args)
    for n, a, b in zip(["xBC", "dt", "A", "conv_w", "conv_b", "D",
                        "dt_bias"], g_fk, g_fo):
        _check(f"ssd-fused bwd grad {n}", a, b, 5e-3, failures)

    # d_state=16 geometry: B/C column pieces land at non-128-aligned lane
    # offsets (528, 544) — the layout class that broke the first fused
    # adjoint on device (per-piece pend scratches fix); N=16 must stay
    # gated or the like-for-like config ships untested.
    N16 = 16
    Wc16 = H2 * P2 + 2 * NG2 * N16
    k16 = jax.random.split(jax.random.PRNGKey(5), 3)
    xbc16 = jax.random.normal(k16[0], (G2, L2, Wc16))
    cw16 = jax.random.normal(k16[1], (4, Wc16)) * 0.5
    cb16 = jax.random.normal(k16[2], (Wc16,)) * 0.1
    dims16 = (H2, P2, NG2, N16)

    a16 = (xbc16, dts, As, cw16, cb16, Ds, bs)
    g16k = jax.jit(jax.grad(ssd_fused_loss(True, dims16)))(a16)
    g16o = jax.jit(jax.grad(ssd_fused_loss(False, dims16)))(a16)
    for n, a, b in zip(["xBC", "dt", "A", "conv_w", "conv_b", "D",
                        "dt_bias"], g16k, g16o):
        _check(f"ssd-fused-N16 bwd grad {n}", a, b, 5e-3, failures)

    # ---- fused-conv CP entry (edge_hist contract) ----
    # Mosaic-compiles the emit_pend output path of the fused adjoint (the
    # per-piece pend scratches written to a pinned output block) and the
    # host-side conv-transpose edge conversion: two chained shards
    # (edge_hist = neighbor boundary rows, h_init = neighbor final state)
    # must reproduce the full-sequence fused scan, fwd AND grads — the
    # single-chip form of `parallel/seq_scan.py sequence_parallel_ssd_fused`.
    from caduceus_tpu.ops.ssd_pallas_batched import (
        ssd_pallas_batched_fused_cp)

    def fused_cp_loss(args):
        xbc_, dt_, A_, cw_, cb_, D_, b_ = args
        hb = 8
        h0 = jnp.zeros((G2, H2, N2, P2), jnp.float32)
        zero_e = jnp.zeros((G2, hb, Wc), jnp.float32)
        kwc = dict(dims=dims2, dt_softplus=True, reverse=False,
                   chunk_size=128, seg_chunks=8)
        y1, hN = ssd_pallas_batched_fused_cp(
            xbc_[:, :half], dt_[:, :half], A_, cw_, cb_, D_, b_,
            h0, zero_e, **kwc)
        y2, _ = ssd_pallas_batched_fused_cp(
            xbc_[:, half:], dt_[:, half:], A_, cw_, cb_, D_, b_,
            hN, xbc_[:, half - hb:half], **kwc)
        y = jnp.concatenate([y1, y2], axis=1)
        return jnp.sum(jnp.square(y.astype(jnp.float32))) / y.size

    v_cp, g_cp = jax.jit(jax.value_and_grad(fused_cp_loss))(fused_args)
    v_full = jax.jit(ssd_fused_loss(True, dims2))(fused_args)
    _check("ssd-fused-cp chained value", v_cp, v_full, 1e-4, failures)
    for n, a, b in zip(["xBC", "dt", "A", "conv_w", "conv_b", "D",
                        "dt_bias"], g_cp, g_fo):
        _check(f"ssd-fused-cp grad {n}", a, b, 5e-3, failures)

    # N=16 (non-128-aligned pieces): the emit_pend path stores each
    # per-piece pend scratch at a non-aligned lane offset of the pinned
    # output block — the Mosaic layout class that needed per-piece
    # scratches in the first place; must be device-verified, not just
    # interpret-tested.
    def fused_cp_loss16(args):
        xbc_, dt_, A_, cw_, cb_, D_, b_ = args
        hb = 8
        h0 = jnp.zeros((G2, H2, N16, P2), jnp.float32)
        zero_e = jnp.zeros((G2, hb, Wc16), jnp.float32)
        kwc = dict(dims=dims16, dt_softplus=True, reverse=False,
                   chunk_size=128, seg_chunks=8)
        y1, hN = ssd_pallas_batched_fused_cp(
            xbc_[:, :half], dt_[:, :half], A_, cw_, cb_, D_, b_,
            h0, zero_e, **kwc)
        y2, _ = ssd_pallas_batched_fused_cp(
            xbc_[:, half:], dt_[:, half:], A_, cw_, cb_, D_, b_,
            hN, xbc_[:, half - hb:half], **kwc)
        y = jnp.concatenate([y1, y2], axis=1)
        return jnp.sum(jnp.square(y.astype(jnp.float32))) / y.size

    v_cp16, g_cp16 = jax.jit(jax.value_and_grad(fused_cp_loss16))(a16)
    v_full16 = jax.jit(ssd_fused_loss(True, dims16))(a16)
    _check("ssd-fused-cp-N16 chained value", v_cp16, v_full16, 1e-4,
           failures)
    for n, a, b in zip(["xBC", "dt", "A", "conv_w", "conv_b", "D",
                        "dt_bias"], g_cp16, g16o):
        _check(f"ssd-fused-cp-N16 grad {n}", a, b, 5e-3, failures)

    # ---- flash attention (hybrid-MHA layers) vs the XLA oracle ----
    # bf16-class MXU rounding inside the kernel → looser tolerance.
    from caduceus_tpu.ops.attention import mha_attention

    Ba, La, Ha, hda = 2, 2048, 8, 32
    ka = jax.random.split(jax.random.PRNGKey(2), 3)
    qa, kk, va = (jax.random.normal(k, (Ba, La, Ha, hda)) for k in ka)
    for causal in (True, False):
        y_k = jax.jit(lambda *a, c=causal: mha_attention(
            *a, causal=c, use_kernel="pallas"))(qa, kk, va)
        y_o = jax.jit(lambda *a, c=causal: mha_attention(
            *a, causal=c, use_kernel="xla"))(qa, kk, va)
        _check(f"flash attention fwd causal={causal}", y_k, y_o, 5e-3,
               failures)

    def attn_loss(kernel):
        def loss(args):
            y = mha_attention(*args, causal=True, use_kernel=kernel)
            return jnp.sum(jnp.square(y)) / y.size
        return loss

    g_ak = jax.jit(jax.grad(attn_loss("pallas")))((qa, kk, va))
    g_ao = jax.jit(jax.grad(attn_loss("xla")))((qa, kk, va))
    for n, a, b in zip(["q", "k", "v"], g_ak, g_ao):
        _check(f"flash attention grad {n}", a, b, 1e-2, failures)

    if failures:
        print(f"\n{len(failures)} FAILURE(S): {failures}")
        return 1
    print("\nall on-device kernel checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
