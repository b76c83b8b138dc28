"""MHA attention op: XLA-path numerics + kernel dispatch.

The Pallas flash kernel itself is Mosaic-only (no interpret entry point in
the jax-shipped op), so its numerics are gated on device by
`scripts/verify_tpu.py`; here we pin the XLA fallback against a hand-rolled
softmax attention and the dispatch rules (`ops/attention.py`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caduceus_tpu.ops.attention import mha_attention, resolve_attention_kernel


def _manual_attention(q, k, v, causal):
    B, L, H, hd = q.shape
    qf, kf, vf = (t.astype(jnp.float32).transpose(0, 2, 1, 3)
                  for t in (q, k, v))
    scores = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * hd ** -0.5
    if causal:
        mask = jnp.tril(jnp.ones((L, L), bool))
        scores = jnp.where(mask[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, vf).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("causal", [True, False])
def test_xla_path_matches_manual(causal):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = (jax.random.normal(kk, (2, 64, 4, 16)) for kk in ks)
    got = mha_attention(q, k, v, causal=causal, use_kernel="xla")
    want = _manual_attention(q, k, v, causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_dispatch_rules():
    # CPU backend: auto resolves to xla regardless of shape
    assert resolve_attention_kernel("auto", 1024) == "xla"
    # explicit xla honored
    assert resolve_attention_kernel("xla", 128) == "xla"
    # pallas with non-tile-aligned L is a loud error, not silent fallback
    with pytest.raises(ValueError):
        resolve_attention_kernel("pallas", 100)
    assert resolve_attention_kernel("pallas", 256) == "pallas"


def test_mha_module_uses_dispatch():
    """Hybrid MHA layer end-to-end on CPU (auto -> xla) is differentiable
    and matches the explicit-xla module output."""
    from caduceus_tpu.models.hyena import MHA

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 64))
    m_auto = MHA(64, num_heads=4)
    m_xla = MHA(64, num_heads=4, use_kernel="xla")
    params = m_auto.init(jax.random.PRNGKey(2), x)
    y_auto = m_auto.apply(params, x)
    y_xla = m_xla.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_auto), np.asarray(y_xla))
    from jax.flatten_util import ravel_pytree
    g = jax.grad(lambda p: jnp.sum(m_auto.apply(p, x) ** 2))(params)
    assert jnp.all(jnp.isfinite(ravel_pytree(g)[0]))
