"""Hyena long-convolution backbone — TPU-native.

Capability parity with the reference HyenaDNA stack:
- `HyenaOperator` / `HyenaFilter` / `PositionalEmbedding` /
  `ExponentialModulation` (`src/models/sequence/hyena.py:96-433`);
- the FFT long convolution (`fftconv_ref`, `src/models/sequence/hyena.py:55-75`
  and the CUDA `fftconv` extension wrapped at `src/ops/fftconv.py`) is
  expressed as `jnp.fft.rfft/irfft` — XLA lowers FFT natively on TPU, so the
  CUDA extension's job disappears;
- `LMBackbone`/`ConvLMHeadModel` (`src/models/sequence/long_conv_lm.py`):
  GPT-2-style embeddings, prenorm blocks (mixer + MLP), tied LM head.

Layout is (B, L, d) channels-last; FFTs run over the length axis.
Default hyperparameters follow the reference (order=2, filter_order=64,
short_filter_order=3, emb_dim=3 pos-encoding, sin-activated implicit MLP).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from caduceus_tpu.models.mamba import torch_linear_init
from caduceus_tpu.ops.attention import mha_attention
from caduceus_tpu.ops.conv import causal_conv1d
from caduceus_tpu.ops.fft_conv import fft_conv


class HyenaFilter(nn.Module):
    """Implicit filter: MLP over complex-exponential positional features with
    exponential decay modulation (`hyena.py:96-252`)."""

    d_output: int  # head_dim * (order - 1)
    seq_len: int
    emb_dim: int = 3
    filter_order: int = 64  # width of the implicit MLP ("order" arg in ref)
    num_inner_mlps: int = 2
    w: float = 1.0  # sin frequency init
    modulate: bool = True
    normalized: bool = False
    fast_decay_pct: float = 0.3
    slow_decay_pct: float = 1.5
    target: float = 1e-2
    shift: float = 0.0

    def _pos_features(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(z, t): (L, emb_dim) features and (L, 1) normalized time."""
        L = self.seq_len
        t = jnp.linspace(0.0, 1.0, L)[:, None]
        bands = (self.emb_dim - 1) // 2
        t_rescaled = jnp.linspace(0.0, L - 1, L)[:, None]
        w = 2 * math.pi * t_rescaled / L  # (L, 1)
        f = jnp.linspace(1e-4, bands - 1, bands)[None, :]
        angle = f * w  # (L, bands)
        z = jnp.concatenate([t, jnp.cos(-angle), jnp.sin(-angle)], axis=-1)
        return z, t

    @nn.compact
    def __call__(self, L: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (k, bias): filter taps (L, d_output) and bias (d_output,)."""
        assert self.emb_dim % 2 == 1 and self.emb_dim >= 3
        z_init, t_full = self._pos_features()
        # z is trainable in the reference (lr_pos_emb=1e-5); t is frozen.
        z = self.param("pos_emb_z", lambda _: z_init)
        h = z

        freq = self.param("sin_freq", nn.initializers.constant(self.w),
                          (self.filter_order,))

        def sin_act(x):
            return jnp.sin(freq * x)

        h = nn.Dense(self.filter_order, kernel_init=torch_linear_init(self.emb_dim),
                     bias_init=torch_linear_init(self.emb_dim), name="mlp_in")(h)
        h = sin_act(h)
        for i in range(self.num_inner_mlps):
            h = nn.Dense(self.filter_order,
                         kernel_init=torch_linear_init(self.filter_order),
                         bias_init=torch_linear_init(self.filter_order),
                         name=f"mlp_{i}")(h)
            h = sin_act(h)
        h = nn.Dense(self.d_output, use_bias=False,
                     kernel_init=torch_linear_init(self.filter_order),
                     name="mlp_out")(h)

        if self.modulate:
            max_decay = math.log(self.target) / self.fast_decay_pct
            min_decay = math.log(self.target) / self.slow_decay_pct
            deltas = self.param(
                "deltas",
                lambda _: jnp.linspace(min_decay, max_decay, self.d_output)[None, :],
            )
            decay = jnp.exp(-t_full * jnp.abs(deltas))
            h = h * (decay + self.shift)
        if self.normalized:
            h = h / jnp.sum(jnp.abs(h), axis=-1, keepdims=True)

        bias = self.param("bias", nn.initializers.normal(1.0), (self.d_output,))
        return h[:L], bias


class HyenaOperator(nn.Module):
    """Hyena mixer (`hyena.py:255-433`), defaults: order=2, 1 head, 1 block."""

    d_model: int
    l_max: int
    order: int = 2
    filter_order: int = 64
    short_filter_order: int = 3
    emb_dim: int = 3
    filter_w: float = 1.0
    modulate: bool = True
    activation: str = "id"  # post-recurrence activation (`hyena.py:323-326`)
    dropout: float = 0.0  # recurrence dropout (`hyena.py:326,405`)
    # filter_dropout accepted for config parity but unused: the reference
    # declares it "not implemented" (`src/models/sequence/hyena.py:173`)
    filter_dropout: float = 0.0
    dtype: str = "float32"

    @nn.compact
    def __call__(self, u: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d, order = self.d_model, self.order
        dtype = jnp.dtype(self.dtype)
        u = u.astype(dtype)
        L = u.shape[-2]
        l_filter = min(L, self.l_max)

        u_proj = nn.Dense((order + 1) * d, kernel_init=torch_linear_init(d),
                          bias_init=torch_linear_init(d), dtype=dtype,
                          name="in_proj")(u)

        # short depthwise causal conv, kernel 3 (torch Conv1d weight (C,1,K))
        K = self.short_filter_order
        conv_w = self.param("short_filter_w", torch_linear_init(K),
                            (K, (order + 1) * d))
        conv_b = self.param("short_filter_b", torch_linear_init(K),
                            ((order + 1) * d,))
        uc = causal_conv1d(u_proj, conv_w.astype(dtype), conv_b.astype(dtype),
                           activation=None)
        uc = uc[..., :l_filter, :]

        splits = jnp.split(uc, order + 1, axis=-1)  # x_0..x_{order-1}, v
        *xs, v = splits

        filt = HyenaFilter(
            d_output=d * (order - 1),
            seq_len=self.l_max,
            emb_dim=self.emb_dim,
            filter_order=self.filter_order,
            w=self.filter_w,
            modulate=self.modulate,
            name="filter_fn",
        )
        k_all, bias_all = filt(l_filter)  # (L, d*(order-1)), (d*(order-1),)
        # reference rearrange "l (v o)": channel-major v, order o fastest
        k_all = k_all.reshape(l_filter, d, order - 1)
        bias_all = bias_all.reshape(d, order - 1)

        drop = nn.Dropout(self.dropout, deterministic=not train, name="drop")
        for o, x_i in enumerate(reversed(xs[1:])):
            v = drop(v * x_i)  # recurrence dropout (`hyena.py:405`)
            k = k_all[:, :, o].astype(jnp.float32)
            bias = bias_all[:, o]
            v = fft_conv(v, k, bias).astype(dtype)

        from caduceus_tpu.models.activations import get_activation

        y = get_activation(self.activation)(v * xs[0])
        return nn.Dense(d, kernel_init=torch_linear_init(d),
                        bias_init=torch_linear_init(d), dtype=dtype,
                        name="out_proj")(y)


class Mlp(nn.Module):
    """GPT-2 MLP: fc1 (4x) → GELU → fc2 (`long_conv_lm.py:93-127`)."""

    d_model: int
    expand: int = 4
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        dtype = jnp.dtype(self.dtype)
        inner = self.expand * self.d_model
        h = nn.Dense(inner, kernel_init=torch_linear_init(self.d_model),
                     bias_init=torch_linear_init(self.d_model), dtype=dtype,
                     name="fc1")(x)
        h = jax.nn.gelu(h, approximate=True)
        return nn.Dense(self.d_model, kernel_init=torch_linear_init(inner),
                        bias_init=torch_linear_init(inner), dtype=dtype,
                        name="fc2")(h)


class MHA(nn.Module):
    """Standard multi-head attention for hybrid Hyena models
    (flash-attn `MHA` in the reference, `long_conv_lm.py:42-90`)."""

    d_model: int
    num_heads: int = 8
    causal: bool = True
    dropout: float = 0.0  # attention-output dropout (flash-attn MHA `dropout`)
    use_kernel: str = "auto"  # Pallas flash attention on TPU (ops/attention.py)
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        dtype = jnp.dtype(self.dtype)
        B, L, d = x.shape
        hd = d // self.num_heads
        qkv = nn.Dense(3 * d, kernel_init=torch_linear_init(d),
                       bias_init=torch_linear_init(d), dtype=dtype,
                       name="Wqkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        rs = lambda t: t.reshape(B, L, self.num_heads, hd)
        out = mha_attention(rs(q), rs(k), rs(v), causal=self.causal,
                            use_kernel=self.use_kernel)
        out = out.reshape(B, L, d)
        out = nn.Dropout(self.dropout, deterministic=not train,
                         name="drop")(out)
        return nn.Dense(d, kernel_init=torch_linear_init(d),
                        bias_init=torch_linear_init(d), dtype=dtype,
                        name="out_proj")(out)


class HyenaLMBackbone(nn.Module):
    """GPT-2-style LM backbone with Hyena (or MHA) mixers
    (`LMBackbone`, `long_conv_lm.py:240-388`)."""

    d_model: int
    n_layer: int
    vocab_size: int
    l_max: int
    attn_layer_idx: Sequence[int] = ()
    num_heads: int = 8
    max_position_embeddings: int = 0  # 0 = no learned pos emb
    layer_norm_epsilon: float = 1e-5
    hyena_kwargs: Optional[dict] = None
    # embed_dropout is resid_dropout1 of block 0, resid_dropout applies to
    # each sub-branch output before the residual add
    # (`long_conv_lm.py:252-253,288-309`; defaults from
    # `configs/model/hyena.yaml:6-7`)
    embed_dropout: float = 0.1
    resid_dropout: float = 0.0
    # gradient checkpointing per sub-branch, matching the reference's
    # `checkpoint_mixer` / `checkpoint_mlp` (`long_conv_lm.py:33-39,187-190`)
    # — required to train Hyena at 131k within HBM
    checkpoint_mixer: bool = False
    checkpoint_mlp: bool = False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        dtype = jnp.dtype(self.dtype)
        embed = self.param("embedding", nn.initializers.normal(0.02),
                           (self.vocab_size, self.d_model), jnp.float32)
        h = embed.astype(dtype)[input_ids]
        if self.max_position_embeddings > 0:
            pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                             (self.max_position_embeddings, self.d_model), jnp.float32)
            h = h + pos.astype(dtype)[None, : h.shape[1]]
        h = nn.Dropout(self.embed_dropout, deterministic=not train,
                       name="drop_emb")(h)

        hk = self.hyena_kwargs or {}
        det = not train
        for i in range(self.n_layer):
            ln1 = nn.LayerNorm(epsilon=self.layer_norm_epsilon, dtype=dtype,
                               name=f"ln1_{i}")
            ln2 = nn.LayerNorm(epsilon=self.layer_norm_epsilon, dtype=dtype,
                               name=f"ln2_{i}")
            # static_argnums=(2,): (self, x, train) — train is a python bool
            remat_mixer = (lambda c: nn.remat(c, static_argnums=(2,))
                           if self.checkpoint_mixer else c)
            if i in self.attn_layer_idx:
                mixer = remat_mixer(MHA)(self.d_model, self.num_heads,
                                         dtype=self.dtype, name=f"mixer_{i}")
            else:
                mixer = remat_mixer(HyenaOperator)(
                    self.d_model, self.l_max, dtype=self.dtype,
                    name=f"mixer_{i}", **hk)
            mlp_cls = nn.remat(Mlp) if self.checkpoint_mlp else Mlp
            d1 = nn.Dropout(self.resid_dropout, deterministic=det,
                            name=f"drop1_{i}")
            d2 = nn.Dropout(self.resid_dropout, deterministic=det,
                            name=f"drop2_{i}")
            h = h + d1(mixer(ln1(h), train))
            h = h + d2(mlp_cls(self.d_model, dtype=self.dtype,
                               name=f"mlp_{i}")(ln2(h)))

        h = nn.LayerNorm(epsilon=self.layer_norm_epsilon, dtype=dtype,
                         name="ln_f")(h)
        return h, embed


class HyenaLMHeadModel(nn.Module):
    """`ConvLMHeadModel` equivalent (`long_conv_lm.py:391-493`): backbone +
    LM head tied to the embedding table."""

    d_model: int
    n_layer: int
    vocab_size: int
    l_max: int
    attn_layer_idx: Sequence[int] = ()
    num_heads: int = 8  # MHA heads on hybrid attention layers
    max_position_embeddings: int = 0  # 0 = no learned positional embedding
    hyena_kwargs: Optional[dict] = None
    embed_dropout: float = 0.1
    resid_dropout: float = 0.0
    checkpoint_mixer: bool = False
    checkpoint_mlp: bool = False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h, embed = HyenaLMBackbone(
            self.d_model, self.n_layer, self.vocab_size, self.l_max,
            attn_layer_idx=self.attn_layer_idx, num_heads=self.num_heads,
            max_position_embeddings=self.max_position_embeddings,
            hyena_kwargs=self.hyena_kwargs,
            embed_dropout=self.embed_dropout, resid_dropout=self.resid_dropout,
            checkpoint_mixer=self.checkpoint_mixer,
            checkpoint_mlp=self.checkpoint_mlp,
            dtype=self.dtype, name="backbone",
        )(input_ids, train=train)
        logits = h @ embed.astype(h.dtype).T
        return logits.astype(jnp.float32)
