"""Caduceus: bidirectional, RC-equivariant Mamba backbone + task heads.

Capability parity with `caduceus/modeling_caduceus.py` and
`caduceus/modeling_rcps.py`, re-designed TPU-first.

The central re-design — **canonical-strand batching** for RCPS: the reference
stores the RC stream flipped ( `[h_fwd, flip_LC(h_rc)]` concatenated on
channels) and undoes/redoes the flip around every submodule call
(`RCPSWrapper.forward`, `modeling_rcps.py:85-99`: 2 flips per wrapper, 4 scan
launches per layer). Here both strands are carried in their own canonical
orientation on a leading axis folded into the batch, so every layer is the
plain shared-weight BiMamba applied to a 2B batch — no flips, and all
projections run as single 2B-row matmuls on the MXU. Flips appear only at
the boundaries:

- embedding: strand 1 embeds rc(input_ids) (one int gather + reverse);
- LM head: ``logits = h0 @ W^T + reverse_L(h1) @ W[comp]^T``
  (maths identical to `RCPSLMHead.forward`, `modeling_rcps.py:233-246`);
- exposing reference-convention hidden states `(B, L, 2d)` for parity tests.

Equivariance `logits(x) == flip_L(logits(rc(x))[..., comp])` holds by
construction and is verified by the ported property suite
(tests/test_rcps_properties.py, mirroring `caduceus/tests/test_rcps.py`).
"""

from __future__ import annotations

import os
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from caduceus_tpu.config import CaduceusConfig
from caduceus_tpu.models.mamba import BiMamba, torch_linear_init
from caduceus_tpu.ops.norms import add_norm, layer_norm, rms_norm


def reverse_complement_ids(input_ids: jnp.ndarray, complement: jnp.ndarray) -> jnp.ndarray:
    """rc on token ids: flip length then complement (`modeling_rcps.py:46-52`)."""
    return complement[jnp.flip(input_ids, axis=-1)]


def rc_hidden(x: jnp.ndarray) -> jnp.ndarray:
    """Flip length (-2) and channel (-1) dims (`modeling_rcps.py:80-83`)."""
    return jnp.flip(x, axis=(-2, -1))


def swap_rc(t: jnp.ndarray) -> jnp.ndarray:
    """The fused-frame involution in canonical-strand coordinates:
    exchange strand rows, reverse (L, d)."""
    half = t.shape[0] // 2
    t = jnp.concatenate([t[half:], t[:half]], axis=0)
    return jnp.flip(t, axis=(-2, -1))


class CaduceusBlock(nn.Module):
    """Prenorm residual block: (add → norm) → BiMamba.

    Matches the mamba `Block` contract (`modeling_caduceus.py:182-186`):
    returns (mixer_out, residual) where residual = x + prev_residual.

    ``frame``: the reference FUSED RCPS block frame
    (`modeling_rcps.py:165-200`): the fused path feeds the SECOND channel
    half unflipped and the flipped FIRST half to the shared add+norm — i.e.
    it swaps the halves at every block relative to the non-fused
    RCPSAddNormWrapper. The two frames are different functions of the same
    weights (both RC-equivariant); released checkpoints are trained fused,
    so this is the checkpoint-parity default
    (tests/test_reference_torch_parity.py runs the reference's own torch
    code to pin both frames down). In canonical-strand coordinates the swap
    is `swap_rc`: exchange strand rows, reverse (L, d). Two realizations:

    - ``frame="data"``: apply `swap_rc` to x and residual — two full HBM
      round trips of the (2B, L, d) residual stream per block (~9% of the
      131k step).
    - ``frame="conj"``: fold the involution into the parameters. Since
      swap_rc is an involution F and blocks compose, y_{k+1} =
      F^{k+1}(Block_k(F^{k+1} y_k, ...)) — every other block runs
      F-conjugated, the rest run plain ("none"). Conjugation by F is exact
      parameter algebra: the strand swap cancels through batch-elementwise
      ops; the L-reversal swaps each (projection, direction-params) pair's
      traversal direction (the scans already walk reversed indices for
      free); the d-reversal flips the norm weights and the d_model-facing
      kernel rows/cols (`models/mamba.py FrameDense`). Zero data movement;
      one final `swap_rc` remains iff n_layer is odd.
    """

    cfg: CaduceusConfig
    scan_chunk_size: int = 256
    frame: str = "none"  # "none" | "data" | "conj"

    @nn.compact
    def __call__(self, x, residual=None):
        c = self.cfg
        conj = self.frame == "conj"
        weight = self.param("norm_w", nn.initializers.ones, (c.d_model,), jnp.float32)
        bias = (
            None
            if c.rms_norm
            else self.param("norm_b", nn.initializers.zeros, (c.d_model,), jnp.float32)
        )
        if conj:
            weight = weight[::-1]
            bias = None if bias is None else bias[::-1]
        if self.frame == "data":
            x = swap_rc(x)
            residual = None if residual is None else swap_rc(residual)
        normed, residual = add_norm(
            x,
            weight,
            bias,
            residual=residual,
            eps=c.norm_epsilon,
            use_rms=c.rms_norm,
            residual_in_fp32=c.residual_in_fp32,
            prenorm=True,
        )
        if c.ssm_cfg.version == 2:
            # Mamba-2 (SSD) mixer — MXU-chunked, beyond the reference
            # (`models/mamba2.py`). Same (out, residual) block contract.
            from caduceus_tpu.models.mamba2 import BiMamba2

            out = BiMamba2(c, conj, name="mixer")(normed)
        else:
            out = BiMamba(c, self.scan_chunk_size, conj, name="mixer")(normed)
        return out, residual


class CaduceusBackbone(nn.Module):
    """Embeddings + n_layer blocks + final norm (reference `CaduceusMixerModel`,
    `modeling_caduceus.py:166-276`).

    Input:  (B, L) int ids.
    Output: canonical hidden states — (B, L, d) plain, or (2, B, L, d) for
    RCPS where index 0 is the forward strand and index 1 the RC strand in its
    own canonical orientation.
    """

    cfg: CaduceusConfig
    scan_chunk_size: int = 256

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray, inputs_embeds=None):
        """Returns (hidden, embed_table); the table enables structural
        LM-head weight tying (`modeling_caduceus.py:434-439`) without scope
        tricks.

        ``inputs_embeds`` (non-RCPS only): precomputed (B, L, d_model)
        inputs — the hook for external encoders (reference
        `src/tasks/encoders.py` linear/embedding encoders feeding the
        backbone in place of its own token embedding)."""
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        V = c.padded_vocab_size

        embed_table = self.param(
            "embedding",
            nn.initializers.normal(stddev=c.initializer_range),
            (V, c.d_model),
            jnp.dtype(c.param_dtype),
        )

        if inputs_embeds is not None:
            assert not c.rcps, (
                "inputs_embeds bypasses the token complement map; RCPS "
                "needs token ids"
            )
            S = 1
            B, L = inputs_embeds.shape[:2]
            h = inputs_embeds.astype(dtype)
        else:
            if c.rcps:
                cm = c.padded_complement_map()
                assert cm is not None, "RCPS requires a complement_map"
                complement = jnp.asarray([cm[i] for i in range(V)], jnp.int32)
                ids2 = reverse_complement_ids(input_ids, complement)
                ids = jnp.stack([input_ids, ids2], axis=0)  # (2, B, L)
            else:
                ids = input_ids[None]  # (1, B, L)

            S, B, L = ids.shape
            h = embed_table.astype(dtype)[ids.reshape(S * B, L)]  # (S*B, L, d)

        residual = None
        # fused RCPS frame realization: "params" (default — conjugate every
        # other block, zero data movement) or "data" (swap_rc per block);
        # see CaduceusBlock. Identical functions; A/B via env.
        fused = c.rcps and c.fused_add_norm
        impl = os.environ.get("CADUCEUS_FUSED_FRAME_IMPL", "params")
        if not fused:
            frames = ["none"] * c.n_layer
        elif impl == "data":
            frames = ["data"] * c.n_layer
        else:
            frames = ["conj" if i % 2 == 0 else "none"
                      for i in range(c.n_layer)]
        blocks = [
            CaduceusBlock(c, self.scan_chunk_size, frames[i],
                          name=f"layers_{i}")
            for i in range(c.n_layer)
        ]
        if c.remat:
            # fixed-arity span functions (linen lifts module *arguments*,
            # not module lists); spans of 1/2/4 cover practical budgets
            def run1(b1, h, r):
                return b1(h, r)

            def run2(b1, b2, h, r):
                h, r = b1(h, r)
                return b2(h, r)

            def run4(b1, b2, b3, b4, h, r):
                h, r = b1(h, r)
                h, r = b2(h, r)
                h, r = b3(h, r)
                return b4(h, r)

            f1, f2, f4 = nn.remat(run1), nn.remat(run2), nn.remat(run4)
            span = max(1, c.remat_span)
            i = 0
            while i < c.n_layer:
                if span >= 4 and i + 3 < c.n_layer:
                    h, residual = f4(*blocks[i : i + 4], h, residual)
                    i += 4
                elif span >= 2 and i + 1 < c.n_layer:
                    h, residual = f2(blocks[i], blocks[i + 1], h, residual)
                    i += 2
                else:
                    h, residual = f1(blocks[i], h, residual)
                    i += 1
        else:
            for block in blocks:
                h, residual = block(h, residual)

        # final add + norm with shared weights across strands
        # (`modeling_caduceus.py:233-273`) — in canonical form this is one op.
        norm_w = self.param("norm_f_w", nn.initializers.ones, (c.d_model,), jnp.float32)
        norm_b = (
            None
            if c.rms_norm
            else self.param("norm_f_b", nn.initializers.zeros, (c.d_model,), jnp.float32)
        )
        final = (h if residual is None else residual + h.astype(residual.dtype))
        if fused and impl != "data" and c.n_layer % 2 == 1:
            # under the conjugated frame the physical state is F^n(y_n);
            # odd n_layer leaves one residual involution to apply
            final = swap_rc(final)
        if c.residual_in_fp32:
            final = final.astype(jnp.float32)
        if c.rms_norm:
            h = rms_norm(final, norm_w, eps=c.norm_epsilon).astype(dtype)
        else:
            h = layer_norm(final, norm_w, norm_b, eps=c.norm_epsilon).astype(dtype)

        h = h.reshape(S, B, L, c.d_model) if c.rcps else h.reshape(B, L, c.d_model)
        return h, embed_table


def collapse_strand_mean(h: jnp.ndarray) -> jnp.ndarray:
    """Reference-convention (…, L, 2d) RCPS hidden states → (…, L, d)
    strand mean: forward half averaged with the rc-mapped reverse half
    (`vep_embeddings.py:369-372`). Shared by the VEP dump and /embed
    serving so the collapse convention cannot drift between them."""
    d = h.shape[-1] // 2
    return (h[..., :d] + jnp.flip(h[..., d:], axis=(-2, -1))) / 2


def canonical_to_reference(hidden: jnp.ndarray) -> jnp.ndarray:
    """(2, B, L, d) canonical → (B, L, 2d) reference convention
    ``[h_fwd, flip_LC(h_rc_canonical)]`` (`modeling_rcps.py:64-67`)."""
    return jnp.concatenate([hidden[0], rc_hidden(hidden[1])], axis=-1)


def reference_to_canonical(hidden: jnp.ndarray) -> jnp.ndarray:
    """(B, L, 2d) reference convention → (2, B, L, d) canonical."""
    d = hidden.shape[-1] // 2
    return jnp.stack([hidden[..., :d], rc_hidden(hidden[..., d:])], axis=0)


class Caduceus(nn.Module):
    """Backbone model (reference `Caduceus`, `modeling_caduceus.py:344-389`).

    Returns reference-convention hidden states: (B, L, 2d) when rcps else
    (B, L, d).
    """

    cfg: CaduceusConfig
    scan_chunk_size: int = 256

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        h, _ = CaduceusBackbone(self.cfg, self.scan_chunk_size, name="backbone")(input_ids)
        if self.cfg.rcps:
            return canonical_to_reference(h)
        return h


class CaduceusForMaskedLM(nn.Module):
    """MLM model (reference `CaduceusForMaskedLM`,
    `modeling_caduceus.py:392-492`). Logits always cast to fp32
    (`modeling_caduceus.py:475`).

    `tie_word_embeddings=True` (the HF default the reference inherits via
    `post_init`→`tie_weights`, `modeling_caduceus.py:434-439`) shares the
    embedding table with the LM head structurally.
    """

    cfg: CaduceusConfig
    tie_word_embeddings: bool = True
    scan_chunk_size: int = 256

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        V = c.padded_vocab_size
        backbone = CaduceusBackbone(c, self.scan_chunk_size, name="backbone")
        h, embed_table = backbone(input_ids)

        if self.tie_word_embeddings:
            W = embed_table
        else:
            W = self.param(
                "lm_head",
                nn.initializers.normal(stddev=c.initializer_range),
                (V, c.d_model),
                jnp.dtype(c.param_dtype),
            )
        W = W.astype(h.dtype)

        if c.rcps:
            cm = c.padded_complement_map()
            complement = jnp.asarray([cm[i] for i in range(V)], jnp.int32)
            # logits = h_fwd @ W^T + reverse_L(h_rc_canonical) @ W[comp]^T
            # == RCPSLMHead.forward (`modeling_rcps.py:233-246`)
            logits = h[0] @ W.T + jnp.flip(h[1], axis=-2) @ W[complement].T
        else:
            logits = h @ W.T
        return logits.astype(jnp.float32)


class CaduceusForSequenceClassification(nn.Module):
    """Classification head (reference `CaduceusForSequenceClassification`,
    `modeling_caduceus.py:495-640`).

    Input modes:
    - rcps: (B, L) ids; hidden (2, B, L, d) pooled per strand, scored with a
      shared head, averaged (`modeling_caduceus.py:562-575,605-608`);
    - conjoin: (B, L, 2) ids — fwd and rc strands stacked on the last axis;
      backbone run on both with shared weights (`modeling_caduceus.py:576-592`);
    - plain: (B, L) ids.
    """

    cfg: CaduceusConfig
    num_labels: int = 2
    pooling_strategy: str = "mean"  # mean | max | first | last
    conjoin: bool = False
    scan_chunk_size: int = 256

    def _pool(self, h: jnp.ndarray) -> jnp.ndarray:
        # h: (..., L, d); pool over L (`modeling_caduceus.py:534-543`)
        if self.pooling_strategy == "mean":
            return jnp.mean(h, axis=-2)
        if self.pooling_strategy == "max":
            return jnp.max(h, axis=-2)
        if self.pooling_strategy == "first":
            return h[..., 0, :]
        if self.pooling_strategy == "last":
            return h[..., -1, :]
        raise NotImplementedError(self.pooling_strategy)

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        c = self.cfg
        backbone = CaduceusBackbone(c, self.scan_chunk_size, name="backbone")
        score = nn.Dense(
            self.num_labels,
            use_bias=False,
            kernel_init=nn.initializers.normal(stddev=c.initializer_range),
            param_dtype=jnp.dtype(c.param_dtype),
            dtype=jnp.dtype(c.dtype),
            name="score",
        )

        if c.rcps:
            h, _ = backbone(input_ids)  # (2, B, L, d) canonical == the stacked
            # [fwd, flip(rc)] channels of `modeling_caduceus.py:569-575`
            pooled = self._pool(h)  # (2, B, d)
            logits = (score(pooled[0]) + score(pooled[1])) / 2
        elif self.conjoin:
            assert input_ids.ndim == 3, "conjoin expects (B, L, 2) input_ids"
            h_f, _ = backbone(input_ids[..., 0])
            h_r, _ = backbone(input_ids[..., 1])
            logits = (score(self._pool(h_f)) + score(self._pool(h_r))) / 2
        else:
            h, _ = backbone(input_ids)
            logits = score(self._pool(h))
        return logits.astype(jnp.float32)
