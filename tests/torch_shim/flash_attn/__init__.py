"""Pure-torch (CPU) stand-in for the `flash_attn` CUDA package — only the
surface `src/models/sequence/long_conv_lm.py` uses, with flash-attn v2's
parameter names and (non-fused-path) semantics, so the reference's
`ConvLMHeadModel`/`LMBackbone` execute as written for parity tests.
Fused submodules (`flash_attn.ops.*`) are intentionally absent: the
reference guards those imports and falls back to the non-fused path.
"""
