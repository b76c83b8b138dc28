"""Pure-torch (CPU) stand-in for the `mamba_ssm` CUDA package.

Purpose: let the tests import and execute the reference repo's ACTUAL
`caduceus/modeling_caduceus.py` / `modeling_rcps.py` on CPU (they
hard-import `mamba_ssm`, whose real implementation is CUDA-only and not
installed here), so checkpoint import/export and logits parity can be
checked against the reference's own wrapper/flip code rather than a
re-derivation. Only the surface the reference uses is provided:

  mamba_ssm.modules.mamba_simple.Mamba   (slow-path equations, fp32)
  mamba_ssm.modules.mamba_simple.Block   (prenorm add->norm->mixer contract)
  mamba_ssm.ops.triton.layernorm.{RMSNorm, layer_norm_fn, rms_norm_fn}

Semantics follow mamba-ssm 1.2.0's reference (non-fused) path — the same
equations documented in SURVEY.md §2.3 and implemented by
`caduceus_tpu/ops/selective_scan.py`.
"""
