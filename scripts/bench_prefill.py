"""Prompt-throughput bench: parallel (chained-kernel) prefill vs the
scan-of-steps form, on the attached TPU.

The reference processes generation prompts with the parallel kernel and
only then steps (mamba-ssm generation; `src/models/sequence/long_conv_lm.py
:391-493`); `inference.prefill(mode="parallel")` is the TPU-native
equivalent (VERDICT r2 #5). Prints one JSON line per mode.

Run:  python scripts/bench_prefill.py
Env:  BENCH_PREFILL_LP (8192), BENCH_PREFILL_NLAYER (16),
      BENCH_PREFILL_DMODEL (256), BENCH_PREFILL_STEPS (3),
      BENCH_PREFILL_VERSION (1; 2 = SSD family, head-batched chained
      kernels)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from caduceus_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from caduceus_tpu.config import CaduceusConfig, SSMConfig
    from caduceus_tpu.inference import prefill
    from caduceus_tpu.models.caduceus import CaduceusForMaskedLM
    from caduceus_tpu.tokenization import CaduceusTokenizer

    Lp = int(os.environ.get("BENCH_PREFILL_LP", 8192))
    n_layer = int(os.environ.get("BENCH_PREFILL_NLAYER", 16))
    d_model = int(os.environ.get("BENCH_PREFILL_DMODEL", 256))
    steps = int(os.environ.get("BENCH_PREFILL_STEPS", 3))

    version = int(os.environ.get("BENCH_PREFILL_VERSION", 1))
    tok = CaduceusTokenizer()
    ssm = (SSMConfig(version=2, d_state=128, headdim=64, ngroups=1,
                     ssd_chunk_size=128, ssd_seg_chunks=8)
           if version == 2 else SSMConfig())
    cfg = CaduceusConfig(
        d_model=d_model, n_layer=n_layer, vocab_size=tok.vocab_size,
        ssm_cfg=ssm,
        rcps=False, bidirectional=False, complement_map=tok.complement_map,
        dtype="bfloat16",
    )
    model = CaduceusForMaskedLM(cfg)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(7, 11, (1, Lp), dtype=np.int32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), ids[:, :64])

    results = {}
    for mode in ("parallel", "stepwise"):
        fn = jax.jit(lambda p, x, m=mode: prefill(p, cfg, x, mode=m))
        # NOTE: through the axon tunnel block_until_ready does not wait for
        # remote execution — device_get does (same pattern as bench.py)
        logits, _ = fn(params, ids)  # compile
        float(jax.device_get(logits[0, 0]))
        t0 = time.perf_counter()
        for _ in range(steps):
            logits, _ = fn(params, ids)
        float(jax.device_get(logits[0, 0]))
        dt = (time.perf_counter() - t0) / steps
        results[mode] = dt
        print(json.dumps({
            "metric": f"prefill_prompt_tokens_per_sec_{mode}",
            "value": round(Lp / dt, 1),
            "unit": (f"prompt tokens/s (Lp={Lp}, d_model={d_model}, "
                     f"n_layer={n_layer}, causal "
                     f"{'mamba2/ssd' if version == 2 else 'mamba'}, "
                     f"bf16)"),
        }))
    print(json.dumps({
        "metric": "prefill_parallel_speedup",
        "value": round(results["stepwise"] / results["parallel"], 1),
        "unit": "x over scan-of-steps",
    }))


if __name__ == "__main__":
    main()
