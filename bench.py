"""Benchmark: tokens/sec/chip for Caduceus MLM pretraining on real hardware.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

North star (BASELINE.json): tokens/sec/chip at 131k-seqlen MLM pretrain.
Paper-scale model: d_model 256, n_layer 16 (released checkpoints,
`README.md:15-22`); per-device batch x seqlen = 2^20 tokens
(`slurm_scripts/run_pretrain_caduceus.sh:32`). The sequence length is
scaled down if the chip's HBM cannot fit the full 131k training step; the
tokens/step invariant (batch x seqlen) is preserved.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from caduceus_tpu.config import CaduceusConfig, SSMConfig
    from caduceus_tpu.models.caduceus import CaduceusForMaskedLM
    from caduceus_tpu.tokenization import CaduceusTokenizer
    from caduceus_tpu.train.optim import make_optimizer
    from caduceus_tpu.train.trainer import TrainState, make_train_step

    seqlen = int(os.environ.get("BENCH_SEQLEN", 65536))
    tokens_per_step = 1 << 20
    batch = max(1, tokens_per_step // seqlen)
    n_layer = int(os.environ.get("BENCH_NLAYER", 16))
    steps = int(os.environ.get("BENCH_STEPS", 10))

    tok = CaduceusTokenizer()
    cfg = CaduceusConfig(
        d_model=256,
        n_layer=n_layer,
        vocab_size=tok.vocab_size,
        ssm_cfg=SSMConfig(),
        rcps=True,
        complement_map=tok.complement_map,
        dtype="bfloat16",
        remat=True,
    )
    model = CaduceusForMaskedLM(cfg)

    rng = np.random.default_rng(0)
    host_batch = {
        "input_ids": rng.integers(7, 11, (batch, seqlen), dtype=np.int32),
        "targets": rng.integers(0, 12, (batch, seqlen), dtype=np.int32),
    }

    params = jax.jit(model.init)(jax.random.PRNGKey(0), host_batch["input_ids"][:1, :256])
    tx, _ = make_optimizer(lr=8e-3, warmup_t=100, t_initial=50_000)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_fn = jax.jit(make_train_step(model.apply, tx, ignore_index=4), donate_argnums=0)

    dev_batch = jax.device_put(host_batch)
    # warmup / compile
    state, m = step_fn(state, dev_batch)
    jax.block_until_ready(m["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step_fn(state, dev_batch)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    tokens_per_sec_chip = steps * batch * seqlen / dt / n_chips
    result = {
        "metric": "tokens_per_sec_per_chip_mlm_pretrain",
        "value": round(tokens_per_sec_chip, 1),
        "unit": f"tokens/s/chip (seqlen={seqlen}, d_model=256, n_layer={n_layer}, rcps)",
        "vs_baseline": None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
