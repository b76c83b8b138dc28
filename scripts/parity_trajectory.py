"""Loss-trajectory equivalence: kernel=pallas vs kernel=xla on device.

The substitute for hg38 eval-loss parity while genome data has no ingress
path (VERDICT r1 next-#2b): train the same model, same init, same synthetic
batches with the Pallas kernels and with the XLA oracle scan; the loss
trajectories must track within bf16 noise. A kernel bug that preserves
smoke-test numerics but drifts under training pressure shows up here.

    python scripts/parity_trajectory.py [--steps 30] [--d-model 64] ...

Prints one JSON line with both trajectories and the max relative gap.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run(kernel, steps, d_model, n_layer, seqlen, batch, seed, version=1):
    import jax
    import jax.numpy as jnp

    from caduceus_tpu.config import CaduceusConfig, SSMConfig
    from caduceus_tpu.models.caduceus import CaduceusForMaskedLM
    from caduceus_tpu.tokenization import CaduceusTokenizer
    from caduceus_tpu.train.optim import make_optimizer
    from caduceus_tpu.train.trainer import TrainState, make_train_step

    tok = CaduceusTokenizer()
    if version == 2:
        ssm = SSMConfig(version=2, d_state=128, headdim=64, ngroups=1,
                        ssd_chunk_size=128, ssd_seg_chunks=8,
                        use_kernel=kernel)
    else:
        ssm = SSMConfig(use_kernel=kernel)
    cfg = CaduceusConfig(
        d_model=d_model, n_layer=n_layer, vocab_size=tok.vocab_size,
        ssm_cfg=ssm, rcps=True,
        complement_map=tok.complement_map, dtype="bfloat16",
        residual_in_fp32=False,
    )
    model = CaduceusForMaskedLM(cfg)
    rng = np.random.default_rng(seed)
    batches = [
        {
            "input_ids": rng.integers(7, 11, (batch, seqlen), dtype=np.int32),
            "targets": np.where(
                rng.random((batch, seqlen)) < 0.15,
                rng.integers(7, 11, (batch, seqlen)), 4
            ).astype(np.int32),
        }
        for _ in range(steps)
    ]
    params = jax.jit(model.init)(jax.random.PRNGKey(seed),
                                 batches[0]["input_ids"][:1, :256])
    tx, _ = make_optimizer(lr=1e-3, warmup_t=5, t_initial=steps)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_fn = jax.jit(make_train_step(model.apply, tx, ignore_index=4),
                      donate_argnums=0)
    losses = []
    for b in batches:
        state, m = step_fn(state, b)
        losses.append(m["loss"])
    return [float(x) for x in jax.device_get(losses)]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--d-model", type=int, default=64)
    p.add_argument("--n-layer", type=int, default=4)
    p.add_argument("--seqlen", type=int, default=4096)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tol", type=float, default=0.03,
                   help="max allowed relative loss gap (bf16 training noise)")
    p.add_argument("--version", type=int, default=1, choices=[1, 2],
                   help="2 = SSD family (pallas side runs the fused-conv "
                        "head-batched kernels via the v2 auto resolution)")
    args = p.parse_args()

    kernel = "pallas_batched" if args.version == 2 else "pallas"
    pallas = run(kernel, args.steps, args.d_model, args.n_layer,
                 args.seqlen, args.batch, args.seed, version=args.version)
    xla = run("xla", args.steps, args.d_model, args.n_layer,
              args.seqlen, args.batch, args.seed, version=args.version)
    gaps = [abs(a - b) / max(abs(b), 1e-6) for a, b in zip(pallas, xla)]
    out = {
        "version": args.version,
        "steps": args.steps,
        "final_loss_pallas": pallas[-1],
        "final_loss_xla": xla[-1],
        "max_rel_gap": max(gaps),
        "pallas": pallas,
        "xla": xla,
        "pass": max(gaps) <= args.tol,
    }
    print(json.dumps(out))
    return 0 if out["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
