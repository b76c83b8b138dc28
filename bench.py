"""Benchmark: tokens/sec/chip for Caduceus MLM pretraining on real hardware.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

North star (BASELINE.json): tokens/sec/chip at 131k-seqlen MLM pretrain.
Paper-scale model: d_model 256, n_layer 16 (released checkpoints,
`README.md:15-22`); 2^20 tokens per optimizer step
(`slurm_scripts/run_pretrain_caduceus.sh:32`). On a single 16 GB v5e chip the
2^20 tokens are split into gradient-accumulation microbatches
(BENCH_MICRO_TOKENS per microbatch); tokens/s/chip is unaffected by the
split. residual_in_fp32=False matches the reference experiment config
(`configs/model/caduceus.yaml:24`).

Env knobs: BENCH_SEQLEN (131072), BENCH_NLAYER (16), BENCH_STEPS (5),
BENCH_MICRO_TOKENS (262144), BENCH_KERNEL (auto|pallas|xla),
BENCH_REMAT_SPAN (1), BENCH_DATA (synthetic|python|native — python/native
run the real input pipeline + background device prefetch in the loop),
BENCH_PRESTAGE (1; 0 streams transfers inside the timed loop — see the
axon-tunnel note in the data-mode branch).
"""

import json
import os
import time

import numpy as np


def main():
    if os.environ.get("BENCH_VERIFY") == "1":
        # on-device numerics gate: real Mosaic kernels vs the XLA oracle
        # (scripts/verify_tpu.py); exits non-zero on any mismatch
        import subprocess
        import sys

        rc = subprocess.call([sys.executable, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "scripts",
            "verify_tpu.py")])
        if rc != 0:
            sys.exit(rc)

    from caduceus_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from caduceus_tpu.config import CaduceusConfig, SSMConfig
    from caduceus_tpu.models.caduceus import CaduceusForMaskedLM
    from caduceus_tpu.tokenization import CaduceusTokenizer
    from caduceus_tpu.train.optim import make_optimizer
    from caduceus_tpu.train.trainer import TrainState, make_train_step

    seqlen = int(os.environ.get("BENCH_SEQLEN", 131072))
    tokens_per_step = int(os.environ.get("BENCH_TOKENS_PER_STEP", 1 << 20))
    micro_tokens = int(os.environ.get("BENCH_MICRO_TOKENS", 1 << 18))
    micro_tokens = min(micro_tokens, tokens_per_step)
    micro_batch = max(1, micro_tokens // seqlen)
    accum = max(1, tokens_per_step // (micro_batch * seqlen))
    n_layer = int(os.environ.get("BENCH_NLAYER", 16))
    steps = int(os.environ.get("BENCH_STEPS", 3))
    kernel = os.environ.get("BENCH_KERNEL", "auto")
    remat_span = int(os.environ.get("BENCH_REMAT_SPAN", 1))

    tok = CaduceusTokenizer()
    # BENCH_FUSED_FRAME=1 (default) = the reference's training config
    # (`configs/model/caduceus.yaml` fused_add_norm: true — the released-
    # checkpoint RCPS block frame, one strand swap + (L,d) reversal per
    # block); 0 benches the cheaper non-fused frame.
    fused_frame = os.environ.get("BENCH_FUSED_FRAME", "1") == "1"
    # Headline default (r4): the Mamba-2 (SSD) mixer with the fused-conv
    # head-batched Pallas kernels — 104.5k tok/s/chip at the 131k geometry
    # vs v1's 79.0k same-session, at 8× the reference's per-head state
    # width (d_state 128 vs 16; mamba-ssm 2.x default). BENCH_SSM_VERSION=1
    # benches the v1 (selective-scan, reference-architecture) family.
    ssm_version = int(os.environ.get("BENCH_SSM_VERSION", 2))
    if ssm_version == 2:
        ssm_cfg = SSMConfig(
            version=2,
            use_kernel=kernel,
            d_state=int(os.environ.get("BENCH_D_STATE", 128)),
            # measured r4 optimum for the head-batched kernels (T=128 =
            # one MXU tile; chunk/seg sweep in PARITY.md)
            ssd_chunk_size=int(os.environ.get("BENCH_SSD_CHUNK", 128)),
            ssd_seg_chunks=int(os.environ.get("BENCH_SSD_SEG", 8)),
        )
    else:
        ssm_cfg = SSMConfig(use_kernel=kernel)
    cfg = CaduceusConfig(
        d_model=256,
        n_layer=n_layer,
        vocab_size=tok.vocab_size,
        ssm_cfg=ssm_cfg,
        rcps=True,
        complement_map=tok.complement_map,
        dtype="bfloat16",
        residual_in_fp32=False,
        fused_add_norm=fused_frame,
        remat=True,
        remat_span=remat_span,
    )
    # BENCH_MODEL=hyena benches the HyenaDNA-style LM family (NTP) at the
    # same geometry: fft long conv + per-branch gradient checkpointing
    # (reference checkpoint_mixer/mlp, `long_conv_lm.py:33-39`).
    bench_model = os.environ.get("BENCH_MODEL", "caduceus")
    if bench_model == "hyena":
        from caduceus_tpu.models.hyena import HyenaLMHeadModel

        # BENCH_ATTN_LAYER_IDX=i,j swaps those mixers for MHA (Pallas flash
        # attention on TPU, `ops/attention.py`) — the reference's hybrid
        # `attn_layer_idx` configs (`long_conv_lm.py:120-158`)
        attn_idx = tuple(
            int(i) for i in
            os.environ.get("BENCH_ATTN_LAYER_IDX", "").split(",") if i)
        model = HyenaLMHeadModel(
            d_model=256, n_layer=n_layer, vocab_size=tok.vocab_size,
            l_max=seqlen, attn_layer_idx=attn_idx,
            embed_dropout=0.0, resid_dropout=0.0,
            checkpoint_mixer=True, checkpoint_mlp=True, dtype="bfloat16")
    else:
        model = CaduceusForMaskedLM(cfg)

    rng = np.random.default_rng(0)
    total_rows = micro_batch * accum
    host_batch = {
        "input_ids": rng.integers(7, 11, (total_rows, seqlen), dtype=np.int32),
        "targets": rng.integers(0, 12, (total_rows, seqlen), dtype=np.int32),
    }

    params = jax.jit(model.init)(jax.random.PRNGKey(0), host_batch["input_ids"][:1, :256])
    tx, _ = make_optimizer(lr=8e-3, warmup_t=100, t_initial=50_000)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_fn = jax.jit(
        make_train_step(model.apply, tx, ignore_index=4, accum_steps=accum),
        donate_argnums=0,
    )

    # r5 variance protocol: the axon-tunnel chip shows ~8% session-to-session
    # spread (PARITY.md "Headline history"), so a single timed window can
    # masquerade as a real change. Default: 3 independent windows of `steps`
    # steps; the headline value is the MEDIAN window, min/max are reported
    # alongside.
    n_windows = int(os.environ.get("BENCH_WINDOWS", 3))
    data_mode = os.environ.get("BENCH_DATA", "synthetic")
    if data_mode in ("native", "python"):
        # real input pipeline in the loop (TODO r2: prefetch overlap proof):
        # synthetic genome -> HG38DataModule (+ C++ loader for "native")
        # -> background prefetch_to_device -> train step.
        import tempfile

        from caduceus_tpu.data.hg38 import HG38DataModule
        from caduceus_tpu.data.synthetic import make_synthetic_genome
        from caduceus_tpu.train.trainer import prefetch_to_device

        tmp = tempfile.mkdtemp(prefix="bench_genome_")
        # size the genome so the train split (~3/5 of windows) always fills
        # >=2 full drop_last batches of `total_rows` sequences
        fasta, bed = make_synthetic_genome(
            tmp, n_chromosomes=2,
            chrom_len=max(2 * total_rows * seqlen, 1 << 18),
            window=seqlen,
        )
        dm = HG38DataModule(
            bed, fasta, max_length=seqlen, batch_size=total_rows,
            use_native=(data_mode == "native"),
        )
        assert len(dm.train_loader()) >= 1, "synthetic genome too small"
        from caduceus_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(model=1)

        if os.environ.get("BENCH_PRESTAGE", "1") == "1":
            # Through the axon tunnel a host->device transfer issued while a
            # step is executing serializes with it (~6 s/step artifact; an
            # idle-device transfer of the same batch is 0.2 s — measured).
            # On a local TPU VM DMA overlaps compute, so the streaming mode
            # below is representative there; under the tunnel, pre-stage the
            # timed batches (still produced by the real loader) on the main
            # thread — no background transfers during the timed loop.
            from caduceus_tpu.parallel.mesh import shard_batch

            def host_stream():
                while True:
                    for b in dm.train_loader():
                        yield b

            hosts = host_stream()
            state, m = step_fn(state, shard_batch(mesh, next(hosts)))
            float(jax.device_get(m["loss"]))
            dts = []
            for _ in range(n_windows):
                staged = [shard_batch(mesh, next(hosts)) for _ in range(steps)]
                staged[-1]["input_ids"].block_until_ready()
                t0 = time.perf_counter()
                for b in staged:
                    state, m = step_fn(state, b)
                float(jax.device_get(m["loss"]))
                dts.append(time.perf_counter() - t0)
        else:

            def stream():
                while True:  # cycle epochs for however many steps we time
                    for b, _ in prefetch_to_device(dm.train_loader(), mesh):
                        yield b

            batches = stream()
            state, m = step_fn(state, next(batches))
            float(jax.device_get(m["loss"]))
            dts = []
            for _ in range(n_windows):
                t0 = time.perf_counter()
                for _ in range(steps):
                    state, m = step_fn(state, next(batches))
                float(jax.device_get(m["loss"]))
                dts.append(time.perf_counter() - t0)
    else:
        dev_batch = jax.device_put(host_batch)
        # warmup / compile. NOTE: through the axon tunnel, block_until_ready
        # does not actually wait for remote execution — device_get does.
        state, m = step_fn(state, dev_batch)
        float(jax.device_get(m["loss"]))

        dts = []
        for _ in range(n_windows):
            t0 = time.perf_counter()
            for _ in range(steps):
                state, m = step_fn(state, dev_batch)
            float(jax.device_get(m["loss"]))
            dts.append(time.perf_counter() - t0)

    n_chips = jax.device_count()
    window_tps = sorted(
        steps * total_rows * seqlen / d / n_chips for d in dts)
    tokens_per_sec_chip = window_tps[len(window_tps) // 2]  # median window
    # The reference publishes no throughput numbers (BASELINE.md:3-6,
    # BASELINE.json.published = {}), so vs_baseline is the ratio against this
    # repo's round-1 recorded headline (BENCH_r01.json: 60,129.2 tok/s/chip at
    # the same config) — only meaningful at the default headline config.
    r1_headline = 60129.2
    at_headline = (seqlen == 131072 and n_layer == 16
                   and tokens_per_step == 1 << 20
                   and bench_model == "caduceus")
    result = {
        "metric": "tokens_per_sec_per_chip_mlm_pretrain",
        "value": round(tokens_per_sec_chip, 1),
        "unit": (
            f"tokens/s/chip (seqlen={seqlen}, d_model=256, n_layer={n_layer}, "
            + ("hyena ntp, " if bench_model == "hyena" else "rcps, ")
            + f"micro_batch={micro_batch}, accum={accum}, "
            + (f"mamba2/ssd d_state={cfg.ssm_cfg.d_state} kernel={kernel})"
               if ssm_version == 2 else f"kernel={kernel})")
        ),
        "vs_baseline": (round(tokens_per_sec_chip / r1_headline, 3)
                        if at_headline else None),
        # spread across the independent timed windows (median is `value`)
        "windows": [round(t, 1) for t in window_tps],
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
