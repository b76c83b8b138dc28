"""Command-line entry points.

Maps the reference's three workloads (SURVEY.md §0, `README.md:71-253`) onto
subcommands:

    python -m caduceus_tpu.cli pretrain  --fasta ... --bed ... [overrides]
    python -m caduceus_tpu.cli finetune  --task genomic_benchmark ...
    python -m caduceus_tpu.cli vep       --fasta ... --vcf ...
    python -m caduceus_tpu.cli eval      --checkpoint ...

Replaces the Hydra CLI (`train.py:700-715`) with argparse + dataclass
configs; `model_config.json` is written to the run dir at startup for
fine-tuning consumption (parity with `src/utils/train.py:132-138`).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_common_model_args(p: argparse.ArgumentParser):
    p.add_argument("--d-model", type=int, default=256)
    p.add_argument("--n-layer", type=int, default=16)
    p.add_argument("--no-rcps", action="store_true")
    p.add_argument("--bidirectional-strategy", default="add")
    p.add_argument("--no-weight-tie", action="store_true")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--config-path", default=None,
                   help="load model config from a model_config.json")


def _build_model_config(args, tokenizer):
    from caduceus_tpu.config import CaduceusConfig, SSMConfig

    if args.config_path:
        cfg = CaduceusConfig.load(args.config_path)
        cfg.complement_map = tokenizer.complement_map
        return cfg
    ssm_cfg = getattr(args, "ssm_cfg", None)
    return CaduceusConfig(
        d_model=args.d_model,
        n_layer=args.n_layer,
        vocab_size=tokenizer.vocab_size,
        ssm_cfg=SSMConfig(**ssm_cfg) if ssm_cfg else SSMConfig(),
        rcps=not args.no_rcps,
        bidirectional_strategy=args.bidirectional_strategy,
        bidirectional_weight_tie=not args.no_weight_tie,
        complement_map=tokenizer.complement_map,
        dtype=args.dtype,
        remat=args.remat,
    )


def _load_preset(argv):
    """Extract --preset <yaml> and return (defaults_dict, remaining_argv).

    Presets (configs/*.yaml) mirror the reference's experiment configs;
    explicit CLI flags override preset values.
    """
    if "--preset" not in argv:
        return {}, argv
    i = argv.index("--preset")
    path = argv[i + 1]
    argv = argv[:i] + argv[i + 2 :]
    import yaml

    with open(path) as f:
        tree = yaml.safe_load(f) or {}
    flat = {}
    mapping = {
        ("model", "name"): "model",
        ("model", "d_model"): "d_model",
        ("model", "n_layer"): "n_layer",
        ("model", "dtype"): "dtype",
        ("model", "bidirectional_strategy"): "bidirectional_strategy",
        ("data", "max_length"): "max_length",
        ("data", "batch_size"): "batch_size",
        ("data", "mlm_probability"): "mlm_probability",
        ("train", "max_steps"): "max_steps",
        ("train", "lr"): "lr",
        ("train", "weight_decay"): "weight_decay",
        ("train", "seed"): "seed",
        ("train", "betas"): "betas",
        ("train", "warmup_frac"): "warmup_frac",
        ("train", "lr_min"): "lr_min",
        ("train", "gradient_clip"): "gradient_clip",
        ("train", "accum_steps"): "accum_steps",
        ("train", "ema_decay"): "ema_decay",
        ("train", "log_every"): "log_every",
        ("train", "eval_every"): "eval_every",
        ("train", "eval_batches"): "eval_batches",
        ("train", "checkpoint_every"): "checkpoint_every",
    }
    for (sec, key), dest in mapping.items():
        if sec in tree and key in (tree[sec] or {}):
            flat[dest] = tree[sec][key]
    # boolean/flag-style settings
    model = tree.get("model") or {}
    data = tree.get("data") or {}
    # hyena-family extras (`configs/model/hyena.yaml` analog): hybrid MHA
    # layer placement + per-branch gradient checkpointing
    if isinstance(model.get("attn_layer_idx"), (list, tuple)):
        flat["attn_layer_idx"] = tuple(int(i) for i in model["attn_layer_idx"])
    if "num_heads" in model:
        flat["num_heads"] = model["num_heads"]
    if model.get("checkpoint"):
        flat["hyena_checkpoint"] = True
    if model.get("rcps") is False:
        flat["no_rcps"] = True
    if model.get("remat"):
        flat["remat"] = True
    if data.get("rc_aug"):
        flat["rc_aug"] = True
    if data.get("mlm") is False:
        flat["ntp"] = True
    # nested SSM settings pass through whole (e.g. version: 2 selects the
    # Mamba-2/SSD mixer — configs/hg38_mlm_v2.yaml)
    if isinstance(model.get("ssm_cfg"), dict):
        flat["ssm_cfg"] = model["ssm_cfg"]
    # parallelism section: mesh shape + strategy flags
    par = tree.get("parallel") or {}
    if "mesh_model" in par:
        flat["mesh_model"] = par["mesh_model"]
    if par.get("tensor_parallel"):
        flat["tensor_parallel"] = True
    if par.get("context_parallel"):
        flat["context_parallel"] = True
    return flat, argv


def cmd_pretrain(argv):
    preset, argv = _load_preset(argv)
    p = argparse.ArgumentParser(prog="pretrain")
    p.add_argument("--fasta", required=True)
    p.add_argument("--bed", required=True)
    p.add_argument("--max-length", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-steps", type=int, default=10000)
    p.add_argument("--lr", type=float, default=8e-3)
    p.add_argument("--weight-decay", type=float, default=0.1)
    p.add_argument("--betas", type=float, nargs=2, default=[0.9, 0.95])
    p.add_argument("--warmup-frac", type=float, default=0.1)
    p.add_argument("--lr-min", type=float, default=1e-4)
    p.add_argument("--gradient-clip", type=float, default=1.0)
    p.add_argument("--mlm-probability", type=float, default=0.15)
    p.add_argument("--ntp", action="store_true", help="next-token objective instead of MLM")
    p.add_argument("--rc-aug", action="store_true")
    p.add_argument("--accum-steps", type=int, default=1)
    p.add_argument("--run-dir", default="./outputs/pretrain")
    p.add_argument("--seed", type=int, default=2222)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--use-native-loader", action="store_true")
    p.add_argument("--prefetch", type=int, default=2,
                   help="device-prefetch queue depth; 0 serializes the input "
                        "stream (use 0 on remote/tunneled TPUs where "
                        "transfers concurrent with execution serialize — see "
                        "bench.py BENCH_PRESTAGE note)")
    p.add_argument("--ema-decay", type=float, default=0.0)
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--eval-every", type=int, default=1000)
    p.add_argument("--eval-batches", type=int, default=16)
    p.add_argument("--checkpoint-every", type=int, default=500)
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of a few steady-state "
                        "steps into this directory (tensorboard-viewable)")
    p.add_argument("--model", default="caduceus",
                   choices=["caduceus", "mamba", "hyena"],
                   help="caduceus (BiMamba/RCPS, MLM or NTP); mamba = "
                        "unidirectional NTP (`dna_embedding.py:99-153`); "
                        "hyena = HyenaDNA-style NTP LM with dropout + "
                        "filter lr groups (`long_conv_lm.py`, "
                        "`configs/model/hyena.yaml`)")
    # hyena-family structure flags (reference: `long_conv_lm.py:120-158`
    # attn_layer_idx/attn_cfg select hybrid MHA layers; checkpoint_mixer/
    # checkpoint_mlp at `long_conv_lm.py:33-39`). MHA runs the Pallas flash
    # kernel on TPU (`ops/attention.py`).
    p.add_argument("--attn-layer-idx",
                   type=lambda s: tuple(int(x) for x in s.split(",") if x),
                   default=(),
                   help="comma-separated layer indices that use MHA instead "
                        "of the Hyena mixer (--model hyena only)")
    p.add_argument("--num-heads", type=int, default=8,
                   help="MHA heads on hybrid attention layers")
    p.add_argument("--hyena-checkpoint", action="store_true",
                   help="remat the mixer and MLP branches per block "
                        "(needed to train hyena at >=131k within HBM)")
    # multi-chip strategies (reference analog: auto-DDP when devices>1,
    # `train.py:629-639`; CP/TP are beyond-reference). The mesh is
    # (data, model): DP over 'data' is always on; --mesh-model N carves a
    # 'model' axis for --tensor-parallel (Megatron param shards + per-shard
    # scan kernels) or --context-parallel (sequence sharded over 'model' —
    # two-pass exact scan; takes seqlen past single-chip HBM).
    p.add_argument("--mesh-model", type=int, default=1,
                   help="size of the mesh 'model' axis (devices = data x model)")
    p.add_argument("--tensor-parallel", action="store_true",
                   help="shard params + scans over the 'model' axis")
    p.add_argument("--context-parallel", action="store_true",
                   help="shard the sequence axis over the 'model' axis")
    _add_common_model_args(p)
    p.set_defaults(**preset)
    args = p.parse_args(argv)
    if args.model in ("mamba", "hyena") and not args.ntp:
        p.error(f"--model {args.model} is causal: pretrain with --ntp")
    if args.tensor_parallel and args.context_parallel:
        p.error("--tensor-parallel and --context-parallel share the single "
                "'model' mesh axis; pick one per run")
    if (args.tensor_parallel or args.context_parallel) and args.mesh_model < 2:
        p.error("--tensor-parallel/--context-parallel need --mesh-model >= 2")
    if args.context_parallel and args.max_length % args.mesh_model != 0:
        p.error(f"--max-length {args.max_length} not divisible by "
                f"--mesh-model {args.mesh_model} (context parallelism "
                f"shards the sequence axis)")
    if (args.attn_layer_idx or args.hyena_checkpoint) and args.model != "hyena":
        p.error("--attn-layer-idx/--hyena-checkpoint require --model hyena")
    if any(i < 0 or i >= args.n_layer for i in args.attn_layer_idx):
        p.error(f"--attn-layer-idx entries must be in [0, {args.n_layer})")

    import jax

    from caduceus_tpu.data.hg38 import HG38DataModule
    from caduceus_tpu.models.caduceus import CaduceusForMaskedLM
    from caduceus_tpu.train.trainer import Trainer, TrainerConfig

    dm = HG38DataModule(
        args.bed,
        args.fasta,
        max_length=args.max_length,
        batch_size=args.batch_size,
        mlm=not args.ntp,
        mlm_probability=args.mlm_probability,
        rc_aug=args.rc_aug,
        seed=args.seed,
        rank=jax.process_index(),
        world_size=jax.process_count(),
        use_native=args.use_native_loader,
    )
    os.makedirs(args.run_dir, exist_ok=True)
    lr_overrides = None
    dropout = False
    if args.model == "hyena":
        import json as _json

        from caduceus_tpu.models.hyena import HyenaLMHeadModel
        from caduceus_tpu.train.optim import hyena_lr_overrides

        hy = dict(d_model=args.d_model, n_layer=args.n_layer,
                  vocab_size=dm.tokenizer.vocab_size, l_max=args.max_length,
                  attn_layer_idx=tuple(args.attn_layer_idx),
                  num_heads=args.num_heads,
                  checkpoint_mixer=args.hyena_checkpoint,
                  checkpoint_mlp=args.hyena_checkpoint,
                  dtype=args.dtype)
        with open(os.path.join(args.run_dir, "model_config.json"), "w") as f:
            # "lr" recorded so eval/continued-training rebuilds the filter
            # lr-override factors against the run's actual base lr
            _json.dump({"model_type": "hyena", "objective": "ntp",
                        "lr": args.lr, **hy}, f, indent=2)
        model = HyenaLMHeadModel(**hy)
        # `configs/model/hyena.yaml:22-24`: filter MLP at base lr / wd 0,
        # pos-emb z frozen; embed/resid dropout on
        lr_overrides = hyena_lr_overrides(args.lr)
        dropout = True
    else:
        cfg = _build_model_config(args, dm.tokenizer)
        if args.model == "mamba":
            # unidirectional causal Mamba LM (`dna_embedding.py:99-153`)
            cfg.rcps = False
            cfg.bidirectional = False
        if args.tensor_parallel:
            cfg.tensor_parallel_axis = "model"
        if args.context_parallel:
            cfg.context_parallel_axis = "model"
        # record the pretraining objective so `eval` rebuilds the right task
        # (NTP-pretrained models must not be scored against MLM-masked data)
        meta = cfg.to_dict()
        meta["objective"] = "ntp" if args.ntp else "mlm"
        # parallelism axes are run-time launch choices, not model identity:
        # a config_path consumer (finetune/eval/vep, possibly single-chip)
        # must not inherit a mesh requirement
        meta["tensor_parallel_axis"] = None
        meta["context_parallel_axis"] = None
        with open(os.path.join(args.run_dir, "model_config.json"), "w") as f:
            json.dump(meta, f, indent=2)
        model = CaduceusForMaskedLM(cfg)
    tcfg = TrainerConfig(
        max_steps=args.max_steps,
        run_dir=args.run_dir,
        seed=args.seed,
        lr=args.lr,
        weight_decay=args.weight_decay,
        betas=tuple(args.betas),
        warmup_frac=args.warmup_frac,
        lr_min=args.lr_min,
        gradient_clip=args.gradient_clip,
        accum_steps=args.accum_steps,
        ema_decay=args.ema_decay,
        dropout=dropout,
        prefetch=args.prefetch,
        profile_dir=args.profile_dir,
        log_every=args.log_every,
        eval_every=args.eval_every,
        eval_batches=args.eval_batches,
        checkpoint_every=args.checkpoint_every,
    )
    from caduceus_tpu.utils.logging import make_logger, param_count

    log_fn = make_logger(run_dir=args.run_dir, rank=jax.process_index())
    train_loader = dm.train_loader()
    mesh = None
    if args.mesh_model > 1:
        from caduceus_tpu.parallel.mesh import make_mesh

        if args.model == "hyena" and args.context_parallel:
            p.error("--context-parallel is not supported by --model hyena "
                    "(the FFT long conv has no sequence-sharded path)")
        mesh = make_mesh(model=args.mesh_model)
    trainer = Trainer(model, tcfg, train_loader, dm.eval_loader("valid"),
                      mesh=mesh,
                      ignore_index=dm.tokenizer.pad_token_id, log_fn=log_fn,
                      lr_overrides=lr_overrides,
                      tensor_parallel=args.tensor_parallel,
                      context_parallel=args.context_parallel)
    trainer.init_state(next(iter(train_loader)))
    log_fn(param_count(trainer.state.params))
    if args.resume:
        trainer.restore_checkpoint()
    metrics = trainer.fit()
    trainer.save_checkpoint()
    print(json.dumps({"final": metrics}))


def cmd_finetune(argv):
    from caduceus_tpu.finetune import main as finetune_main

    finetune_main(argv)


def cmd_vep(argv):
    from caduceus_tpu.vep import main as vep_main

    vep_main(argv)


def cmd_eval(argv):
    p = argparse.ArgumentParser(prog="eval")
    p.add_argument("--fasta", required=True)
    p.add_argument("--bed", required=True)
    p.add_argument("--run-dir", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--max-length", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-batches", type=int, default=100)
    # same mesh flags as pretrain: context parallelism lets eval score
    # sequences longer than one chip's HBM (e.g. 262k on an 8-chip axis)
    p.add_argument("--mesh-model", type=int, default=1,
                   help="size of the mesh 'model' axis (devices = data x model)")
    p.add_argument("--tensor-parallel", action="store_true")
    p.add_argument("--context-parallel", action="store_true")
    args = p.parse_args(argv)
    if args.tensor_parallel and args.context_parallel:
        p.error("--tensor-parallel and --context-parallel share the single "
                "'model' mesh axis; pick one per run")
    if (args.tensor_parallel or args.context_parallel) and args.mesh_model < 2:
        p.error("--tensor-parallel/--context-parallel need --mesh-model >= 2")
    if args.context_parallel and args.max_length % args.mesh_model != 0:
        p.error(f"--max-length {args.max_length} not divisible by "
                f"--mesh-model {args.mesh_model}")

    from caduceus_tpu.config import CaduceusConfig
    from caduceus_tpu.data.hg38 import HG38DataModule
    from caduceus_tpu.models.caduceus import CaduceusForMaskedLM
    from caduceus_tpu.train.trainer import Trainer, TrainerConfig

    cfg_path = os.path.join(args.run_dir, "model_config.json")
    with open(cfg_path) as f:
        raw = json.load(f)
    lr_overrides = None
    if raw.get("model_type") == "hyena":
        from caduceus_tpu.models.hyena import HyenaLMHeadModel
        from caduceus_tpu.train.optim import hyena_lr_overrides

        if "attn_layer_idx" in raw:  # JSON stores the tuple as a list
            raw["attn_layer_idx"] = tuple(raw["attn_layer_idx"])
        model = HyenaLMHeadModel(
            **{k: v for k, v in raw.items()
               if k not in ("model_type", "objective", "lr")}
        )
        mlm = False
        # same optimizer transform chain as pretrain (checkpointed opt-state
        # pytree must match the restore template), rebuilt against the run's
        # recorded base lr so the factor values are right too — the trainer
        # below must use that same base lr or lr_multiplier_tree computes
        # filter_lr/default_lr instead of 1.0 (train/optim.py:84)
        run_lr = raw.get("lr", TrainerConfig.lr)
        lr_overrides = hyena_lr_overrides(run_lr)
    else:
        cfg = CaduceusConfig.load(cfg_path)
        if args.tensor_parallel:
            cfg.tensor_parallel_axis = "model"
        if args.context_parallel:
            cfg.context_parallel_axis = "model"
        model = CaduceusForMaskedLM(cfg)
        # objective recorded at pretrain time (older runs default to MLM)
        mlm = raw.get("objective", "mlm") == "mlm"
        run_lr = TrainerConfig.lr
    if (args.tensor_parallel or args.context_parallel) and (
            raw.get("model_type") == "hyena"):
        p.error("--tensor-parallel/--context-parallel eval is only "
                "supported for the caduceus/mamba families")
    mesh = None
    if args.mesh_model > 1:
        from caduceus_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(model=args.mesh_model)
    dm = HG38DataModule(args.bed, args.fasta, max_length=args.max_length,
                        batch_size=args.batch_size, mlm=mlm)
    tcfg = TrainerConfig(run_dir=args.run_dir, lr=run_lr)
    trainer = Trainer(model, tcfg, dm.train_loader(), dm.eval_loader(args.split),
                      mesh=mesh, lr_overrides=lr_overrides,
                      tensor_parallel=args.tensor_parallel,
                      context_parallel=args.context_parallel)
    trainer.init_state(next(iter(trainer.train_loader)))
    assert trainer.restore_checkpoint(), "no checkpoint found"
    print(json.dumps(trainer.evaluate(max_batches=args.max_batches,
                                      prefix=args.split)))


def cmd_generate(argv):
    """Autoregressive generation through the recurrent (O(1)/token) path.

    Parity target: the reference's generation entry on unidirectional LMs
    (`src/models/sequence/long_conv_lm.py:391-493`, mamba-ssm `Mamba.step`).
    Requires a causal model (bidirectional=False, rcps=False), e.g. one
    pretrained with `pretrain --ntp --no-rcps` plus `bidirectional=false`.
    """
    p = argparse.ArgumentParser(prog="generate")
    p.add_argument("--run-dir", required=True,
                   help="run dir with model_config.json + checkpoint")
    p.add_argument("--prompt", default="ACGT", help="DNA prompt string")
    p.add_argument("--max-new-tokens", type=int, default=64)
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--top-k", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from caduceus_tpu.config import CaduceusConfig
    from caduceus_tpu.inference import generate
    from caduceus_tpu.tokenization import CaduceusTokenizer
    from caduceus_tpu.train.checkpoint import load_run_params

    cfg = CaduceusConfig.load(os.path.join(args.run_dir, "model_config.json"))
    tok = CaduceusTokenizer()
    prompt_ids = jnp.asarray(tok.encode(args.prompt), jnp.int32)[None]

    # params-only restore (no optimizer/EMA template needed)
    params, _ = load_run_params(args.run_dir)

    out = generate(
        params, cfg, prompt_ids, args.max_new_tokens,
        rng=jax.random.PRNGKey(args.seed),
        temperature=args.temperature, top_k=args.top_k,
    )
    print(json.dumps({
        "prompt": args.prompt,
        "generated": tok.decode(np.asarray(out[0, prompt_ids.shape[1]:])),
    }))


def cmd_serve(argv):
    """Batch inference HTTP server over a trained run dir (`serve.py`):
    length-bucketed jit caching + micro-batched device dispatch for
    /embed, /logits, /generate."""
    p = argparse.ArgumentParser(prog="serve")
    p.add_argument("--run-dir", required=True,
                   help="run dir with model_config.json + checkpoint")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-length", type=int, default=131072)
    p.add_argument("--min-bucket", type=int, default=128)
    p.add_argument("--warmup", action="store_true",
                   help="pre-compile every bucket's programs before "
                        "accepting traffic (no live request pays a compile)")
    args = p.parse_args(argv)

    from caduceus_tpu.serve import InferenceServer, InferenceService

    svc = InferenceService.from_run_dir(
        args.run_dir, max_batch=args.max_batch, max_length=args.max_length,
        min_bucket=args.min_bucket)
    if args.warmup:
        n = svc.warmup()
        print(json.dumps({"warmed_programs": n}), flush=True)
    server = InferenceServer(svc, args.host, args.port)
    print(json.dumps({"serving": f"http://{args.host}:{server.port}",
                      "endpoints": ["/embed", "/logits", "/generate",
                                    "/healthz"]}), flush=True)
    server.serve_forever()


def _maybe_init_distributed():
    """Multi-host init (replaces SLURM srun/torchrun process launch,
    SURVEY.md §2.5): enable with CADUCEUS_MULTIHOST=1; coordinator/process
    env comes from the standard JAX cluster-env variables or the TPU
    metadata. One process per host."""
    if os.environ.get("CADUCEUS_MULTIHOST") == "1":
        import jax

        jax.distributed.initialize()


def main(argv=None):
    argv = sys.argv[1:] if argv is None else list(argv)
    cmds = {
        "pretrain": cmd_pretrain,
        "finetune": cmd_finetune,
        "vep": cmd_vep,
        "eval": cmd_eval,
        "generate": cmd_generate,
        "serve": cmd_serve,
    }
    if not argv or argv[0] not in cmds:
        print(f"usage: python -m caduceus_tpu.cli {{{','.join(cmds)}}} ...")
        sys.exit(2)
    from caduceus_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    _maybe_init_distributed()
    cmds[argv[0]](argv[1:])


if __name__ == "__main__":
    main()
