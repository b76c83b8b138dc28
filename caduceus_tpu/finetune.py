"""Downstream fine-tuning: GenomicBenchmarks / NucleotideTransformer tasks.

Workload parity with the reference fine-tuning path (SURVEY.md §3.2):
- model config reconstituted from the pretraining run's `model_config.json`
  (`train.py:182-192`);
- pretrained backbone weights grafted, heads from scratch (`load_backbone`,
  `src/models/sequence/dna_embedding.py:198-255`);
- RCPS / conjoin-aware classification head with shared scorer averaged over
  strands (`caduceus/modeling_caduceus.py:562-608`, `src/tasks/decoders.py:146-153`);
- per-task metrics: accuracy / mcc / f1 (`src/tasks/metrics.py`);
- multi-seed cross-validation protocol (5 or 10 seeds,
  `slurm_scripts/run_genomics_benchmark.sh:33`).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Dict, Optional

import numpy as np


def _make_classifier(cfg, num_labels, pooling, use_lengths, padding_side,
                     encoder="id", model_kind="caduceus"):
    """The reference fine-tuning stack: DNAEmbeddingModelCaduceus backbone
    (`src/models/sequence/dna_embedding.py:156-195`) + SequenceDecoder
    (`src/tasks/decoders.py:40-161`) with shared-head strand averaging.

    Strand stacking is decided by input rank / config, mirroring the
    reference's data-driven conjoin dispatch: rcps → canonical strands
    stacked; (B, L, 2) ids → backbone run per strand; else plain.
    """
    import flax.linen as nn
    import jax.numpy as jnp

    from caduceus_tpu.models.caduceus import CaduceusBackbone
    from caduceus_tpu.models.encoders import make_encoder
    from caduceus_tpu.models.heads import SequenceDecoder

    if model_kind == "cnn":
        # from-scratch CNN baseline (reference
        # `configs/experiment/hg38/genomic_benchmark_cnn.yaml` +
        # `src/models/baseline/genomics_benchmark_cnn.py`): plain (B, L)
        # ids, BatchNorm running stats as a mutable collection.
        from caduceus_tpu.models.cnn import GenomicsBenchmarkCNN

        class CNNClassifier(nn.Module):
            @nn.compact
            def __call__(self, ids, lengths=None, train=False):
                assert ids.ndim == 2, "CNN baseline takes plain (B, L) ids"
                return GenomicsBenchmarkCNN(
                    num_classes=num_labels, name="cnn"
                )(ids, train=train)

        return CNNClassifier()

    if model_kind == "hyena":
        # HyenaDNA-style backbone finetuning — the reference's
        # `model: dna_embedding` downstream recipe
        # (`configs/experiment/hg38/genomic_benchmark.yaml:31-32`,
        # `src/models/sequence/dna_embedding.py:27-96`): LMBackbone hidden
        # states (no LM head) into the SequenceDecoder. Here ``cfg`` is the
        # HyenaLMBackbone kwargs dict from the pretrain run's
        # model_config.json. Non-rcps, so post-hoc conjoining (B, L, 2)
        # works the same as for the plain caduceus path.
        from caduceus_tpu.models.hyena import HyenaLMBackbone

        assert encoder in ("id", "stop", "identity"), (
            "encoders are a caduceus-path feature; hyena embeds its own tokens"
        )
        hy = dict(cfg)
        hy["attn_layer_idx"] = tuple(hy.get("attn_layer_idx", ()))

        class HyenaDNAClassifier(nn.Module):
            @nn.compact
            def __call__(self, ids, lengths=None, train=False):
                backbone = HyenaLMBackbone(**hy, name="backbone")
                dec = SequenceDecoder(
                    num_labels, mode=pooling,
                    use_lengths=use_lengths, padding_side=padding_side,
                    name="decoder",
                )
                if not use_lengths:
                    lengths = None
                if ids.ndim == 3:  # conjoined (B, L, 2) strands
                    h_f, _ = backbone(ids[..., 0], train=train)
                    h_r, _ = backbone(ids[..., 1], train=train)
                    x = jnp.stack([h_f, h_r], axis=-1)
                else:
                    x, _ = backbone(ids, train=train)
                logits = dec(x, lengths)
                return logits.astype(jnp.float32)

        return HyenaDNAClassifier()

    if encoder not in ("id", "stop", "identity"):
        assert not cfg.rcps, (
            "non-identity encoders bypass the complement map; use rcps=False"
        )

    class DNAClassifier(nn.Module):
        @nn.compact
        def __call__(self, ids, lengths=None, train=False):
            backbone = CaduceusBackbone(cfg, name="backbone")
            dec = SequenceDecoder(
                num_labels, mode=pooling,
                use_lengths=use_lengths, padding_side=padding_side,
                name="decoder",
            )
            if not use_lengths:
                lengths = None
            if encoder not in ("id", "stop", "identity"):
                # reference `src/tasks/encoders.py`: encoder output feeds
                # the backbone in place of its internal token embedding
                enc = make_encoder(
                    encoder, d_model=cfg.d_model,
                    n_tokens=cfg.padded_vocab_size, name="encoder",
                )
                x, _ = backbone(None, inputs_embeds=enc(ids))
            elif cfg.rcps:
                assert ids.ndim == 2, (
                    "rcps backbone takes plain (B, L) ids — conjoined "
                    "(B, L, 2) inputs are the non-rcps (Caduceus-Ph) recipe"
                )
                h, _ = backbone(ids)  # (2, B, L, d) canonical == the
                # reference's stacked [h[..., :d], flip(h[..., d:])]
                # channels (`dna_embedding.py:181-187`)
                x = jnp.stack([h[0], h[1]], axis=-1)
            elif ids.ndim == 3:  # conjoined (B, L, 2) strands
                h_f, _ = backbone(ids[..., 0])
                h_r, _ = backbone(ids[..., 1])
                x = jnp.stack([h_f, h_r], axis=-1)
            else:
                x, _ = backbone(ids)
            logits = dec(x, lengths)
            return logits.astype(jnp.float32)

    return DNAClassifier()


def finetune_one(
    cfg,
    dm,
    num_labels: int,
    pretrained_params=None,
    epochs: int = 10,
    lr: float = 1e-3,
    weight_decay: float = 0.1,
    pooling: str = "mean",
    seed: int = 0,
    metric: str = "accuracy",
    select_metric: Optional[str] = None,
    problem_type: str = "single_label_classification",
    freeze_backbone: bool = False,
    use_lengths: bool = False,
    layer_decay: Optional[float] = None,
    encoder: str = "id",
    model_kind: str = "caduceus",
    log_fn=None,
    return_state: bool = False,
) -> Dict[str, float]:
    """Train one downstream run; returns best-val and test metrics.

    With ``return_state`` also returns the best-val variables
    ``(params_dict, extra_collections)`` so callers can export the
    selected model (`--save-dir`, served by `serve.py` /classify)."""
    import jax
    import jax.numpy as jnp
    import optax

    from caduceus_tpu.train.checkpoint import load_backbone
    from caduceus_tpu.train.metrics import f1 as f1_fn, mcc as mcc_fn, roc_auc
    from caduceus_tpu.train.optim import make_optimizer

    log = log_fn or (lambda m: print(json.dumps(m)))
    padding_side = getattr(dm.tokenizer, "padding_side", "left")
    if model_kind == "cnn":
        assert pretrained_params is None and not freeze_backbone, (
            "the CNN baseline trains from scratch (no backbone)"
        )
    model = _make_classifier(cfg, num_labels, pooling, use_lengths,
                             padding_side, encoder=encoder,
                             model_kind=model_kind)

    example = next(dm.batches("train", seed=seed))
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.asarray(example["input_ids"]),
        jnp.asarray(example["lengths"]),
    )
    # non-param collections (CNN BatchNorm running stats) are carried
    # alongside the optimizer state, not optimized
    extra0 = {k: v for k, v in variables.items() if k != "params"}
    params = {"params": variables["params"]}
    if pretrained_params is not None:
        params = load_backbone(pretrained_params, params)

    steps_per_epoch = max(1, len(dm.train_ds) // dm.batch_size)
    total = steps_per_epoch * epochs
    tx, _ = make_optimizer(
        lr=lr, weight_decay=weight_decay, betas=(0.9, 0.999),
        warmup_t=max(1, total // 10), t_initial=total, lr_min=lr * 0.01,
        params_example=params if layer_decay is not None else None,
        layer_decay=layer_decay,
    )
    opt_state = tx.init(params)

    def loss_fn(p, extra, ids, labels, lengths, dr):
        # hyena backbones carry embed/resid dropout (train=True path); the
        # rng stream is ignored by dropout-free models
        if extra:
            logits, new_extra = model.apply(
                {**p, **extra}, ids, lengths, True, mutable=list(extra),
                rngs={"dropout": dr},
            )
        else:
            logits = model.apply(p, ids, lengths, True, rngs={"dropout": dr})
            new_extra = extra
        # problem-type dispatch (`modeling_caduceus.py:612-631`)
        if problem_type == "regression":
            # head emits (B, 1) (num_labels == 1); labels are float (B,)
            loss = jnp.mean(jnp.square(logits[..., 0] - labels))
        elif problem_type == "multi_label_classification":
            loss = optax.sigmoid_binary_cross_entropy(logits, labels).mean()
        else:
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
        return loss, (logits, new_extra)

    def zero_backbone_grads(g):
        # freeze option (`load_backbone` freeze, `dna_embedding.py:248-252`)
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: jnp.zeros_like(leaf)
            if any(str(getattr(p, "key", p)) == "backbone" for p in path)
            else leaf,
            g,
        )

    @jax.jit
    def train_step(p, o, extra, ids, labels, lengths, dr):
        (loss, (_, extra)), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, extra, ids, labels, lengths, dr
        )
        if freeze_backbone:
            g = zero_backbone_grads(g)
        updates, o = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o, extra, loss

    @jax.jit
    def predict(p, extra, ids, lengths):
        return model.apply({**p, **extra}, ids, lengths)  # raw fp32 scores

    def eval_split(p, extra, split):
        scores, labels = [], []
        for batch in dm.batches(split, shuffle=False, drop_last=False):
            scores.append(np.asarray(predict(
                p, extra, jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["lengths"]),
            )))
            labels.append(batch["labels"])
        scores = np.concatenate(scores)
        labels = np.concatenate(labels)
        if problem_type == "regression":
            # regression evaluates with MSE/MAE, not argmax accuracy
            pred = scores[..., 0] if scores.ndim > 1 else scores
            err = pred - labels
            return {"mse": float(np.mean(err**2)),
                    "mae": float(np.mean(np.abs(err)))}
        if problem_type == "multi_label_classification":
            # sigmoid-thresholded per-label accuracy + exact-match ratio
            preds = (scores > 0).astype(labels.dtype)
            return {
                "accuracy": float((preds == labels).mean()),
                "subset_accuracy": float((preds == labels).all(-1).mean()),
            }
        preds = np.argmax(scores, axis=-1)
        out = {"accuracy": float((preds == labels).mean())}
        if metric in ("mcc", "all"):
            out["mcc"] = mcc_fn(preds, labels)
        if metric in ("f1", "all"):
            out["f1"] = f1_fn(preds, labels,
                              average="binary" if num_labels == 2 else "macro")
        if num_labels == 2 and metric in ("roc_auc", "all"):
            # decision scores kept for AUROC (`src/tasks/metrics.py` roc_auc)
            e = np.exp(scores - scores.max(-1, keepdims=True))
            out["roc_auc"] = roc_auc((e / e.sum(-1, keepdims=True))[:, 1], labels)
        return out

    # higher-is-better for classification; lower for regression
    def better(a, b):
        return a < b if problem_type == "regression" else a > b

    # best-val selection metric: the task's headline metric, never the
    # literal "all" (r2 bug: "all" silently fell back to accuracy, wrong
    # for NT tasks whose protocol selects checkpoints by mcc/f1 —
    # `slurm_scripts/run_nucleotide_transformer.sh:33-60`)
    if problem_type == "regression":
        sel_metric = "mse"
    elif problem_type == "multi_label_classification":
        sel_metric = select_metric or "accuracy"
    else:
        sel_metric = select_metric or (
            metric if metric != "all" else "accuracy")
    best_val = np.inf if problem_type == "regression" else -np.inf
    best_params, best_extra = params, extra0
    extra = extra0
    dr_rng = jax.random.PRNGKey(seed ^ 0x5EED)
    for epoch in range(epochs):
        for batch in dm.batches("train", epoch=epoch, seed=seed):
            dr_rng, dr = jax.random.split(dr_rng)
            params, opt_state, extra, loss = train_step(
                params, opt_state, extra, jnp.asarray(batch["input_ids"]),
                jnp.asarray(batch["labels"]), jnp.asarray(batch["lengths"]),
                dr,
            )
        val = eval_split(params, extra, "val")
        score = val[sel_metric]  # loud KeyError beats silent wrong selection
        log({"epoch": epoch, "loss": float(loss), **{f"val/{k}": v for k, v in val.items()}})
        if better(score, best_val):
            best_val, best_params, best_extra = score, params, extra

    test = eval_split(best_params, best_extra, "test")
    log({f"test/{k}": v for k, v in test.items()})
    result = {"best_val": float(best_val),
              **{f"test_{k}": v for k, v in test.items()}}
    if return_state:
        return result, (best_params, best_extra)
    return result


def _export_finetuned(args, cfg, model_kind, select, best_export):
    """Write a deployable model dir: params/ (best-val variables of the
    best seed) + task_config.json (everything `serve.py` needs to rebuild
    the classifier and encode requests identically to eval)."""
    from caduceus_tpu.train.checkpoint import save_params

    score, seed, (params, extra), num_classes, dm = best_export
    os.makedirs(args.save_dir, exist_ok=True)
    save_params(os.path.join(args.save_dir, "params"), {**params, **extra})
    if model_kind == "caduceus":
        model_cfg = cfg.to_dict()
    elif model_kind == "hyena":
        model_cfg = dict(cfg)
        model_cfg["attn_layer_idx"] = list(model_cfg.get("attn_layer_idx",
                                                         ()))
    else:  # cnn trains from scratch; _make_classifier needs no backbone cfg
        model_cfg = None
    task_cfg = {
        "task": args.task,
        "num_classes": int(num_classes),
        "pooling": args.pooling,
        "problem_type": args.problem_type,
        "use_lengths": bool(args.use_lengths),
        "padding_side": getattr(dm.tokenizer, "padding_side", "left"),
        "add_eos": bool(getattr(dm.train_ds, "add_eos", False)),
        "conjoin": bool(args.conjoin_train or args.conjoin_test),
        "encoder": args.encoder,
        "model_kind": model_kind,
        "max_length": int(args.max_length),
        "seed": int(seed),
        "select_metric": select,
        "val_score": float(score),
        "model_cfg": model_cfg,
    }
    with open(os.path.join(args.save_dir, "task_config.json"), "w") as f:
        json.dump(task_cfg, f, indent=1)
    print(json.dumps({"saved": args.save_dir, "seed": seed,
                      "score": float(score)}))


def _load_preset(argv):
    """--preset <yaml>: flat keys become argparse defaults (downstream
    presets in configs/, parity with the reference's experiment configs)."""
    argv = list(argv)
    if "--preset" not in argv:
        return {}, argv
    i = argv.index("--preset")
    path = argv[i + 1]
    argv = argv[:i] + argv[i + 2:]
    import yaml

    with open(path) as f:
        flat = yaml.safe_load(f) or {}
    return {k.replace("-", "_"): v for k, v in flat.items()}, argv


def main(argv=None):
    import sys

    preset, argv = _load_preset(
        argv if argv is not None else sys.argv[1:]
    )
    p = argparse.ArgumentParser(prog="finetune")
    p.add_argument("--data-dir", required=True)
    # per-task presets (configs/downstream/{gb,nt}/<task>.yaml) carry the
    # task name; a bare --task still works without one
    p.add_argument("--task", required="task" not in preset)
    p.add_argument("--max-length", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seeds", type=int, nargs="+", default=[0])
    p.add_argument("--pretrained-run-dir", default=None,
                   help="pretraining run dir (model_config.json + checkpoints)")
    p.add_argument("--config-path", default=None)
    p.add_argument("--pooling", default="mean")
    p.add_argument("--conjoin-train", action="store_true")
    p.add_argument("--conjoin-test", action="store_true")
    p.add_argument("--rc-aug", action="store_true")
    p.add_argument("--metric", default="all")
    p.add_argument("--model", default="caduceus",
                   choices=["caduceus", "hyena", "cnn"],
                   help="cnn = from-scratch GenomicsBenchmarkCNN baseline "
                        "(`configs/experiment/hg38/genomic_benchmark_cnn.yaml`); "
                        "hyena = HyenaDNA-style backbone (`model: "
                        "dna_embedding`, `dna_embedding.py:27-96`) — "
                        "auto-selected when --pretrained-run-dir points at a "
                        "hyena pretrain run")
    p.add_argument("--d-model", type=int, default=128)
    p.add_argument("--n-layer", type=int, default=4)
    p.add_argument("--no-rcps", action="store_true")
    p.add_argument("--freeze-backbone", action="store_true")
    p.add_argument("--use-lengths", action="store_true",
                   help="length-masked pooling (reference SequenceDecoder "
                        "use_lengths/ragged modes)")
    p.add_argument("--layer-decay", type=float, default=None,
                   help="layer-wise lr decay factor (`train.py:496-541`)")
    p.add_argument("--encoder", default="id",
                   choices=["id", "embedding", "onehot"],
                   help="input encoder in place of the backbone embedding "
                        "(reference src/tasks/encoders.py registry)")
    p.add_argument("--problem-type", default="single_label_classification",
                   choices=["single_label_classification", "regression",
                            "multi_label_classification"])
    p.add_argument("--save-dir", default=None,
                   help="export the best seed's best-val model (params + "
                        "task_config.json) for deployment — servable via "
                        "`cli.py serve` /classify")
    p.set_defaults(**preset)
    args = p.parse_args(argv)

    import jax

    from caduceus_tpu.config import CaduceusConfig, SSMConfig
    from caduceus_tpu.data.classification import ClassificationDataModule
    from caduceus_tpu.tokenization import CharacterTokenizer

    tok = CharacterTokenizer()
    cfg_path = args.config_path or (
        os.path.join(args.pretrained_run_dir, "model_config.json")
        if args.pretrained_run_dir else None
    )
    raw_cfg = None
    if cfg_path and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw_cfg = json.load(f)
    model_kind = args.model
    hyena_run_lr = None
    if raw_cfg is not None and raw_cfg.get("model_type") == "hyena":
        if args.model == "cnn":
            p.error("--model cnn trains from scratch; it cannot take a "
                    "hyena pretrained run dir")
        model_kind = "hyena"  # the run dir decides the backbone family
        cfg = {k: v for k, v in raw_cfg.items()
               if k not in ("model_type", "objective", "lr")}
        hyena_run_lr = raw_cfg.get("lr", 6e-4)
    elif model_kind == "hyena":
        # from-scratch HyenaDNA-style backbone (no pretrain run)
        cfg = dict(d_model=args.d_model, n_layer=args.n_layer,
                   vocab_size=tok.vocab_size, l_max=args.max_length)
    elif raw_cfg is not None:
        cfg = CaduceusConfig.load(cfg_path)
        cfg.complement_map = tok.complement_map
    else:
        cfg = CaduceusConfig(
            d_model=args.d_model, n_layer=args.n_layer, vocab_size=tok.vocab_size,
            ssm_cfg=SSMConfig(), rcps=not args.no_rcps,
            complement_map=tok.complement_map,
        )
    if model_kind == "hyena" and args.encoder not in ("id", "stop", "identity"):
        p.error("--encoder is a caduceus-path feature (--model hyena embeds "
                "its own tokens)")

    if args.conjoin_train or args.conjoin_test:
        if args.model == "cnn":
            # the CNN baseline takes plain (B, L) ids only — fail fast
            # instead of crashing at the first conjoined eval batch after a
            # wasted training epoch
            p.error("--conjoin-train/--conjoin-test are not supported by "
                    "--model cnn (it takes plain (B, L) ids)")
        if model_kind == "caduceus" and cfg.rcps:
            # Reference semantics (`modeling_caduceus.py:562-592`): rcps and
            # conjoin are mutually exclusive backbone modes — conjoining is
            # the post-hoc (Caduceus-Ph) recipe for NON-rcps models. Fail
            # here with a clear message instead of a shape error after a
            # wasted epoch.
            p.error("--conjoin-train/--conjoin-test require a non-rcps model "
                    "(pass --no-rcps, or point at a non-rcps pretrained "
                    "config); an RCPS backbone is already RC-equivariant and "
                    "takes plain (B, L) inputs")

    pretrained_params = None
    if args.model == "cnn":
        assert not args.pretrained_run_dir, "CNN baseline trains from scratch"
    if args.pretrained_run_dir:
        from caduceus_tpu.models.caduceus import CaduceusForMaskedLM
        from caduceus_tpu.train.checkpoint import latest_step, restore_checkpoint
        from caduceus_tpu.train.optim import make_optimizer
        from caduceus_tpu.train.trainer import TrainState
        import jax.numpy as jnp

        ckpt_dir = os.path.join(args.pretrained_run_dir, "checkpoints")
        if latest_step(ckpt_dir) is not None:
            if model_kind == "hyena":
                # the hyena pretrain optimizer carries lr-override state
                # (filter lr groups, `train/optim.py` hyena_lr_overrides) —
                # the restore template's opt_state pytree must match it
                from caduceus_tpu.models.hyena import HyenaLMHeadModel
                from caduceus_tpu.train.optim import hyena_lr_overrides

                hy = dict(cfg)
                hy["attn_layer_idx"] = tuple(hy.get("attn_layer_idx", ()))
                lm = HyenaLMHeadModel(**hy)
                template_params = lm.init(
                    jax.random.PRNGKey(0), np.zeros((1, 8), np.int32)
                )
                tx, _ = make_optimizer(
                    lr=hyena_run_lr, params_example=template_params,
                    lr_overrides=hyena_lr_overrides(hyena_run_lr),
                )
            else:
                mlm = CaduceusForMaskedLM(cfg)
                template_params = mlm.init(
                    jax.random.PRNGKey(0), np.zeros((1, 8), np.int32)
                )
                tx, _ = make_optimizer()
            template = TrainState(template_params, tx.init(template_params),
                                  jnp.zeros((), jnp.int32))
            state, _ = restore_checkpoint(ckpt_dir, template)
            pretrained_params = state.params

    # resolve the task's headline metric for best-val selection
    # (NT per-task map, `configs/dataset/nucleotide_transformer.yaml`;
    # GenomicBenchmarks selects on accuracy, `README.md:182-184`)
    from caduceus_tpu.data.classification import (
        NT_TASK_METRICS,
        NUCLEOTIDE_TRANSFORMER_TASKS,
    )

    if args.problem_type != "single_label_classification":
        select = None
    elif args.metric != "all":
        select = args.metric
    elif args.task in NUCLEOTIDE_TRANSFORMER_TASKS:
        select = NT_TASK_METRICS.get(args.task, "mcc")
    else:
        select = "accuracy"

    key = ("test_mse" if args.problem_type == "regression"
           else f"test_{select or 'accuracy'}")
    lower_better = args.problem_type == "regression"
    results = []
    best_export = None  # (score, seed, (params, extra), num_classes, dm)
    for seed in args.seeds:
        # conjoin_train vs conjoin_test is a DATA-side distinction
        # (`genomic_bench_dataset.py:87,104-118`): the dataset decides when
        # strands arrive stacked; the model dispatches on input rank.
        dm = ClassificationDataModule(
            args.data_dir, args.task, max_length=args.max_length,
            batch_size=args.batch_size, rc_aug=args.rc_aug,
            conjoin_train=args.conjoin_train, conjoin_test=args.conjoin_test,
            train_val_split_seed=seed, seed=seed,
            regression=(args.problem_type == "regression"),
            multi_label=(args.problem_type == "multi_label_classification"),
        )
        r = finetune_one(
            cfg, dm, dm.num_classes, pretrained_params=pretrained_params,
            epochs=args.epochs, lr=args.lr, pooling=args.pooling,
            seed=seed, metric=args.metric, select_metric=select,
            problem_type=args.problem_type,
            freeze_backbone=args.freeze_backbone,
            use_lengths=args.use_lengths, layer_decay=args.layer_decay,
            encoder=args.encoder, model_kind=model_kind,
            return_state=bool(args.save_dir),
        )
        if args.save_dir:
            r, state = r
            # cross-seed selection by the VAL metric (test scores must not
            # drive which model ships — same leakage rule as per-seed
            # best-val checkpointing)
            sel = r["best_val"]
            if best_export is None or (
                    sel < best_export[0] if lower_better
                    else sel > best_export[0]):
                best_export = (sel, seed, state, dm.num_classes, dm)
        r["seed"] = seed
        results.append(r)
        print(json.dumps(r))

    if args.save_dir and best_export is not None:
        _export_finetuned(args, cfg, model_kind, select, best_export)
    summary = {
        "task": args.task,
        "seeds": args.seeds,
        f"mean_{key}": float(np.mean([r[key] for r in results])),
        f"std_{key}": float(np.std([r[key] for r in results])),
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
