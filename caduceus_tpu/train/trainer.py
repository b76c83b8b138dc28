"""pjit training runtime.

Replaces the reference's Lightning stack (`train.py:126-592` +
`create_trainer` `train.py:596-646`): one jitted train step over a
('data','model') mesh — forward, masked CE, grad, AdamW update, metrics —
with gradient accumulation via `lax.scan` over microbatches (the reference
uses PL `accumulate_grad_batches`, `configs/experiment/hg38/hg38.yaml:17`).

Data-parallel gradient averaging is implicit: batch arrays are sharded over
'data', parameters are replicated, so XLA inserts the psum during the
backward pass (the NCCL all-reduce of `train.py:629-639` disappears as
explicit code).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from caduceus_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, shard_batch
from caduceus_tpu.train.metrics import (
    NumTokens,
    Perplexity,
    accuracy,
    cross_entropy_loss,
    per_token_ppl,
)
from caduceus_tpu.train.optim import make_optimizer


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32
    ema_params: Any = None  # EMA weights when enabled (reference EMA-swap
    # validation, `train.py:438-453`)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step, s.ema_params), None),
    lambda _, c: TrainState(*c),
)


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    ignore_index: int = 4,
    accum_steps: int = 1,
    ema_decay: float = 0.0,
    dropout: bool = False,
    dropout_seed: int = 0,
):
    """Build the jitted train step.

    batch["input_ids"]/["targets"]: (accum*B, L) — reshaped to
    (accum, B, L) internally when accum_steps > 1.

    ``dropout=True`` threads a per-(step, microbatch) dropout rng and calls
    the model with ``train=True`` (for models with dropout layers, e.g.
    ``HyenaLMHeadModel`` — reference embed/resid dropout at
    `src/models/sequence/long_conv_lm.py:252-253`).
    """

    def loss_fn(params, input_ids, targets, rng, loss_weights=None):
        if dropout:
            logits = apply_fn(params, input_ids, train=True,
                              rngs={"dropout": rng})
        else:
            logits = apply_fn(params, input_ids)
        # loss_weights: GPN-style weighted CE (`modeling_caduceus.py:286-294`)
        # when the batch carries per-position weights
        loss, aux = cross_entropy_loss(logits, targets,
                                       ignore_index=ignore_index,
                                       loss_weights=loss_weights)
        correct = accuracy(logits, targets, ignore_index=ignore_index)
        aux["acc"] = correct
        return loss, aux

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]) -> tuple:
        ids, tgt = batch["input_ids"], batch["targets"]
        lw = batch.get("loss_weights")
        step_rng = jax.random.fold_in(jax.random.PRNGKey(dropout_seed),
                                      state.step)
        if accum_steps > 1:
            nb = ids.shape[0] // accum_steps
            ids = ids.reshape(accum_steps, nb, *ids.shape[1:])
            tgt = tgt.reshape(accum_steps, nb, *tgt.shape[1:])
            if lw is not None:
                lw = lw.reshape(accum_steps, nb, *lw.shape[1:])

            def micro(carry, xt):
                g_acc, l_acc, a_acc = carry
                rng = jax.random.fold_in(step_rng, xt[2])
                (l, aux), g = grad_fn(state.params, xt[0], xt[1], rng,
                                      xt[3] if lw is not None else None)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (g_acc, l_acc + l, a_acc + aux["acc"]), aux

            xs = (ids, tgt, jnp.arange(accum_steps))
            xs = xs + (lw,) if lw is not None else xs + (jnp.zeros(accum_steps),)
            zero = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (g, loss, acc), auxes = jax.lax.scan(micro, (zero, 0.0, 0.0), xs)
            g = jax.tree_util.tree_map(lambda t: t / accum_steps, g)
            loss = loss / accum_steps
            acc = acc / accum_steps
            aux = {
                "loss_sum": auxes["loss_sum"].sum(),
                "count": auxes["count"].sum(),
                "acc": acc,
            }
        else:
            (loss, aux), g = grad_fn(state.params, ids, tgt, step_rng, lw)

        updates, new_opt = tx.update(g, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(g)
        new_ema = state.ema_params
        if ema_decay > 0.0:
            new_ema = jax.tree_util.tree_map(
                lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                state.ema_params, new_params,
            )
        new_state = TrainState(new_params, new_opt, state.step + 1, new_ema)
        metrics = {
            "loss": loss,
            "acc": aux["acc"],
            "loss_sum": aux["loss_sum"],
            "count": aux["count"],
            "grad_norm": gnorm,
        }
        return new_state, metrics

    return train_step


def make_eval_step(apply_fn: Callable, ignore_index: int = 4,
                   last_k: int = 0, per_token: bool = False):
    """Eval step with the reference HG38Task metric family
    (`src/tasks/tasks.py:244-332`): streaming ppl + optional last-k-ppl and
    per-position NLL sums; honors batch["loss_weights"] (GPN weighted CE)."""

    def eval_step(params, batch):
        logits = apply_fn(params, batch["input_ids"])
        tgt = batch["targets"]
        loss, aux = cross_entropy_loss(
            logits, tgt, ignore_index=ignore_index,
            loss_weights=batch.get("loss_weights"),
        )
        aux["acc"] = accuracy(logits, tgt, ignore_index=ignore_index)
        aux["loss"] = loss
        if last_k > 0:
            _, lk = cross_entropy_loss(
                logits[..., -last_k:, :], tgt[..., -last_k:],
                ignore_index=ignore_index,
            )
            aux["last_k_loss_sum"] = lk["loss_sum"]
            aux["last_k_count"] = lk["count"]
        if per_token:
            nll, mask = per_token_ppl(logits, tgt, ignore_index=ignore_index)
            # per-position sums over the batch; host streams across batches
            aux["pos_nll_sum"] = nll.reshape(-1, nll.shape[-1]).sum(0)
            aux["pos_count"] = mask.reshape(-1, mask.shape[-1]).sum(0)
        return aux

    return eval_step


def prefetch_to_device(loader, mesh, size: int = 2, cp: bool = False):
    """Background-thread prefetch: host batch prep + device_put of batch N+1
    overlap step N's device execution (TODO r1: input-pipeline overlap).

    Yields (sharded_batch, loader_state_after_batch). Carrying the loader
    state with each batch keeps the exactly-once resume contract: a
    checkpoint written after consuming batch N records the state for N+1
    even though the loader has already produced N+size.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, size))
    stop = object()
    done = threading.Event()  # consumer gone — worker must release the loader
    err = []

    def _put(item) -> bool:
        """Blocking put that bails out once the consumer is gone."""
        while not done.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for b in loader:
                st = loader.state_dict() if hasattr(loader, "state_dict") else None
                if not _put((shard_batch(mesh, b, cp=cp), st)):
                    return  # consumer closed mid-epoch: stop iterating loader
        except BaseException as e:  # noqa: BLE001 — reraised on the consumer
            err.append(e)
        finally:
            _put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is stop:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        # Runs on generator .close() (and normal exit): without this, a
        # consumer breaking early (fit() hitting max_steps mid-epoch) leaks
        # a worker still iterating the shared sampler — a second fit() would
        # then interleave index consumption with the zombie.
        done.set()
        t.join(timeout=5.0)


@dataclass
class TrainerConfig:
    max_steps: int = 10_000
    log_every: int = 50
    eval_every: int = 1_000
    eval_batches: int = 16
    # HG38Task metric family (`src/tasks/tasks.py:244-332`)
    eval_last_k: int = 0      # 0 = off; else ppl over the last k positions
    eval_per_token: bool = False  # dump per-position ppl curve to run_dir
    checkpoint_every: int = 500
    accum_steps: int = 1
    prefetch: int = 2  # device-prefetch queue depth (0 disables)
    ema_decay: float = 0.0  # 0 disables EMA tracking
    dropout: bool = False  # thread dropout rngs (models with dropout layers)
    profile_dir: Optional[str] = None  # jax.profiler trace capture
    run_dir: str = "./outputs/run"
    seed: int = 2222
    # optimizer
    lr: float = 8e-3
    weight_decay: float = 0.1
    betas: tuple = (0.9, 0.95)
    warmup_frac: float = 0.1
    lr_min: float = 1e-4
    warmup_lr_init: float = 1e-6
    gradient_clip: float = 1.0


class Trainer:
    """Minimal step-based training loop with streaming metrics, periodic
    eval, and Orbax checkpointing incl. data-iterator state (the reference's
    fault-tolerant resume contract, SURVEY.md §5.3/§5.4)."""

    def __init__(
        self,
        model,
        cfg: TrainerConfig,
        train_loader,
        eval_loader=None,
        mesh: Optional[Mesh] = None,
        ignore_index: int = 4,
        log_fn: Optional[Callable[[Dict], None]] = None,
        lr_overrides=None,
        tensor_parallel: bool = False,
        context_parallel: bool = False,
    ):
        self.model = model
        self.cfg = cfg
        self.train_loader = train_loader
        self.eval_loader = eval_loader
        self.mesh = mesh or make_mesh()
        self.ignore_index = ignore_index
        self.log_fn = log_fn or (lambda m: print(json.dumps(m)))
        self.ppl = Perplexity()
        self.num_tokens = NumTokens()
        # multi-chip strategies beyond DP (reference analog: auto-DDP at
        # `train.py:629-639`; CP/TP are beyond-reference). tensor_parallel
        # shards params with the Megatron specs (`parallel/sharding.py`) and
        # context_parallel L-shards batches over the 'model' axis — both
        # require the model config's {tensor,context}_parallel_axis to be
        # set to "model", which routes the scans through the shard_map
        # paths; that needs the mesh registered globally.
        self.tensor_parallel = tensor_parallel
        self.context_parallel = context_parallel
        if tensor_parallel or context_parallel:
            from caduceus_tpu.parallel.mesh import set_global_mesh

            assert self.mesh.shape["model"] > 1, (
                "tensor/context parallelism needs a mesh with model>1 "
                "(pass mesh=make_mesh(model=N))"
            )
            set_global_mesh(self.mesh)

        warmup_t = int(cfg.warmup_frac * cfg.max_steps)
        self.tx, self.schedule = make_optimizer(
            lr=cfg.lr,
            weight_decay=cfg.weight_decay,
            betas=cfg.betas,
            warmup_t=warmup_t,
            t_initial=cfg.max_steps - warmup_t,
            lr_min=cfg.lr_min,
            warmup_lr_init=cfg.warmup_lr_init,
            gradient_clip=cfg.gradient_clip,
        )
        # per-param lr groups (e.g. hyena_lr_overrides) need a params
        # example; the optimizer is rebuilt with them in init_state
        self._lr_overrides = lr_overrides
        self._train_step = None
        self._eval_step = None
        self.state: Optional[TrainState] = None

    # -- setup -------------------------------------------------------------
    def init_state(self, example_batch) -> TrainState:
        rng = jax.random.PRNGKey(self.cfg.seed)
        ids = jnp.asarray(example_batch["input_ids"][:1])
        if self.context_parallel:
            # init on a shard-divisible slice with only the SEQUENCE axis
            # sharded (the CP shard_map paths need L % model == 0 even at
            # init; the batch-1 example can't take the 'data' spec)
            from jax.sharding import NamedSharding, PartitionSpec

            n_model = self.mesh.shape["model"]
            L = ids.shape[1] - ids.shape[1] % n_model
            ids = jax.device_put(
                ids[:, :L],
                NamedSharding(self.mesh, PartitionSpec(None, "model")))
        params = self.model.init(rng, ids)
        if self._lr_overrides is not None:
            # rebuild with the per-param groups now that params exist
            warmup_t = int(self.cfg.warmup_frac * self.cfg.max_steps)
            self.tx, self.schedule = make_optimizer(
                lr=self.cfg.lr, weight_decay=self.cfg.weight_decay,
                betas=self.cfg.betas, warmup_t=warmup_t,
                t_initial=self.cfg.max_steps - warmup_t,
                lr_min=self.cfg.lr_min,
                warmup_lr_init=self.cfg.warmup_lr_init,
                gradient_clip=self.cfg.gradient_clip,
                params_example=params, lr_overrides=self._lr_overrides,
            )
        if self.tensor_parallel:
            # Megatron specs: shard in/out projections + inner-SSM params
            # over 'model'; the optimizer state inherits the layout
            from caduceus_tpu.parallel.sharding import shard_params

            params = shard_params(self.mesh, params)
            opt_state = self.tx.init(params)
        else:
            opt_state = self.tx.init(params)
            if self.mesh.devices.size > 1:
                rep = replicated(self.mesh)
                params, opt_state = jax.device_put((params, opt_state), rep)
        # (on a 1-device mesh the state stays uncommitted — a NamedSharding
        # commitment makes every later dispatch through the axon tunnel
        # ~6 s slower; see parallel/mesh.py shard_batch note)
        ema = (
            jax.tree_util.tree_map(jnp.copy, params)
            if self.cfg.ema_decay > 0 else None
        )
        self.state = TrainState(params, opt_state, jnp.zeros((), jnp.int32), ema)
        return self.state

    def _compile(self):
        apply_fn = self.model.apply
        step_fn = make_train_step(
            apply_fn, self.tx, self.ignore_index, self.cfg.accum_steps,
            ema_decay=self.cfg.ema_decay,
            dropout=self.cfg.dropout, dropout_seed=self.cfg.seed,
        )
        self._train_step = jax.jit(step_fn, donate_argnums=0)
        self._eval_step = jax.jit(make_eval_step(
            apply_fn, self.ignore_index,
            last_k=self.cfg.eval_last_k, per_token=self.cfg.eval_per_token,
        ))

    # -- loop --------------------------------------------------------------
    def fit(self, max_steps: Optional[int] = None) -> Dict[str, float]:
        max_steps = max_steps or self.cfg.max_steps
        if self._train_step is None:
            self._compile()
        os.makedirs(self.cfg.run_dir, exist_ok=True)

        step = int(jax.device_get(self.state.step))
        last_metrics: Dict[str, float] = {}
        last_m = None
        t0 = time.time()
        tokens_since_log = 0
        while step < max_steps:
            if self.cfg.prefetch > 0:
                stream = prefetch_to_device(self.train_loader, self.mesh,
                                            self.cfg.prefetch,
                                            cp=self.context_parallel)
            else:
                def _sync_stream():
                    for b in self.train_loader:
                        st = (self.train_loader.state_dict()
                              if hasattr(self.train_loader, "state_dict")
                              else None)
                        yield shard_batch(self.mesh, b,
                                          cp=self.context_parallel), st

                stream = _sync_stream()
            # `for` does not close a generator on break — close explicitly so
            # the prefetch worker (and its hold on the shared sampler) ends
            # deterministically when max_steps lands mid-epoch.
            try:
                for batch, loader_state in stream:
                    if self.cfg.profile_dir and step == 10:
                        jax.profiler.start_trace(self.cfg.profile_dir)
                    self.state, m = self._train_step(self.state, batch)
                    self._consumed_loader_state = loader_state
                    last_m = m
                    step += 1
                    if self.cfg.profile_dir and step == 13:
                        jax.block_until_ready(m["loss"])
                        jax.profiler.stop_trace()
                    tokens_since_log += int(np.prod(batch["input_ids"].shape))
                    if step % self.cfg.log_every == 0:
                        m = jax.device_get(m)
                        self.ppl.update(m["loss_sum"], m["count"])
                        self.num_tokens.update(m["count"])
                        dt = time.time() - t0
                        last_metrics = {
                            "step": step,
                            "loss": float(m["loss"]),
                            "acc": float(m["acc"]),
                            "ppl": self.ppl.compute(),
                            "grad_norm": float(m["grad_norm"]),
                            "lr": float(self.schedule(step)),
                            "tokens_per_sec": tokens_since_log / dt,
                        }
                        self.log_fn(last_metrics)
                        t0 = time.time()
                        tokens_since_log = 0
                    if self.eval_loader is not None and step % self.cfg.eval_every == 0:
                        last_metrics.update(self.evaluate())
                    if step % self.cfg.checkpoint_every == 0:
                        self.save_checkpoint()
                    if step >= max_steps:
                        break
            finally:
                stream.close()
                if self.cfg.profile_dir and 10 < step < 13:
                    # run ended inside the trace window — close the trace
                    jax.profiler.stop_trace()
        if not last_metrics and last_m is not None:
            m = jax.device_get(last_m)
            last_metrics = {
                "step": step,
                "loss": float(m["loss"]),
                "acc": float(m["acc"]),
                "grad_norm": float(m["grad_norm"]),
            }
            self.log_fn(last_metrics)
        return last_metrics

    def evaluate(self, max_batches: Optional[int] = None,
                 prefix: str = "val") -> Dict[str, float]:
        if self._eval_step is None:
            self._compile()
        max_batches = max_batches or self.cfg.eval_batches

        def run(params, tag):
            ppl = Perplexity()
            lk = Perplexity()
            acc_w = cnt_w = 0.0
            pos_nll = pos_cnt = None
            n_batches = 0
            # score a FIXED val prefix on every call: the eval loader's
            # sampler is stateful (the exactly-once resume contract), so
            # without a reset consecutive evals consume a rolling window of
            # the split — different batches per eval point, and an empty
            # run ({}) whenever a call lands exactly on the epoch boundary
            # (observed as missing val/ or val/ema records in the r5 arm
            # runs). Resetting makes every eval — plain and EMA, every
            # step, every run — score identical batches.
            sampler = getattr(self.eval_loader, "sampler", None)
            if sampler is not None and hasattr(sampler, "load_state_dict"):
                sampler.load_state_dict({"epoch": 0, "counter": 0})
            for i, batch in enumerate(self.eval_loader):
                if i >= max_batches:
                    break
                batch = shard_batch(self.mesh, batch,
                                    cp=self.context_parallel)
                m = jax.device_get(self._eval_step(params, batch))
                ppl.update(m["loss_sum"], m["count"])
                # token-weighted means (ragged final batches would bias
                # per-batch averaging)
                acc_w += float(m["acc"]) * float(m["count"])
                cnt_w += float(m["count"])
                if "last_k_loss_sum" in m:
                    lk.update(m["last_k_loss_sum"], m["last_k_count"])
                if "pos_nll_sum" in m:
                    pos_nll = m["pos_nll_sum"] + (0 if pos_nll is None else pos_nll)
                    pos_cnt = m["pos_count"] + (0 if pos_cnt is None else pos_cnt)
                n_batches += 1
            if n_batches == 0:
                return {}
            out = {
                f"{tag}/loss": float(np.log(max(ppl.compute(), 1e-30))),
                f"{tag}/acc": acc_w / max(cnt_w, 1.0),
                f"{tag}/ppl": ppl.compute(),
            }
            if self.cfg.eval_last_k > 0:
                out[f"{tag}/last_{self.cfg.eval_last_k}_ppl"] = lk.compute()
            if pos_nll is not None:
                curve = np.exp(pos_nll / np.maximum(pos_cnt, 1))
                path = os.path.join(
                    self.cfg.run_dir, f"per_token_ppl_{tag.replace('/', '_')}.npy"
                )
                np.save(path, curve)
                out[f"{tag}/per_token_ppl_file"] = path
            return out

        out = run(self.state.params, prefix)
        # EMA-swapped validation (reference `train.py:438-453`): duplicate
        # metrics under a `/ema` suffix.
        if self.state.ema_params is not None:
            out.update(run(self.state.ema_params, f"{prefix}/ema"))
        if out:
            self.log_fn(out)
        return out

    # -- checkpoint --------------------------------------------------------
    def save_checkpoint(self, path: Optional[str] = None) -> str:
        from caduceus_tpu.train.checkpoint import save_checkpoint

        path = path or os.path.join(self.cfg.run_dir, "checkpoints")
        # prefer the state captured at consumption time (prefetching means
        # the loader itself has already advanced past the queued batches)
        loader_state = getattr(self, "_consumed_loader_state", None)
        if loader_state is None and hasattr(self.train_loader, "state_dict"):
            loader_state = self.train_loader.state_dict()
        return save_checkpoint(path, self.state, loader_state)

    def restore_checkpoint(self, path: Optional[str] = None) -> bool:
        from caduceus_tpu.train.checkpoint import latest_step, restore_checkpoint

        path = path or os.path.join(self.cfg.run_dir, "checkpoints")
        if latest_step(path) is None:
            return False
        self.state, loader_state = restore_checkpoint(path, self.state)
        if loader_state is not None and hasattr(self.train_loader, "load_state_dict"):
            self.train_loader.load_state_dict(loader_state)
        return True
