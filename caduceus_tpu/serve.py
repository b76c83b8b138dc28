"""Batch inference server for deployed checkpoints.

TPU-first serving for the three deployment workloads the reference leaves
to ad-hoc scripts (embedding dumps `vep_embeddings.py`, MLM scoring,
generation via `long_conv_lm.py:391-493`):

  POST /embed    {"sequences": [...]}                  -> pooled embeddings
  POST /logits   {"sequences": [...]}                  -> per-position logits
  POST /generate {"prompt": "...", "max_new_tokens": N} -> continuation
  GET  /healthz                                        -> liveness + stats

Design, shaped by the XLA compilation model rather than a GPU server:

- **Length buckets, not dynamic shapes.** Each request is padded to the
  next power-of-two bucket (≤ max_length), so the server compiles one
  program per (endpoint, bucket, batch) signature and every later request
  hits the jit cache. First-hit compiles are the only slow requests;
  buckets can be pre-warmed at startup (``warmup=True``).
- **One device owner, micro-batching.** A single worker thread owns the
  TPU (XLA is single-controller); concurrent HTTP requests enqueue and the
  worker coalesces same-endpoint/same-bucket requests into one padded
  device dispatch (up to ``max_batch``, with a short linger window).
- **Pad-masked pooling.** /embed mean-pools only real positions; RCPS
  hidden states collapse to the strand-mean exactly as the VEP pipeline
  does (`vep.py dump_embeddings`, reference `vep_embeddings.py:369-372`).
  Note the pads DO participate in the bidirectional scan itself (as they
  do in training data, where N bases map to PAD), so per-position values
  can differ slightly across bucket sizes; deployments needing
  bit-stable embeddings for variable-length inputs should pin one bucket
  (``min_bucket == max_length``).
- **/generate** runs prompts through the parallel prefill at their exact
  length (no bucketing — a causal prompt cannot be padded without
  changing its state), so each distinct prompt length compiles once.

Serving is intentionally dependency-free (stdlib ``http.server``); for a
production fleet put a real LB in front of N single-chip server processes.
"""

from __future__ import annotations

import json
import os
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np


def _next_bucket(n: int, min_bucket: int, max_len: int) -> int:
    b = min_bucket
    while b < n:
        b *= 2
    return min(b, max_len)


@dataclass
class _Request:
    kind: str                 # "embed" | "logits" | "generate"
    payload: Any
    bucket: int
    event: threading.Event = field(default_factory=threading.Event)
    result: Any = None
    error: Optional[str] = None

    def finish(self, result=None, error=None):
        self.result, self.error = result, error
        self.event.set()


class InferenceService:
    """Checkpoint-backed inference with length-bucketed jit caching."""

    def __init__(self, cfg, params, max_batch: int = 8,
                 min_bucket: int = 128, max_length: int = 131072,
                 linger_ms: float = 5.0, task_cfg: Optional[dict] = None,
                 classifier_model=None):
        from caduceus_tpu.tokenization import (
            CaduceusTokenizer, CharacterTokenizer)

        self.cfg = cfg
        self.params = params
        self.task_cfg = task_cfg
        self.classifier = classifier_model
        if task_cfg is not None:
            # encode EXACTLY like downstream eval: CharacterTokenizer with
            # the task's padding side, fixed max_length (no bucketing)
            self.tok = CharacterTokenizer(
                model_max_length=max_length,
                padding_side=task_cfg.get("padding_side", "left"))
        else:
            self.tok = CaduceusTokenizer(model_max_length=max_length)
        self.max_batch = max_batch
        self.min_bucket = min_bucket
        self.max_length = max_length
        self.linger_s = linger_ms / 1e3
        self._fns: Dict[tuple, Any] = {}
        self._lock = threading.Lock()
        self.n_served = 0
        self.n_dispatches = 0

    @classmethod
    def from_run_dir(cls, run_dir: str, **kw) -> "InferenceService":
        """Load a servable model dir.

        - a pretrain run dir (model_config.json + checkpoints) serves
          /embed, /logits, /generate — the `cli.py generate` restore path;
        - a `finetune --save-dir` export (task_config.json + params/)
          serves /classify.
        """
        task_path = os.path.join(run_dir, "task_config.json")
        if os.path.exists(task_path):
            return cls._from_finetuned(run_dir, task_path, **kw)
        from caduceus_tpu.config import CaduceusConfig
        from caduceus_tpu.train.checkpoint import load_run_params

        cfg = CaduceusConfig.load(os.path.join(run_dir, "model_config.json"))
        # params-only restore: no TrainState template, so runs trained
        # with ANY optimizer/EMA configuration serve directly (EMA
        # weights preferred when present — the eval-swap protocol)
        params, _ = load_run_params(run_dir)
        return cls(cfg, params, **kw)

    @classmethod
    def _from_finetuned(cls, run_dir: str, task_path: str,
                        **kw) -> "InferenceService":
        from caduceus_tpu.config import CaduceusConfig
        from caduceus_tpu.finetune import _make_classifier
        from caduceus_tpu.train.checkpoint import load_params

        with open(task_path) as f:
            tc = json.load(f)
        if tc["model_kind"] == "caduceus":
            cfg = CaduceusConfig(**tc["model_cfg"])
        else:  # hyena kwargs dict, or None for the from-scratch CNN
            cfg = tc["model_cfg"]
            if isinstance(cfg, dict):
                cfg["attn_layer_idx"] = tuple(cfg.get("attn_layer_idx", ()))
        model = _make_classifier(
            cfg, tc["num_classes"], tc["pooling"], tc["use_lengths"],
            tc.get("padding_side", "left"), encoder=tc.get("encoder", "id"),
            model_kind=tc["model_kind"])
        variables = load_params(os.path.join(run_dir, "params"))
        kw.setdefault("max_length", tc["max_length"])
        return cls(cfg, variables, task_cfg=tc, classifier_model=model,
                   **kw)

    # --- jitted programs (one per (endpoint, bucket) signature) ---

    def _embed_fn(self):
        import jax
        import jax.numpy as jnp

        from caduceus_tpu.models.caduceus import (
            Caduceus, collapse_strand_mean)

        model = Caduceus(self.cfg)
        rcps = self.cfg.rcps

        @jax.jit
        def f(params, ids, mask):
            h = model.apply(params, ids)         # (B, L, 2d) if rcps
            if rcps:
                h = collapse_strand_mean(h)      # VEP-pipeline convention
            m = mask[..., None].astype(h.dtype)
            return (h * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)

        return f

    def _logits_fn(self):
        import jax

        from caduceus_tpu.models.caduceus import CaduceusForMaskedLM

        model = CaduceusForMaskedLM(self.cfg)

        @jax.jit
        def f(params, ids):
            return model.apply(params, ids)

        return f

    def _classify_fn(self):
        import jax

        model = self.classifier

        @jax.jit
        def f(variables, ids, lengths):
            return model.apply(variables, ids, lengths)

        return f

    def _get_fn(self, kind: str):
        with self._lock:
            if kind not in self._fns:
                self._fns[kind] = (
                    self._embed_fn() if kind == "embed"
                    else self._classify_fn() if kind == "classify"
                    else self._logits_fn())
            return self._fns[kind]

    def warmup(self, buckets=None, batch_sizes=None) -> int:
        """Pre-compile the (endpoint, bucket, batch) programs so no live
        request pays a TPU compile. Defaults: every power-of-two bucket in
        [min_bucket, max_length] × every power-of-two batch size up to
        ``max_batch`` (dispatches pad the batch dim to a power of two, so
        these are exactly the live signatures). Returns the number of
        programs built."""
        if batch_sizes is None:
            batch_sizes, b = [], 1
            while b < self.max_batch:
                batch_sizes.append(b)
                b *= 2
            batch_sizes.append(self.max_batch)  # the pow2 cap signature
        if self.task_cfg is not None:
            L = self.task_cfg["max_length"]
            n = 0
            for bs in batch_sizes:
                shape = ((bs, L, 2) if self.task_cfg.get("conjoin")
                         else (bs, L))
                ids = np.full(shape, self.tok.pad_token_id, np.int32)
                self._get_fn("classify")(
                    self.params, ids, np.ones((bs,), np.int32))
                n += 1
            return n
        if buckets is None:
            buckets, b = [], self.min_bucket
            while b <= self.max_length:
                buckets.append(b)
                b *= 2
        n = 0
        for bucket in buckets:
            for bs in batch_sizes:
                ids = np.full((bs, bucket), self.tok.pad_token_id, np.int32)
                mask = np.ones((bs, bucket), bool)
                self._get_fn("embed")(self.params, ids, mask)
                self._get_fn("logits")(self.params, ids)
                n += 2
        return n

    # --- request execution (worker thread) ---

    def _run_batch(self, kind: str, batch: List[_Request]):
        import jax

        try:
            if kind == "classify":
                return self._run_classify(batch)
            bucket = batch[0].bucket
            # pad the batch dim to the next power of two so the server
            # compiles one program per (endpoint, bucket, pow2-batch)
            # signature — a live 3-request coalesce must never trigger a
            # fresh full-model compile
            bs = _next_bucket(len(batch), 1, self.max_batch)
            ids = np.full((bs, bucket), self.tok.pad_token_id, np.int32)
            lens = []
            for i, r in enumerate(batch):
                seq = r.payload
                ids[i, :len(seq)] = seq
                lens.append(len(seq))
            lens += [0] * (bs - len(batch))
            if kind == "embed":
                mask = (np.arange(bucket)[None, :]
                        < np.asarray(lens)[:, None])
                out = np.asarray(jax.device_get(
                    self._get_fn(kind)(self.params, ids, mask)), np.float32)
                for i, r in enumerate(batch):
                    r.finish(result=out[i])
            else:  # logits
                out = np.asarray(jax.device_get(
                    self._get_fn(kind)(self.params, ids)), np.float32)
                for i, r in enumerate(batch):
                    r.finish(result=out[i, :lens[i]])
            self.n_dispatches += 1
            self.n_served += len(batch)
        except Exception as e:  # surface to every waiter in the batch
            for r in batch:
                r.finish(error=f"{type(e).__name__}: {e}")

    def _run_classify(self, batch: List[_Request]):
        """Fixed-length classify dispatch: payload is the raw sequence
        string; encoding matches `data/classification.py` exactly
        (padding side, add_eos, conjoined rc strand)."""
        import jax

        from caduceus_tpu.tokenization import string_reverse_complement

        tc = self.task_cfg
        L = tc["max_length"]
        xs, lens = [], []
        for r in batch:
            seq = r.payload
            ids = self.tok.encode_padded(seq, L, add_sep=tc["add_eos"])
            if tc.get("conjoin"):
                rc = self.tok.encode_padded(
                    string_reverse_complement(seq), L,
                    add_sep=tc["add_eos"])
                ids = np.stack([ids, rc], axis=-1)
            xs.append(ids)
            lens.append(min(len(seq) + int(tc["add_eos"]), L))
        # pad the batch dim to a power of two (one program per signature)
        bs = _next_bucket(len(batch), 1, self.max_batch)
        while len(xs) < bs:
            xs.append(np.full_like(xs[0], self.tok.pad_token_id))
            lens.append(1)
        scores = np.asarray(jax.device_get(self._get_fn("classify")(
            self.params, np.stack(xs).astype(np.int32),
            np.asarray(lens, np.int32))), np.float32)
        pt = tc["problem_type"]
        for i, r in enumerate(batch):
            s = scores[i]
            if pt == "regression":
                r.finish(result={"prediction": float(s[0])})
            elif pt == "multi_label_classification":
                p = 1.0 / (1.0 + np.exp(-s))
                r.finish(result={"probs": p.tolist(),
                                 "labels": np.nonzero(s > 0)[0].tolist()})
            else:
                e = np.exp(s - s.max())
                p = e / e.sum()
                r.finish(result={"label": int(np.argmax(s)),
                                 "probs": p.tolist()})
        self.n_dispatches += 1
        self.n_served += len(batch)

    def _run_generate(self, r: _Request):
        import jax
        import jax.numpy as jnp

        from caduceus_tpu.inference import generate

        try:
            p = r.payload
            prompt_ids = jnp.asarray(p["ids"], jnp.int32)[None]
            out = generate(
                self.params, self.cfg, prompt_ids, p["max_new_tokens"],
                rng=jax.random.PRNGKey(p.get("seed", 0)),
                temperature=p.get("temperature", 0.0),
                top_k=p.get("top_k"),
            )
            new = np.asarray(out[0, prompt_ids.shape[1]:])
            self.n_dispatches += 1
            self.n_served += 1
            r.finish(result=self.tok.decode(new))
        except Exception as e:
            r.finish(error=f"{type(e).__name__}: {e}")


class InferenceServer:
    """HTTP front + batching worker around an `InferenceService`."""

    def __init__(self, service: InferenceService, host: str = "127.0.0.1",
                 port: int = 8000):
        self.service = service
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._drain, daemon=True)
        handler = _make_handler(self)
        self.httpd = ThreadingHTTPServer((host, port), handler)
        self.port = self.httpd.server_address[1]

    # --- batching worker: coalesce same-kind/same-bucket requests ---

    def _drain(self):
        svc = self.service
        pending: List[_Request] = []  # requests seen but not yet dispatched
        while not self._stop.is_set():
            if not pending:
                try:
                    pending.append(self.queue.get(timeout=0.1))
                except queue.Empty:
                    continue
            first = pending.pop(0)
            if first.kind == "generate":
                svc._run_generate(first)
                continue
            batch = [first]
            deadline = time.monotonic() + svc.linger_s
            # coalesce: same (kind, bucket) joins the dispatch; anything
            # else waits its turn in `pending` (still FIFO per signature)
            while len(batch) < svc.max_batch:
                nxt = None
                for i, r in enumerate(pending):
                    if r.kind == first.kind and r.bucket == first.bucket:
                        nxt = pending.pop(i)
                        break
                if nxt is None:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    try:
                        cand = self.queue.get(timeout=remaining)
                    except queue.Empty:
                        break
                    if (cand.kind == first.kind
                            and cand.bucket == first.bucket):
                        nxt = cand
                    else:
                        pending.append(cand)
                        continue
                batch.append(nxt)
            svc._run_batch(first.kind, batch)

    def submit_many(self, kind: str, payloads_buckets,
                    timeout: float = 600.0):
        """Enqueue several requests at once (so one HTTP request's
        sequences can share a device dispatch), then wait for all."""
        reqs = [_Request(kind, p, b) for p, b in payloads_buckets]
        for r in reqs:
            self.queue.put(r)
        out = []
        for r in reqs:
            if not r.event.wait(timeout):
                raise TimeoutError(f"{kind} request timed out")
            if r.error:
                raise RuntimeError(r.error)
            out.append(r.result)
        return out

    def submit(self, kind: str, payload, bucket: int,
               timeout: float = 600.0):
        return self.submit_many(kind, [(payload, bucket)], timeout)[0]

    def start(self):
        self._worker.start()
        self._http_thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True)
        self._http_thread.start()
        return self

    def stop(self):
        self._stop.set()
        self.httpd.shutdown()
        self.httpd.server_close()

    def serve_forever(self):
        self._worker.start()
        self.httpd.serve_forever()


def _make_handler(server: InferenceServer):
    svc = server.service

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            if os.environ.get("CADUCEUS_SERVE_VERBOSE") == "1":
                super().log_message(fmt, *args)

        def _reply(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                if svc.task_cfg is not None:
                    info = {"task": svc.task_cfg["task"],
                            "num_classes": svc.task_cfg["num_classes"],
                            "model_kind": svc.task_cfg["model_kind"]}
                else:
                    info = {"d_model": svc.cfg.d_model,
                            "n_layer": svc.cfg.n_layer,
                            "rcps": svc.cfg.rcps}
                self._reply(200, {
                    "status": "ok",
                    "served": svc.n_served,
                    "dispatches": svc.n_dispatches,
                    "model": info,
                })
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
            except Exception as e:
                return self._reply(400, {"error": f"bad json: {e}"})
            try:
                if self.path == "/classify":
                    if svc.task_cfg is None:
                        return self._reply(
                            400, {"error": "/classify needs a finetuned "
                                  "model dir (finetune --save-dir)"})
                    seqs = req.get("sequences")
                    if not isinstance(seqs, list) or not seqs:
                        return self._reply(
                            400, {"error": "'sequences' must be a "
                                  "non-empty list of strings"})
                    L = svc.task_cfg["max_length"]
                    outs = server.submit_many(
                        "classify", [(s, L) for s in seqs])
                    return self._reply(200, {"classify": outs})
                if self.path in ("/embed", "/logits"):
                    if svc.task_cfg is not None:
                        return self._reply(
                            400, {"error": f"{self.path} needs a pretrain "
                                  "run dir; this server hosts the "
                                  f"'{svc.task_cfg['task']}' classifier "
                                  "(/classify)"})
                    seqs = req.get("sequences")
                    if not isinstance(seqs, list) or not seqs:
                        return self._reply(
                            400, {"error": "'sequences' must be a "
                                  "non-empty list of strings"})
                    kind = self.path[1:]
                    items = []
                    for s in seqs:
                        ids = svc.tok.encode(s)
                        if len(ids) > svc.max_length:
                            return self._reply(
                                400, {"error": f"sequence length {len(ids)}"
                                      f" > max_length {svc.max_length}"})
                        items.append((ids, _next_bucket(
                            len(ids), svc.min_bucket, svc.max_length)))
                    outs = server.submit_many(kind, items)
                    return self._reply(
                        200, {kind: [o.tolist() for o in outs]})
                if self.path == "/generate":
                    if svc.task_cfg is not None:
                        return self._reply(
                            400, {"error": "/generate needs a pretrain run "
                                  "dir (causal LM)"})
                    prompt = req.get("prompt", "")
                    ids = svc.tok.encode(prompt)
                    if len(ids) > svc.max_length:
                        return self._reply(
                            400, {"error": f"prompt length {len(ids)} > "
                                  f"max_length {svc.max_length}"})
                    out = server.submit("generate", {
                        "ids": ids,
                        "max_new_tokens": int(req.get("max_new_tokens", 64)),
                        "temperature": float(req.get("temperature", 0.0)),
                        "top_k": req.get("top_k"),
                        "seed": int(req.get("seed", 0)),
                    }, bucket=0)
                    return self._reply(
                        200, {"prompt": prompt, "generated": out})
                return self._reply(404, {"error": "not found"})
            except Exception as e:
                return self._reply(500, {"error": str(e)})

    return Handler
