"""Inference server (`serve.py`): HTTP endpoints, bucketing, batching.

Runs the real ThreadingHTTPServer + batching worker on a loopback port with
tiny models; responses must match direct model.apply calls (the server only
adds padding, which must not leak into results).
"""

import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from caduceus_tpu.config import CaduceusConfig, SSMConfig
from caduceus_tpu.models.caduceus import Caduceus, CaduceusForMaskedLM
from caduceus_tpu.serve import InferenceServer, InferenceService, _next_bucket
from caduceus_tpu.tokenization import CaduceusTokenizer


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def rcps_server():
    tok = CaduceusTokenizer()
    cfg = CaduceusConfig(
        d_model=16, n_layer=1, vocab_size=tok.vocab_size,
        ssm_cfg=SSMConfig(use_kernel="xla"),
        rcps=True, complement_map=tok.complement_map,
        dtype="float32", param_dtype="float32",
    )
    model = CaduceusForMaskedLM(cfg)
    ids = jnp.full((1, 16), 7, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    svc = InferenceService(cfg, params, max_batch=4, min_bucket=16,
                           max_length=64, linger_ms=30.0)
    server = InferenceServer(svc, port=0).start()
    yield server, cfg, params
    server.stop()


def test_next_bucket():
    assert _next_bucket(1, 16, 256) == 16
    assert _next_bucket(16, 16, 256) == 16
    assert _next_bucket(17, 16, 256) == 32
    assert _next_bucket(300, 16, 256) == 256


def test_healthz(rcps_server):
    server, _, _ = rcps_server
    h = _get(server.port, "/healthz")
    assert h["status"] == "ok"
    assert h["model"]["rcps"] is True


def test_logits_match_direct_and_strip_padding(rcps_server):
    server, cfg, params = rcps_server
    tok = CaduceusTokenizer()
    model = CaduceusForMaskedLM(cfg)
    seqs = ["ACGTACGTAC", "ACGT"]  # different lengths, same 16-bucket
    out = _post(server.port, "/logits", {"sequences": seqs})["logits"]
    assert len(out) == 2
    for s, o in zip(seqs, out):
        got = np.asarray(o, np.float32)
        assert got.shape[0] == len(s)  # padding stripped
        ids = np.asarray(tok.encode(s))[None]
        # direct forward at the same padded bucket the server used
        pad = np.full((1, 16 - len(s)), tok.pad_token_id, np.int32)
        want = np.asarray(
            model.apply(params, jnp.asarray(
                np.concatenate([ids, pad], axis=1))))[0, :len(s)]
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_embed_mean_pool_masks_padding(rcps_server):
    server, cfg, params = rcps_server
    tok = CaduceusTokenizer()
    seq = "ACGTACGT"
    out = _post(server.port, "/embed", {"sequences": [seq]})["embed"]
    got = np.asarray(out[0], np.float32)
    assert got.shape == (cfg.d_model,)

    # oracle: strand-collapsed hidden states, mean over REAL positions only
    model = Caduceus(cfg)
    ids = np.asarray(tok.encode(seq))[None]
    pad = np.full((1, 16 - ids.shape[1]), tok.pad_token_id, np.int32)
    h = np.asarray(model.apply(
        params, jnp.asarray(np.concatenate([ids, pad], axis=1))))
    d = h.shape[-1] // 2
    h = (h[..., :d] + np.flip(h[..., d:], axis=(-2, -1))) / 2
    want = h[0, :len(seq)].mean(axis=0)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_batching_coalesces_concurrent_requests(rcps_server):
    import threading

    server, _, _ = rcps_server
    svc = server.service
    # warm the bucket's program so the timed dispatches batch predictably
    _post(server.port, "/logits", {"sequences": ["ACGT"]})
    before = svc.n_dispatches
    results = []

    def call():
        results.append(
            _post(server.port, "/logits", {"sequences": ["ACGTAC"]}))

    ts = [threading.Thread(target=call) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(results) == 4
    # 4 concurrent same-bucket requests must not take 4 dispatches
    assert svc.n_dispatches - before < 4


def test_one_request_many_sequences_single_dispatch(rcps_server):
    server, _, _ = rcps_server
    svc = server.service
    _post(server.port, "/embed", {"sequences": ["ACGT"]})  # warm
    before = svc.n_dispatches
    out = _post(server.port, "/embed",
                {"sequences": ["ACGT", "ACGTA", "ACGTAC"]})["embed"]
    assert len(out) == 3
    assert svc.n_dispatches - before == 1


def test_warmup_precompiles_buckets(rcps_server):
    server, _, _ = rcps_server
    svc = server.service
    # default batch sizes = pow2s up to max_batch (4 -> 1,2,4): these are
    # exactly the live dispatch signatures (batches pad to pow2)
    n = svc.warmup(buckets=[16, 32])
    assert n == 12  # 2 buckets x 3 batch sizes x (embed+logits)
    n1 = svc.warmup(buckets=[16], batch_sizes=(1,))
    assert n1 == 2


def test_batch_padding_single_program(rcps_server):
    """3 sequences in one request dispatch as a padded 4-row batch: the
    program signature equals the warmed (bucket, pow2-batch) one and the
    padding rows don't leak into results."""
    server, cfg, params = rcps_server
    out = _post(server.port, "/embed",
                {"sequences": ["ACGTA", "ACGTAC", "ACG"]})["embed"]
    assert len(out) == 3
    solo = _post(server.port, "/embed", {"sequences": ["ACGTA"]})["embed"]
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(solo[0]),
                               atol=1e-5)


def test_errors_are_json(rcps_server):
    server, _, _ = rcps_server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/logits", {"sequences": []})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server.port, "/logits", {"sequences": ["A" * 100]})
    assert e.value.code == 400  # > max_length


def test_classify_finetuned_export(tmp_path):
    """Full deployment path: finetune --save-dir exports the best seed's
    best-val model (params + task_config.json); serve loads it and
    /classify matches direct predict on the same encoding."""
    from caduceus_tpu.data.classification import (
        make_synthetic_classification_task)
    from caduceus_tpu.finetune import main as ft_main

    data_dir = make_synthetic_classification_task(
        str(tmp_path / "data"), task="demo", n_train=64, n_test=16,
        seq_len=32)
    save_dir = str(tmp_path / "deploy")
    ft_main([
        "--data-dir", data_dir, "--task", "demo",
        "--max-length", "32", "--batch-size", "16", "--epochs", "1",
        "--seeds", "0", "--d-model", "16", "--n-layer", "1",
        "--save-dir", save_dir,
    ])
    import os
    assert os.path.exists(os.path.join(save_dir, "task_config.json"))

    svc = InferenceService.from_run_dir(save_dir)
    assert svc.task_cfg["task"] == "demo"
    assert svc.warmup(batch_sizes=(1,)) == 1
    server = InferenceServer(svc, port=0).start()
    try:
        out = _post(server.port, "/classify",
                    {"sequences": ["ACGTACGTAC", "TTTTGGGGCC"]})["classify"]
        assert len(out) == 2
        for o in out:
            assert 0 <= o["label"] < svc.task_cfg["num_classes"]
            np.testing.assert_allclose(sum(o["probs"]), 1.0, rtol=1e-5)
        # a classifier dir must refuse the pretrain endpoints
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server.port, "/logits", {"sequences": ["ACGT"]})
        assert e.value.code == 400
        h = _get(server.port, "/healthz")
        assert h["model"]["task"] == "demo"
    finally:
        server.stop()


def test_generate_endpoint():
    tok = CaduceusTokenizer()
    cfg = CaduceusConfig(
        d_model=16, n_layer=1, vocab_size=tok.vocab_size,
        ssm_cfg=SSMConfig(use_kernel="xla"),
        bidirectional=False, rcps=False,
        complement_map=tok.complement_map,
        dtype="float32", param_dtype="float32",
    )
    model = CaduceusForMaskedLM(cfg)
    ids = jnp.full((1, 8), 7, jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids)
    svc = InferenceService(cfg, params, max_length=64, min_bucket=16)
    server = InferenceServer(svc, port=0).start()
    try:
        out = _post(server.port, "/generate",
                    {"prompt": "ACGTACGT", "max_new_tokens": 4})
        assert out["prompt"] == "ACGTACGT"
        assert len(out["generated"]) == 4
        assert set(out["generated"]) <= set("ACGTN[]KLMP*")  # token chars
    finally:
        server.stop()
