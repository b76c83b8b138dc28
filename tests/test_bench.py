"""bench.py smoke: the driver runs it at round end — keep every mode green.

Runs in a subprocess with a clean 1-device CPU env (bench sizes its own
synthetic genome and mesh; the suite's 8-device XLA_FLAGS would impose a
batch-divisibility constraint the tiny config doesn't meet).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env):
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="",
        BENCH_SEQLEN="256",
        BENCH_NLAYER="1",
        BENCH_STEPS="1",
        BENCH_MICRO_TOKENS="512",
        BENCH_TOKENS_PER_STEP="1024",
        BENCH_KERNEL="xla",
        **extra_env,
    )
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        env=env, cwd=REPO, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["metric"] == "tokens_per_sec_per_chip_mlm_pretrain"
    assert line["value"] > 0
    return line


def test_bench_synthetic_mode():
    _run_bench({})


def test_bench_real_pipeline_mode():
    # real HG38 loader + prestaged device batches (BENCH_DATA data modes)
    _run_bench({"BENCH_DATA": "python"})
