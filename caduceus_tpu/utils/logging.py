"""Logging utilities: stdout-JSON + optional Weights & Biases.

Parity targets: `CustomWandbLogger` (rank-zero only, retrying —
`train.py:74-123`) and the `ParamsLog` callback (`src/callbacks/params.py`).
wandb is optional and this environment has no egress; the logger degrades to
stdout JSON lines (offline mode if wandb is importable).
"""

from __future__ import annotations

import json
import sys
from typing import Callable, Dict, Optional


def param_count(params) -> Dict[str, int]:
    """Total / trainable parameter counts (`src/callbacks/params.py:27-39`)."""
    import jax

    total = sum(x.size for x in jax.tree_util.tree_leaves(params))
    return {"params_total": int(total)}


def make_logger(
    run_dir: Optional[str] = None,
    wandb_project: Optional[str] = None,
    wandb_name: Optional[str] = None,
    rank: int = 0,
) -> Callable[[Dict], None]:
    """Returns log_fn(metrics_dict). Rank-nonzero hosts get a no-op
    (reference: DummyExperiment on non-zero ranks, `train.py:43-72`)."""
    if rank != 0:
        return lambda m: None

    sinks = []

    def stdout_sink(m):
        print(json.dumps(m), flush=True)

    sinks.append(stdout_sink)

    if run_dir:
        import os

        os.makedirs(run_dir, exist_ok=True)
        path = os.path.join(run_dir, "metrics.jsonl")

        def file_sink(m):
            with open(path, "a") as f:
                f.write(json.dumps(m) + "\n")

        sinks.append(file_sink)

    if wandb_project:
        try:
            import os

            import wandb

            # online when the deployment has egress (WANDB_MODE=online);
            # offline default suits air-gapped training. group/job_type
            # mirror the reference's sweep organization
            # (`wandb.group="downstream/gb_cv5"`, run_genomics_benchmark.sh)
            run = wandb.init(
                project=wandb_project, name=wandb_name, dir=run_dir,
                mode=os.environ.get("WANDB_MODE", "offline"),
                group=os.environ.get("WANDB_RUN_GROUP"),
                job_type=os.environ.get("WANDB_JOB_TYPE"),
            )

            def wandb_sink(m):
                step = m.get("step")
                run.log(m, step=step)

            sinks.append(wandb_sink)
        except Exception as e:  # no wandb or init failure: degrade silently
            print(f"[logger] wandb unavailable ({e}); stdout/file only",
                  file=sys.stderr)

    def log(m: Dict) -> None:
        for s in sinks:
            s(m)

    return log
