"""Matched-token architecture comparison table from the r5 arm runs.

Reads runs/r5_arm_{v1,v2n16,v2n128}/metrics.jsonl (written by the shipped
CLI pretrains, configs/r5_arms/) and prints train-loss at matched token
counts plus held-out eval loss at each shared eval point. All arms share
the data stream (same seed -> bit-identical batches), optimizer, and
schedule; tokens/step = batch 2 x 131072 = 262,144.

Usage: python scripts/r5_compare.py [--runs-dir runs] [--markdown]
"""

import argparse
import json
import os


ARMS = ["v1", "v2n16", "v2n128"]
TOKENS_PER_STEP = 2 * 131072


def load(run_dir):
    steps, evals = {}, {}
    path = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return steps, evals
    with open(path) as f:
        last_step = 0
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "step" in r and "loss" in r:
                # keep the FIRST record per step: on resume the trainer
                # re-logs from the restored step
                steps.setdefault(r["step"], r)
                last_step = r["step"]
            elif "val/loss" in r:
                evals.setdefault(last_step, r)
    return steps, evals


def smoothed(steps, at, window=20):
    """Mean train loss over [at-window, at] (per-step MLM loss is noisy)."""
    vals = [steps[s]["loss"] for s in range(max(1, at - window), at + 1)
            if s in steps]
    return sum(vals) / len(vals) if vals else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs-dir", default="runs")
    ap.add_argument("--window", type=int, default=20)
    args = ap.parse_args()

    data = {a: load(os.path.join(args.runs_dir, f"r5_arm_{a}")) for a in ARMS}
    max_common = min((max(s) if s else 0) for s, _ in data.values())
    if max_common == 0:
        present = {a: (max(s) if s else 0) for a, (s, _) in data.items()}
        print(f"incomplete runs: {present}")
    points = [p for p in (100, 200, 300, 400, 500, 750, 1000, 1500, 2000,
                          2500, 3000) if p <= max_common or p == max_common]

    print("| tokens (steps) | " + " | ".join(
        f"{a} train (±{args.window}-step mean)" for a in ARMS) + " |")
    print("|---" * (1 + len(ARMS)) + "|")
    for p in points:
        row = [f"{p * TOKENS_PER_STEP / 1e6:.0f}M ({p})"]
        for a in ARMS:
            v = smoothed(data[a][0], p, args.window)
            row.append(f"{v:.4f}" if v is not None else "—")
        print("| " + " | ".join(row) + " |")

    print()
    print("| eval @ step | " + " | ".join(
        f"{a} val loss (val acc)" for a in ARMS) + " |")
    print("|---" * (1 + len(ARMS)) + "|")
    shared = sorted(set.intersection(*(set(e) for _, e in data.values())) or set())
    for p in shared:
        row = [str(p)]
        for a in ARMS:
            r = data[a][1].get(p)
            row.append(f"{r['val/loss']:.4f} ({r.get('val/acc', 0):.3f})"
                       if r else "—")
        print("| " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
