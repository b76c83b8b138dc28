#!/usr/bin/env bash
# On-hardware demo of the FULL downstream path through the shipped CLI:
# pretrain (MLM) -> finetune (classification, pretrained backbone) -> VEP
# (embedding dump + SVM), on the attached real TPU with synthetic data
# (zero-egress stand-ins for hg38 / GenomicBenchmarks / ClinVar).
#
#   bash scripts/demo_downstream_tpu.sh [out_dir]
#
# Artifacts land in runs/demo_r3_downstream by default (summary.json has
# the headline numbers). Companion to the r2 pretrain demo
# (runs/demo_r2_pretrain); uses ONE TPU process at a time.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT=${1:-runs/demo_r3_downstream}
mkdir -p "$OUT"

echo "== data: synthetic genome + motif-planted classification task + variants"
python - "$OUT" <<'EOF'
import sys, numpy as np
out = sys.argv[1]
from caduceus_tpu.data.synthetic import make_synthetic_genome
from caduceus_tpu.data.classification import make_synthetic_classification_task
from caduceus_tpu.data.fasta import FastaFile
make_synthetic_genome(out, n_chromosomes=2, chrom_len=1 << 16, window=1 << 12)
make_synthetic_classification_task(out + "/tasks", task="demo_enhancers",
                                   n_train=512, n_test=128, seq_len=256, seed=0)
# variants TSV over the synthetic genome: chrom pos ref alt label tss_dist
fa = FastaFile(out + "/genome.fa")
seq = fa.fetch("chr1", 0, 1 << 16)
rng = np.random.default_rng(0)
comp = {"A": "G", "C": "T", "G": "A", "T": "C"}
with open(out + "/variants.tsv", "w") as f:
    for i in range(48):
        pos = 2048 + i * 1024
        ref = seq[pos]
        f.write(f"chr1\t{pos}\t{ref}\t{comp[ref]}\t{i % 2}\t{i * 3000}\n")
print("data ready")
EOF

echo "== stage 1: MLM pretrain on TPU (tiny geometry)"
python -m caduceus_tpu.cli pretrain \
  --fasta "$OUT/genome.fa" --bed "$OUT/intervals.bed" \
  --max-length 1024 --batch-size 8 --max-steps 150 \
  --d-model 64 --n-layer 2 --lr 2e-3 --dtype bfloat16 \
  --run-dir "$OUT/pretrain" --seed 0

echo "== stage 2: finetune the pretrained backbone on the classification task"
python -m caduceus_tpu.cli finetune \
  --data-dir "$OUT/tasks" --task demo_enhancers \
  --pretrained-run-dir "$OUT/pretrain" \
  --max-length 256 --batch-size 32 --epochs 3 --lr 1e-3 --seeds 2 \
  --pooling pool --metric accuracy 2>&1 | tee "$OUT/finetune.log"

echo "== stage 3: VEP embeddings + SVM on TPU"
python -m caduceus_tpu.cli vep \
  --fasta "$OUT/genome.fa" --variants "$OUT/variants.tsv" \
  --run-dir "$OUT/pretrain" --seq-len 1024 --batch-size 4 \
  --out "$OUT/vep" --svm 2>&1 | tee "$OUT/vep.log"

echo "== demo complete; artifacts in $OUT"
