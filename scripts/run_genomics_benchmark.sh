#!/usr/bin/env bash
# GenomicBenchmarks fine-tuning sweep — parity with
# `slurm_scripts/run_genomics_benchmark.sh` + `wrapper_run_genomics.sh`:
# 8 tasks x 5 seeds x lr grid {1e-3, 2e-3} x batch {128, 256}, 10 epochs,
# best-val selection. The 5-seed CV loop runs in-process (--seeds 1..5).
#
# Usage:
#   PRETRAINED_RUN_DIR=./outputs/pod_pretrain DATA_DIR=/data/genomic_benchmark \
#     ./scripts/run_genomics_benchmark.sh [task ...]
#
# Caduceus-PS (rcps): no flags needed (equivariance is structural).
# Caduceus-Ph (post-hoc conjoin): add CONJOIN_TEST=1 — conjoining is the
# non-rcps recipe (reference `modeling_caduceus.py:562-592`), so this also
# passes --no-rcps; point PRETRAINED_RUN_DIR at a non-rcps pretrain.
set -euo pipefail

DATA_DIR="${DATA_DIR:?set DATA_DIR}"
PRETRAINED_RUN_DIR="${PRETRAINED_RUN_DIR:-}"
OUT_DIR="${OUT_DIR:-./outputs/downstream/gb_cv5}"
LRS=(${LRS:-1e-3 2e-3})
BATCH_SIZES=(${BATCH_SIZES:-128 256})
EPOCHS="${EPOCHS:-10}"
SEEDS=(${SEEDS:-1 2 3 4 5})

TASKS=("$@")
if [ ${#TASKS[@]} -eq 0 ]; then
  TASKS=(dummy_mouse_enhancers_ensembl demo_coding_vs_intergenomic_seqs
         demo_human_or_worm human_enhancers_cohn human_enhancers_ensembl
         human_ensembl_regulatory human_nontata_promoters human_ocr_ensembl)
fi

EXTRA=()
[ -n "${PRETRAINED_RUN_DIR}" ] && EXTRA+=(--pretrained-run-dir "${PRETRAINED_RUN_DIR}")
[ "${CONJOIN_TEST:-0}" = "1" ] && EXTRA+=(--conjoin-test --no-rcps)
[ "${RC_AUG:-0}" = "1" ] && EXTRA+=(--rc-aug)

mkdir -p "${OUT_DIR}"
for task in "${TASKS[@]}"; do
  for lr in "${LRS[@]}"; do
    for bs in "${BATCH_SIZES[@]}"; do
      tag="${task}_lr-${lr}_bs-${bs}"
      echo "=== GB ${tag} ==="
      python -m caduceus_tpu.cli finetune \
        --preset "configs/downstream/gb/${task}.yaml" \
        --data-dir "${DATA_DIR}" \
        --batch-size "${bs}" --lr "${lr}" --epochs "${EPOCHS}" \
        --seeds "${SEEDS[@]}" --metric all \
        "${EXTRA[@]}" | tee "${OUT_DIR}/${tag}.jsonl"
    done
  done
done
