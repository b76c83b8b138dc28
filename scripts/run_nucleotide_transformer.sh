#!/usr/bin/env bash
# Nucleotide Transformer downstream sweep — parity with
# `slurm_scripts/run_nucleotide_transformer.sh` +
# `wrapper_run_nucleotide_transformer.sh`: 18 tasks x 10 seeds x
# batch {128, 512}, 20 epochs, per-task metric (mcc / f1 / accuracy from
# `configs/dataset/nucleotide_transformer.yaml`).
#
# Usage:
#   PRETRAINED_RUN_DIR=./outputs/pod_pretrain DATA_DIR=/data/nt_tasks \
#     ./scripts/run_nucleotide_transformer.sh [task ...]
set -euo pipefail

DATA_DIR="${DATA_DIR:?set DATA_DIR}"
PRETRAINED_RUN_DIR="${PRETRAINED_RUN_DIR:-}"
OUT_DIR="${OUT_DIR:-./outputs/downstream/nt_cv10}"
LRS=(${LRS:-1e-3 2e-3})
BATCH_SIZES=(${BATCH_SIZES:-128 512})
EPOCHS="${EPOCHS:-20}"
SEEDS=(${SEEDS:-1 2 3 4 5 6 7 8 9 10})

TASKS=("$@")
if [ ${#TASKS[@]} -eq 0 ]; then
  TASKS=(enhancers enhancers_types H3 H3K4me1 H3K4me2 H3K4me3 H3K9ac H3K14ac
         H3K36me3 H3K79me3 H4 H4ac promoter_all promoter_no_tata
         promoter_tata splice_sites_acceptors splice_sites_all
         splice_sites_donors)
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
      echo "=== NT ${tag} ==="
      python -m caduceus_tpu.cli finetune \
        --preset "configs/downstream/nt/${task}.yaml" \
        --data-dir "${DATA_DIR}" \
        --batch-size "${bs}" --lr "${lr}" --epochs "${EPOCHS}" \
        --seeds "${SEEDS[@]}" --metric all \
        "${EXTRA[@]}" | tee "${OUT_DIR}/${tag}.jsonl"
    done
  done
done
