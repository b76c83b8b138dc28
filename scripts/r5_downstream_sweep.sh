#!/bin/bash
# r5 downstream quality table (VERDICT r4 #5): the full 8-task
# GenomicBenchmarks sweep through the SHIPPED sweep runner
# (scripts/run_genomics_benchmark.sh), fine-tuning the r5 arm-A pretrained
# backbone (runs/r5_arm_v2n128) on GB-shaped synthetic tasks drawn over the
# SAME structured genome the backbone was pretrained on (real GB data is
# unreachable — zero egress). Grid trimmed for the single tunneled chip:
# lr 1e-3, batch 128, 5 epochs, the presets' 5-seed CV.
#
# Usage: scripts/r5_downstream_sweep.sh [pretrain_run_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
PRETRAIN=${1:-runs/r5_arm_v2n128}
[ $# -ge 1 ] && shift  # remaining args = task subset for the sweep runner
GEN=${R5_GENOME_DIR:-/tmp/r5_genome}
GB=${R5_GB_DIR:-/tmp/r5_gb_tasks}
test -f "$GEN/genome.fa" || { echo "structured genome missing (run scripts/r5_arm_pretrain.sh first)"; exit 1; }
test -f "$PRETRAIN/model_config.json" || { echo "no pretrain run at $PRETRAIN"; exit 1; }
if [ ! -f "$GB/human_ocr_ensembl/train.tsv" ]; then
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -c "
from caduceus_tpu.data.synthetic import make_structured_classification_suite
print(make_structured_classification_suite('$GB', '$GEN/genome.fa'))"
fi
DATA_DIR=$GB PRETRAINED_RUN_DIR=$PRETRAIN \
  OUT_DIR=${OUT_DIR:-runs/r5_downstream_gb} \
  LRS=${LRS:-1e-3} BATCH_SIZES=${BATCH_SIZES:-128} EPOCHS=${EPOCHS:-5} \
  exec ./scripts/run_genomics_benchmark.sh "$@"
