#!/bin/bash
# r5 NT-subset downstream run (VERDICT r4 #5 "and an NT subset"): a
# representative slice of the Nucleotide Transformer catalog — one task per
# metric family (mcc / f1 / accuracy) plus a histone task — through the
# SHIPPED sweep runner (scripts/run_nucleotide_transformer.sh), from the r5
# arm-A pretrained backbone on NT-shaped synthetic tasks over the
# structured genome (real NT data unreachable: zero egress). Grid trimmed
# for the single tunneled chip.
#
# Usage: scripts/r5_nt_subset_sweep.sh [pretrain_run_dir]
set -euo pipefail
cd "$(dirname "$0")/.."
PRETRAIN=${1:-runs/r5_arm_v2n128}
GEN=${R5_GENOME_DIR:-/tmp/r5_genome}
NT=${R5_NT_DIR:-/tmp/r5_nt_tasks}
test -f "$GEN/genome.fa" || { echo "structured genome missing"; exit 1; }
if [ ! -f "$NT/enhancers/train.tsv" ]; then
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -c "
from caduceus_tpu.data.synthetic import make_structured_classification_suite
tasks = {'enhancers': (2, 200), 'H3': (2, 500),
         'promoter_all': (2, 300), 'splice_sites_all': (3, 400)}
print(make_structured_classification_suite('$NT', '$GEN/genome.fa',
                                           tasks=tasks, seed=17))"
fi
DATA_DIR=$NT PRETRAINED_RUN_DIR=$PRETRAIN \
  OUT_DIR=${OUT_DIR:-runs/r5_downstream_nt} \
  LRS=${LRS:-1e-3} BATCH_SIZES=${BATCH_SIZES:-128} EPOCHS=${EPOCHS:-5} \
  exec ./scripts/run_nucleotide_transformer.sh \
    enhancers H3 promoter_all splice_sites_all
