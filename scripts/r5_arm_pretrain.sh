#!/bin/bash
# r5 matched-token architecture arms (configs/r5_arms/): generate the shared
# structured genome once, then run one arm's MLM pretrain through the shipped
# CLI on the real TPU. Usage: scripts/r5_arm_pretrain.sh {v2n128|v2n16|v1}
set -euo pipefail
cd "$(dirname "$0")/.."
ARM=${1:?usage: r5_arm_pretrain.sh v2n128|v2n16|v1}
GEN=${R5_GENOME_DIR:-/tmp/r5_genome}
if [ ! -f "$GEN/genome.fa" ]; then
  echo "generating structured genome at $GEN ..."
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -c "
from caduceus_tpu.data.synthetic import make_structured_genome
print(make_structured_genome('$GEN'))"
fi
exec python -m caduceus_tpu.cli pretrain \
  --preset "configs/r5_arms/arm_$ARM.yaml" \
  --fasta "$GEN/genome.fa" --bed "$GEN/intervals.bed" \
  --use-native-loader --prefetch 0 \
  --run-dir "runs/r5_arm_$ARM" --resume
