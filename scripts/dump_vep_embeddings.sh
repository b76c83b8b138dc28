#!/usr/bin/env bash
# VEP embedding dump on a TPU pod — parity with
# `slurm_scripts/dump_vep_embeddings.sh` (torchrun DDP x8 → one JAX process
# per pod host; per-host variant sharding via jax.process_index()).
#
# Usage (single host):
#   ./scripts/dump_vep_embeddings.sh --fasta hg38.fa --variants v.tsv \
#       --run-dir ./outputs/pod_pretrain --svm
# Pod: prefix with the gcloud --worker=all pattern of launch_pod_pretrain.sh
# and set CADUCEUS_MULTIHOST=1.
set -euo pipefail
exec python -m caduceus_tpu.cli vep --seq-len "${SEQ_LEN:-131072}" "$@"
