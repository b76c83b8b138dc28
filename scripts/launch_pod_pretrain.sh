#!/usr/bin/env bash
# Multi-host TPU pod pretraining launcher.
#
# Parity with the reference's SLURM pretrain recipe
# (`slurm_scripts/run_pretrain_caduceus.sh:6-39`: srun, one process per
# accelerator). On TPU pods the unit is one PROCESS PER HOST; JAX discovers
# the pod topology from the TPU metadata, so the same command runs on every
# worker via `gcloud ... ssh --worker=all`.
#
# Usage (from a machine with gcloud configured):
#   TPU_NAME=my-pod ZONE=us-central2-b ./scripts/launch_pod_pretrain.sh \
#       --preset configs/hg38_mlm.yaml --fasta /data/hg38.fa --bed /data/hg38.bed
#
# Or run the inner command directly on each pod worker (e.g. under your own
# orchestration): everything after `--` below.
set -euo pipefail

TPU_NAME="${TPU_NAME:?set TPU_NAME}"
ZONE="${ZONE:?set ZONE}"
REPO_DIR="${REPO_DIR:-/home/$USER/caduceus_tpu}"
RUN_DIR="${RUN_DIR:-./outputs/pod_pretrain}"

# CADUCEUS_MULTIHOST=1 → jax.distributed.initialize() (cli.py); the data
# layer shards the BED index per host via jax.process_index(), exactly
# mirroring the reference's FaultTolerantDistributedSampler rank striding.
INNER="cd ${REPO_DIR} && \
  CADUCEUS_MULTIHOST=1 python -m caduceus_tpu.cli pretrain $* \
  --run-dir ${RUN_DIR} --resume"

exec gcloud compute tpus tpu-vm ssh "${TPU_NAME}" \
  --zone="${ZONE}" --worker=all --command="${INNER}"
