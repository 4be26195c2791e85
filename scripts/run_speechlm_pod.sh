#!/usr/bin/env bash
# Multi-host speech-LM training launch for a TPU pod slice.
#
# Capability parity with the reference's cluster job (scripts/run_speechlm.sh:
# SGE + torchrun over 2 GPUs).  On TPU there is no torchrun: run the SAME
# command on every host of the slice; jax.distributed.initialize() (called by
# core.mesh.distributed_init via the trainer) wires the hosts together from
# the TPU runtime metadata, and the data loaders shard by process index.
#
# Example (Cloud TPU VM):
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#     --command="cd ~/speech_resynth_tpu && bash scripts/run_speechlm_pod.sh"
set -euo pipefail

CONFIG="${1:-configs/speechlm/hubert.yaml}"

export JAX_COORDINATOR_ADDRESS="${JAX_COORDINATOR_ADDRESS:-}"  # auto on Cloud TPU

python -m speech_resynth_tpu.cli.speechlm train --config "${CONFIG}"
