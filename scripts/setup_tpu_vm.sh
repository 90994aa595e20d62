#!/usr/bin/env bash
# TPU VM provisioning (SURVEY.md §3.1 #20: the reference ships GCP GPU-VM
# setup scripts; this is the TPU-native equivalent).
#
# Usage: ./scripts/setup_tpu_vm.sh <tpu-name> <zone> [accelerator-type]
# Requires gcloud auth; run from a workstation with network access.
set -euo pipefail

TPU_NAME=${1:?tpu name}
ZONE=${2:?zone, e.g. us-central2-b}
ACCEL=${3:-v4-8}
VERSION=${RTTS_TPU_VERSION:-tpu-ubuntu2204-base}

gcloud compute tpus tpu-vm create "$TPU_NAME" \
  --zone="$ZONE" --accelerator-type="$ACCEL" --version="$VERSION"

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone="$ZONE" --command '
  set -e
  sudo apt-get update && sudo apt-get install -y python3-venv g++ ffmpeg
  python3 -m venv ~/rtts-env
  source ~/rtts-env/bin/activate
  pip install -U pip "jax[tpu]" flax optax chex einops pyyaml click matplotlib
'

echo "TPU VM $TPU_NAME ready. Next:"
echo "  gcloud compute tpus tpu-vm scp --recurse . $TPU_NAME:~/rtts --zone=$ZONE"
echo "  gcloud compute tpus tpu-vm ssh $TPU_NAME --zone=$ZONE"
echo "  source ~/rtts-env/bin/activate && cd ~/rtts && ./scripts/run_training.sh"
