#!/usr/bin/env bash
# Multi-host (multi-slice / TPU pod) training launch recipe.
#
# Run THIS SAME SCRIPT on every host of the pod/slice set (e.g. via
# `gcloud compute tpus tpu-vm ssh $VM --worker=all --command=...`).
# On Cloud TPU VMs, set RTTS_MULTIHOST=1 and JAX's cluster auto-detection
# fills coordinator/process info from the TPU metadata; rtts calls
# jax.distributed.initialize() from every CLI entry point when multihost is
# configured (rtts/parallel/mesh.py::initialize_distributed).
#
# On a non-TPU-VM cluster, pass the coordinator explicitly per host:
#   NUM_PROCESSES=4 PROCESS_ID=$i COORDINATOR=10.0.0.1:8476 \
#     scripts/run_multihost.sh configs/base.yaml runs
#
# Mesh layout: keep the model axis within a slice (ICI); set
# experiment.mesh.dcn_parallel to the number of slices so only the
# data-parallel gradient all-reduce crosses DCN (mesh axis order is
# (dcn, data, model), dcn outermost — rtts/parallel/mesh.py::make_mesh).
set -euo pipefail

CONFIG=${1:-configs/base.yaml}
WORKDIR=${2:-runs}

OVERRIDES=()
if [ -n "${COORDINATOR:-}" ]; then
  OVERRIDES+=(-o "experiment.mesh.coordinator_address=${COORDINATOR}")
  OVERRIDES+=(-o "experiment.mesh.num_processes=${NUM_PROCESSES:?set NUM_PROCESSES}")
  OVERRIDES+=(-o "experiment.mesh.process_id=${PROCESS_ID:?set PROCESS_ID}")
fi
if [ -n "${DCN_PARALLEL:-}" ]; then
  OVERRIDES+=(-o "experiment.mesh.dcn_parallel=${DCN_PARALLEL}")
fi

# every host runs the same SPMD program; checkpoints/artifacts are written
# by process 0 only (the trainers gate host IO on jax.process_index() == 0)
python -m rtts.cli -c "$CONFIG" "${OVERRIDES[@]}" train-tts --workdir "$WORKDIR/tts"
python -m rtts.cli -c "$CONFIG" "${OVERRIDES[@]}" train-vocoder --workdir "$WORKDIR/vocoder"
