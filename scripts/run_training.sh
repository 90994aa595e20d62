#!/usr/bin/env bash
# End-to-end training launch (data prep -> TTS -> vocoder), resumable.
# Mirrors the reference's VM run script: pull data, train, checkpoint.
set -euo pipefail

CONFIG=${1:-configs/base.yaml}
WORKDIR=${2:-runs}

# data: pull from the artifact remote if configured, else synthesize corpus
if [ -n "${RTTS_DATA_REMOTE:-}" ] && [ -f data.lock.json ]; then
  python -c "from rtts.data.versioning import pull; import os; \
    print(pull('data.lock.json', os.environ['RTTS_DATA_REMOTE']))"
else
  python -m rtts.cli -c "$CONFIG" generate-corpus
fi

python -m rtts.cli -c "$CONFIG" preprocess
python -m rtts.cli -c "$CONFIG" train-tts --workdir "$WORKDIR/tts"
python -m rtts.cli -c "$CONFIG" train-vocoder --workdir "$WORKDIR/vocoder"
