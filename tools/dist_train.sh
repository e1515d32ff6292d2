#!/usr/bin/env bash
# Multi-host SPMD training launch (the reference tools/dist_train.sh
# equivalent). On a TPU pod slice, run one process per host:
#   bash tools/dist_train.sh CONFIG NUM_HOSTS PROCESS_ID COORDINATOR [extra]
CONFIG=$1; NPROC=$2; PID=$3; COORD=$4; shift 4
python tools/train.py "$CONFIG" \
  --num-processes "$NPROC" --process-id "$PID" --coordinator "$COORD" "$@"
