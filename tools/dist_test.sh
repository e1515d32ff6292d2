#!/usr/bin/env bash
# Multi-host evaluation launch (reference tools/dist_test.sh equivalent).
CONFIG=$1; shift 1
python tools/test.py "$CONFIG" "$@"
