#!/usr/bin/env bash
# Multi-host launch wrapper (reference dist_main.sh used torchrun; under SPMD
# JAX a single process drives all local devices, so single-host multi-chip
# needs NO wrapper — just `python scripts/main.py`).  For multi-host pods,
# launch this once per host:
#   ./dist_main.sh <coordinator_ip:port> <num_hosts> <host_id> --config ...
set -e
COORD=$1; NPROCS=$2; PID=$3; shift 3
exec python "$(dirname "$0")/scripts/main.py" \
  --coordinator "$COORD" --num-processes "$NPROCS" --process-id "$PID" "$@"
