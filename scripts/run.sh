#!/usr/bin/env bash
# Generalizable training on DTU + validation (reference: scripts/run.sh).
# Multi-chip data parallelism comes from the jax mesh: all local TPU chips
# are used automatically; set JAX_NUM_PROCESSES/jax.distributed for multi-host.
python main.py --conf confs/surf.conf --mode train "$@"
