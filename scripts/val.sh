#!/usr/bin/env bash
# Validate a checkpoint on the DTU test split and export meshes.
# Usage: scripts/val.sh <ckpt.npz> [extra flags]
CKPT=$1; shift
python main.py --conf confs/surf.conf --mode val --resume "$CKPT" "$@"
