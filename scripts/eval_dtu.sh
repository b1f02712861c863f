#!/usr/bin/env bash
# Offline DTU evaluation: clean meshes against official masks, then Chamfer.
OUT=${1:-./exp/surf}
DTU_TEST=${2:-./data/DTU_TEST}
EVAL_DIR=${3:-./data/dtu_training/evaluation}
python evaluation/clean_mesh.py --root_dir "$DTU_TEST" --out_dir "$OUT/meshes"
python evaluation/dtu_eval.py --out_dir "$OUT" --dataset_dir "$EVAL_DIR"
