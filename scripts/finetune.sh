#!/usr/bin/env bash
# Per-scene finetuning on DTU (reference: scripts/finetune.sh): 5000 steps
# per (scene, ref_view) over the 15 test scans and views {23, 43}.
CKPT=$1; shift
for scene in scan24 scan37 scan40 scan55 scan63 scan65 scan69 scan83 scan97 scan105 scan106 scan110 scan114 scan118 scan122; do
  for view in 23 43; do
    python main.py --conf confs/surf_finetune.conf --mode finetune \
      --resume "$CKPT" --scene "$scene" --ref_view "$view" "$@"
  done
done
