#!/bin/bash
# Hardware finetune quality loop (VERDICT r3 #4): train the synthetic scene
# at the round-3 mid scale, init_volumes, finetune with per-stage vol LRs,
# prove the volume-only ckpt --load_vol resume, then score every exported
# mesh with the protocol-cleaned truncated Chamfer.
# Mirrors the reference's headline per-scene workflow
# (reference runner.py:298-398 + scripts/finetune.sh).
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
mkdir -p exp

STEPS=${STEPS:-150}
FT_CONF=confs/surf_synthetic_finetune_mid.conf
CKPT=exp/synth_mid.ckpt.npz
EXP=exp/surf_synthetic_finetune_mid

echo "=== stage A: mid-scale staged training ($STEPS steps) ==="
timeout 2700 python tools/train_synthetic.py --steps "$STEPS" --stages 3 \
    --base_dim 48 --img 240 320 --staged --schedule \
    --eval_every $((STEPS / 2)) --mesh_res 192 \
    --save_ckpt "$CKPT" --log_jsonl /tmp/train_mid_r4.jsonl \
    2>&1 | tee /tmp/ft_chain_A.log
[ -f "$CKPT" ] || { echo "NO CKPT — aborting"; exit 1; }

echo "=== stage B: finetune 1500 steps (main.py --mode finetune) ==="
timeout 2700 python main.py --conf "$FT_CONF" --mode finetune \
    --resume "$CKPT" --mesh_resolution 192 \
    2>&1 | tee /tmp/ft_chain_B.log

echo "=== stage C: volume-only --load_vol resume roundtrip (60 steps) ==="
LAST_FT=$(ls -t "$EXP"/checkpoints/model_*.ckpt.npz 2>/dev/null | head -1)
if [ -n "$LAST_FT" ]; then
    sed -e 's/epochs = 1500/epochs = 60/' \
        -e 's/val_before_finetune = true/val_before_finetune = false/' \
        -e 's/val_freq = 500/val_freq = 60/' \
        -e 's/save_freq = 500/save_freq = 60/' \
        -e 's#./exp/surf_synthetic_finetune_mid#./exp/surf_synthetic_finetune_mid_resume#' \
        "$FT_CONF" > /tmp/ft_mid_resume.conf
    timeout 1200 python main.py --conf /tmp/ft_mid_resume.conf \
        --mode finetune --resume "$LAST_FT" --load_vol --mesh_resolution 192 \
        2>&1 | tee /tmp/ft_chain_C.log
else
    echo "no finetune ckpt found — skipping stage C"
fi

echo "=== stage D: chamfer scoring of exported meshes ==="
timeout 900 python tools/eval_finetune_meshes.py "$EXP" --conf "$FT_CONF" \
    2>&1 | tee /tmp/ft_chain_D.log
if [ -d exp/surf_synthetic_finetune_mid_resume/meshes ]; then
    timeout 900 python tools/eval_finetune_meshes.py \
        exp/surf_synthetic_finetune_mid_resume --conf "$FT_CONF" \
        2>&1 | tee /tmp/ft_chain_D2.log
fi
echo "=== chain done ==="
