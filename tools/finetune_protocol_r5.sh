#!/bin/bash
# Round-5 protocol-scale hardware finetune chain (VERDICT r4 #3):
# reuses the checkpoint of the 300-step protocol training run
# (exp/synth_protocol_r5.ckpt.npz — same model section as
# confs/surf_synthetic_finetune.conf) so no separate stage-A pre-train
# process is needed.  Stages:
#   B: >=1000 finetune steps via main.py --mode finetune (reference
#      runner.py:298-398 semantics: cached volumes + per-stage vol_lr,
#      val_before_finetune baseline mesh first)
#   C: volume-only --load_vol resume round-trip (60 steps)
#   D: chamfer scoring of every exported mesh (CPU, no device claim)
# Lessons baked in: no separate device-health-check process (each process
# pays a multi-minute axon claim handoff), logs under docs/runs/.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
export PYTHONUNBUFFERED=1
mkdir -p exp docs/runs

STEPS=${STEPS:-1200}
CKPT=${CKPT:-exp/synth_protocol_r5.ckpt.npz}
BASE_CONF=confs/surf_synthetic_finetune.conf
# Runner appends <scene>/view<ref_view> in finetune mode (runner.py:103)
EXP=exp/surf_synthetic_finetune/synthetic/view0
EXP_RESUME=exp/surf_synthetic_finetune_resume/synthetic/view0
[ -f "$CKPT" ] || { echo "NO CKPT $CKPT — aborting"; exit 1; }

# derive a wall-clock-bounded conf from the shipped (reference-parity,
# 5000-step) one
sed -e "s/epochs = 5000/epochs = $STEPS/" \
    -e "s/val_freq = 1000/val_freq = $((STEPS / 3))/" \
    -e "s/save_freq = 500/save_freq = $((STEPS / 3))/" \
    "$BASE_CONF" > /tmp/ft_protocol_r5.conf

echo "=== stage B: $STEPS finetune steps (main.py --mode finetune) ==="
timeout "${TIMEOUT_B:-10800}" python main.py --conf /tmp/ft_protocol_r5.conf \
    --mode finetune --resume "$CKPT" --mesh_resolution 256 \
    2>&1 | tee docs/runs/finetune_protocol_r5_B.log

echo "=== stage C: volume-only --load_vol resume round-trip (60 steps) ==="
LAST_FT=$(ls -t "$EXP"/checkpoints/model_*.ckpt.npz 2>/dev/null | head -1)
if [ -n "$LAST_FT" ]; then
    sed -e "s/epochs = $STEPS/epochs = 60/" \
        -e 's/val_before_finetune = true/val_before_finetune = false/' \
        -e "s/val_freq = $((STEPS / 3))/val_freq = 60/" \
        -e "s/save_freq = $((STEPS / 3))/save_freq = 60/" \
        -e 's#./exp/surf_synthetic_finetune#./exp/surf_synthetic_finetune_resume#' \
        /tmp/ft_protocol_r5.conf > /tmp/ft_protocol_r5_resume.conf
    timeout "${TIMEOUT_C:-3600}" python main.py --conf /tmp/ft_protocol_r5_resume.conf \
        --mode finetune --resume "$LAST_FT" --load_vol --mesh_resolution 256 \
        2>&1 | tee docs/runs/finetune_protocol_r5_C.log
else
    echo "no finetune ckpt found — skipping stage C"
fi

echo "=== stage D: chamfer scoring of exported meshes (CPU) ==="
JAX_PLATFORMS=cpu timeout 900 python tools/eval_finetune_meshes.py "$EXP" \
    --conf /tmp/ft_protocol_r5.conf \
    2>&1 | tee docs/runs/finetune_protocol_r5_D.log
if [ -d "$EXP_RESUME"/meshes ]; then
    JAX_PLATFORMS=cpu timeout 900 python tools/eval_finetune_meshes.py \
        "$EXP_RESUME" --conf /tmp/ft_protocol_r5.conf \
        2>&1 | tee docs/runs/finetune_protocol_r5_D2.log
fi
echo "=== chain done ==="
