#!/bin/bash
# Round-5 protocol-scale hardware training run (VERDICT r4 #2 / #6):
# the full 4-stage 88^3 -> 704^3 staged cascade at 480x640, 5 views,
# 512 rays, all loss terms, warmup-cosine schedule — with per-step jsonl
# logging (step-time histogram), periodic chamfer-vs-steps evals against
# the analytic sphere, and periodic Runner-compatible checkpoints.
# Reference protocol: 16 epochs x 25,382 metas (reference README.md:158-162,
# datasets/dtu.py:169-180); this drives the same per-meta step on the
# in-image synthetic scene at the full cascade scale.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
mkdir -p docs/runs exp

STEPS=${STEPS:-400}
EVAL_EVERY=${EVAL_EVERY:-100}
TIMEOUT=${TIMEOUT:-28800}
JSONL=${JSONL:-docs/runs/train_protocol_r5.jsonl}
LOG=${LOG:-docs/runs/train_protocol_r5.log}

# NB: no separate device-health-check process — on the axon pool every
# process transition pays a device-claim handoff (observed 10-25 min);
# the trainer's own first op is the health check.

timeout "$TIMEOUT" python tools/train_synthetic.py \
    --steps "$STEPS" --stages 4 --base_dim 88 --img 480 640 --n_src 4 \
    --staged --schedule --match_dtype bfloat16 \
    --eval_every "$EVAL_EVERY" --mesh_res 256 \
    --save_ckpt exp/synth_protocol_r5.ckpt.npz \
    --log_jsonl "$JSONL" 2>&1 | tee "$LOG"
echo "=== protocol run done (rc=$?) ==="
