#!/bin/bash
# 870-task RL evaluation with the int8 decode KV cache — the
# capacity-optimized serving config (tolerance path, not bit-parity with
# the bf16 cache; see README "int8 decode cache").
#
# int8 halves the ring cache's HBM footprint, which is what bounds the
# lockstep batch: batch 60 in ONE cohort fits where bf16 caps at 40, and
# the flash ring-decode kernels dequantize in-kernel (measured 228.7
# actions/sec vs 218.5 bf16-b40 on one v5e, PERFORMANCE.md; 64 misses
# HBM by ~380 MB).
# A single large cohort beats two interleaved ones here because the host
# work per round is already amortized across 60 envs.
#
# Usage: evaluate_rl_1.2B_int8.sh <checkpoint_dir> [cache_dir]
set -ex

SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
exec "$SCRIPT_DIR/evaluate_rl_1.2B.sh" \
    "${1:?usage: evaluate_rl_1.2B_int8.sh <checkpoint_dir> [cache_dir]}" \
    "${2:-rl_minimal_exp_data}" \
    --model.decode-cache-dtype int8 \
    --eval.batch-size 60 \
    --eval.interleave 1
