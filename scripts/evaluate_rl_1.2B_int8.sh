#!/bin/bash
# 870-task RL evaluation with the int8 decode KV cache — the
# capacity-optimized serving config (tolerance path, not bit-parity with
# the bf16 cache; see README "int8 decode cache").
#
# int8 halves the ring cache's HBM footprint, which is what bounds the
# lockstep batch: batch 56 in ONE cohort fits where bf16 caps at 40, and
# the flash ring-decode kernels dequantize in-kernel (measured 225.1
# actions/sec on one v5e at r4 head, PERFORMANCE.md). Batch 60 fit BEFORE
# the all-pairs prime kernel + deferred-last-action became decode defaults
# (r3: 228.7 a/s) but crashes the chip with a TPU INTERNAL error at head —
# those defaults buy more than the 4 envs they evict.
# A single large cohort beats two interleaved ones here because the host
# work per round is already amortized across 56 envs.
#
# Usage: evaluate_rl_1.2B_int8.sh <checkpoint_dir> [cache_dir]
set -ex

SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
exec "$SCRIPT_DIR/evaluate_rl_1.2B.sh" \
    "${1:?usage: evaluate_rl_1.2B_int8.sh <checkpoint_dir> [cache_dir]}" \
    "${2:-rl_minimal_exp_data}" \
    --model.decode-cache-dtype int8 \
    --eval.batch-size 56 \
    --eval.interleave 1
