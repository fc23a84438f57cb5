#!/bin/bash
# 870-task RL evaluation with W8A8 decode weights — the
# throughput-optimized serving config (tolerance path: weights AND
# activations round to int8, logit drift <3% of range on the tiny
# config; see README "W8A8 decode weights").
#
# decode_weight_dtype="int8a8" stores the trunk Dense kernels int8
# (per-layer, per-output-channel scales) and quantizes activations
# per-row so the MXU consumes a native int8 x int8 -> int32 dot — no
# dequant convert, weight HBM at 1 byte/element. Measured 247.0
# actions/sec at batch 40 on one v5e (vs 245.4 bf16; PERFORMANCE.md).
# Batch stays 40: the freed weight HBM is NOT enough for batch 48 with
# the bf16 ring cache (~350 MB short). To trade a little more accuracy
# for capacity, stack the int8 cache: add
#     --model.decode-cache-dtype int8 --eval.batch-size 56
# (measured 240.2 a/s — the weight stream W8A8 removes matters more at
# the bigger batch than it does at 40).
#
# Usage: evaluate_rl_1.2B_w8a8.sh <checkpoint_dir> [cache_dir]
set -ex

SCRIPT_DIR="$(cd "$(dirname "$0")" && pwd)"
exec "$SCRIPT_DIR/evaluate_rl_1.2B.sh" \
    "${1:?usage: evaluate_rl_1.2B_w8a8.sh <checkpoint_dir> [cache_dir]}" \
    "${2:-rl_minimal_exp_data}" \
    --model.decode-weight-dtype int8a8
