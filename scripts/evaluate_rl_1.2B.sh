#!/bin/bash
# RL evaluation of the 1.2B flagship — TPU-native counterpart of the
# reference launcher (reference: scripts/evaluate/evaluate_rl_1.2B.sh).
# No per-GPU launcher/NCCL config: jax.distributed discovers the TPU
# topology per host; envs shard across processes automatically.
set -ex

LOAD_DIR=${1:?usage: evaluate_rl_1.2B.sh <checkpoint_dir> [cache_dir]}
RL_CACHE_DIR=${2:-rl_minimal_exp_data}
TAG_NAME="db1_870task_checkpoint"
OUTPUT_DIR=rl_eval_results/${TAG_NAME}
mkdir -p "$OUTPUT_DIR"

python -m bdm_db1_tpu.eval.evaluate_rl \
    --model.n-layer 24 \
    --model.n-embed 2048 \
    --model.n-head 16 \
    --model.n-inner 8192 \
    --model.n-position 1024 \
    --model.mem-len 1024 \
    --model.activation-fn geglu \
    --model.pre-lnorm False \
    --model.same-length True \
    --model.untie-r False \
    --model.share-input-output-embedding True \
    --train.load-dir "$LOAD_DIR" \
    --train.ckpt-tag "$TAG_NAME" \
    --train.save-dir "$OUTPUT_DIR" \
    --data.rl-dataset-cache-dir "$RL_CACHE_DIR" \
    --data.tokenizer-save-path my_tokenizer \
    --eval.task-suite-names babyai gym_sokoban metaworld modular_rl atari dmc gym_procgen dmlab \
    --eval.use-prompt True \
    --eval.prompt-strategy "stochastic_subseq;moving_prompt" \
    --eval.minimal-expert-data True \
    --eval.num-trials 5 \
    "${@:3}" \
    | tee "${OUTPUT_DIR}/results.output"
