#!/bin/bash
# Pretraining launcher for the 1.2B flagship on a TPU pod slice.
# DATA_PATH: (weight prefix type)* triples, e.g.
#   "0.6 /data/pile nlp 0.4 mujoco rl_task_suite"
set -ex

DATA_PATH=${1:?usage: pretrain_1.2B.sh "<weight prefix type>..." [save_dir]}
SAVE_DIR=${2:-checkpoints/db1_1p2b}
RL_CACHE_DIR=${RL_CACHE_DIR:-rl_minimal_exp_data}

python -m bdm_db1_tpu.train.pretrain \
    --model.n-layer 24 \
    --model.n-embed 2048 \
    --model.n-head 16 \
    --model.n-inner 8192 \
    --model.n-position 1024 \
    --model.mem-len 1024 \
    --model.activation-fn geglu \
    --model.pre-lnorm False \
    --model.same-length True \
    --model.share-input-output-embedding True \
    --mesh.model-parallel 1 \
    --data.data-path $DATA_PATH \
    --data.rl-dataset-cache-dir "$RL_CACHE_DIR" \
    --data.tokenizer-save-path my_tokenizer \
    --train.global-batch-size 512 \
    --train.micro-batch-size 4 \
    --train.train-iters 100000 \
    --train.save-dir "$SAVE_DIR" \
    --train.optimizer.lr 1e-4 \
    --train.optimizer.lr-warmup-iters 2000 \
    --train.optimizer.lr-decay-style cosine
