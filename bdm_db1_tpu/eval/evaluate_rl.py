"""RL evaluation driver — counterpart of the reference's primary entry point
(reference: src/evaluation/evaluate_rl.py:485-541, launched by
scripts/evaluate/evaluate_rl_1.2B.sh).

Usage:
    python -m bdm_db1_tpu.eval.evaluate_rl --config cfg.json \
        --eval.env-names halfcheetah-medium-v2 ... \
        --train.load-dir /ckpts --train.ckpt-tag db1_870task_checkpoint

Builds the model, loads a checkpoint (orbax, or converts a DeepSpeed torch
checkpoint on the fly), shards the env list across hosts, and evaluates each
env with the batched lockstep decoder, writing ``results.output``-style
records (reference: scripts/evaluate/evaluate_rl_1.2B.sh:91).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from bdm_db1_tpu.core.config import DB1Config
from bdm_db1_tpu.core.logging import print_rank_0
from bdm_db1_tpu.data.input_specs import RLTaskBatch
from bdm_db1_tpu.data.rl_dataset import build_rl_dataset_from_cache
from bdm_db1_tpu.eval.envs import make_env
from bdm_db1_tpu.eval.harness import (
    evaluate_env, evaluate_envs_lockstep, shard_envs,
)
from bdm_db1_tpu.eval.wrapper import TokenizedEnv
from bdm_db1_tpu.models.transformer_xl import TransformerXL


def suite_env_names(suite: str) -> List[str]:
    """Every env of a task suite (reference: evaluate_rl.py:529-539
    imports d4rl.{suite}.ALL_ENVS)."""
    import importlib

    mod = importlib.import_module(f"d4rl.{suite}")
    return list(mod.ALL_ENVS)


def load_params(cfg: DB1Config, model: TransformerXL):
    """Checkpoint resolution: orbax dir > DeepSpeed torch dir > random init."""
    load_dir, tag = cfg.train.load_dir, cfg.train.ckpt_tag
    if load_dir and os.path.isdir(os.path.join(load_dir, tag)):
        ds_states = None
        for root, _, files in os.walk(os.path.join(load_dir, tag)):
            if any(f.endswith("model_states.pt") for f in files):
                ds_states = True
                break
        if ds_states:
            from bdm_db1_tpu.train.convert import convert_checkpoint

            print_rank_0(f"converting DeepSpeed checkpoint {load_dir}/{tag}")
            return jax.tree.map(
                jnp.asarray, convert_checkpoint(load_dir, tag, cfg))
    if load_dir:
        from bdm_db1_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(load_dir)
        if mgr.latest_step() is not None:
            template = _random_params(cfg, model)
            state, _ = mgr.restore({"params": template})
            print_rank_0(f"restored orbax checkpoint step {mgr.latest_step()}")
            return state["params"]
    print_rank_0("WARNING: no checkpoint found — evaluating random init")
    return _random_params(cfg, model)


def _random_params(cfg: DB1Config, model: TransformerXL):
    L = cfg.model.n_position
    tok = jnp.zeros((1, L), jnp.int32)
    batch = {"rl": RLTaskBatch(tokens=tok, position_id=tok,
                               loss_mask=tok, label=tok)}
    return model.init(jax.random.PRNGKey(cfg.eval.seed), batch)["params"]


def main(cfg: Optional[DB1Config] = None) -> List[dict]:
    cfg = cfg or DB1Config.from_cli()
    from bdm_db1_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed(force=cfg.mesh.multihost)

    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    params = load_params(cfg, model)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print_rank_0(f"model parameters: {n_params:,}")

    env_names = list(cfg.eval.env_names)
    for suite in cfg.eval.task_suite_names:
        env_names.extend(suite_env_names(suite))
    print_rank_0(f"evaluating {len(env_names)} envs, "
                 f"{cfg.eval.num_trials} trials each")

    from bdm_db1_tpu.train.pretrain import build_tokenizer_suite

    tok = build_tokenizer_suite(cfg)

    # RLFullDataset construction (cache mmap + expert index) is the costly
    # part of env setup and is read-only at eval time: share one instance
    # across the num_trials wrapper instances of each env
    ds_cache = {}

    def make_tenv(name: str) -> TokenizedEnv:
        env = make_env(name)
        if name not in ds_cache:
            ds_cache[name] = build_rl_dataset_from_cache(
                name, cfg.data.rl_dataset_cache_dir, cfg.model.n_position,
                tok,
                use_prompt=cfg.eval.use_prompt,
                prompt_strategy=cfg.eval.prompt_strategy.split(";")[0],
            )
        return TokenizedEnv(
            env, ds_cache[name],
            eval_prompt_strategy=cfg.eval.prompt_strategy.split(";")[-1])

    from bdm_db1_tpu.eval.decode import DecoderPool

    mesh = None
    if cfg.eval.sharded_decode:
        from bdm_db1_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(cfg.mesh)
        print_rank_0(f"sharded decode over mesh {dict(mesh.shape)}")
    pool = DecoderPool(
        model, params, mesh=mesh,
        pad_buckets="default" if cfg.eval.decode_obs_buckets else None)
    results = []
    out_path = None
    if cfg.train.save_dir:
        os.makedirs(cfg.train.save_dir, exist_ok=True)
        out_path = os.path.join(cfg.train.save_dir, "results.output")

    def emit(res: dict) -> None:
        print_rank_0(json.dumps(res))
        results.append(res)
        if out_path:
            with open(out_path, "a") as f:
                f.write(json.dumps(res) + "\n")

    local_names = shard_envs(env_names)
    if cfg.eval.batched:
        # production path: geometry-bucketed lockstep batches — the same
        # decode path and batch size the driver benchmarks (bench.py)
        for res in evaluate_envs_lockstep(
                model, params, local_names, make_tenv,
                num_trials=cfg.eval.num_trials, seed=cfg.eval.seed,
                batch_size=cfg.eval.batch_size, decoder_pool=pool,
                use_prompt=cfg.eval.use_prompt,
                strict_length=cfg.eval.strict_length,
                minimal_expert_data=cfg.eval.minimal_expert_data,
                max_step_size=cfg.eval.max_step_size,
                interleave=cfg.eval.interleave):
            emit(res)
    else:
        for name in local_names:
            emit(evaluate_env(
                model, params, lambda n=name: make_tenv(n),
                decoder_pool=pool,
                num_trials=cfg.eval.num_trials, seed=cfg.eval.seed,
                use_prompt=cfg.eval.use_prompt,
                strict_length=cfg.eval.strict_length,
                minimal_expert_data=cfg.eval.minimal_expert_data,
                max_step_size=cfg.eval.max_step_size))

    if jax.process_count() > 1:  # pragma: no cover
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(results)
        results = [r for host in gathered for r in host]

    if cfg.eval.baselines_path and jax.process_index() == 0:
        # suite headline: fraction of tasks >= threshold of expert score
        # (reference claim: README.md:8 "76% of 870 tasks")
        from bdm_db1_tpu.eval.aggregate import aggregate_results
        from bdm_db1_tpu.eval.baselines import BaselineRegistry

        reg = BaselineRegistry.from_json(cfg.eval.baselines_path)
        summary = aggregate_results(results, reg.table,
                                    threshold=cfg.eval.score_threshold)
        emit({"suite_summary": summary})
    return results


if __name__ == "__main__":
    main()
