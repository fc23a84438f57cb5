"""Pretraining driver — the ``main()`` the reference never shipped
(reference: src/train_utils/train.py has no __main__; README.md:16
"Pretraining scripts ... will come soon"; SURVEY.md §2.9).

Usage:
    python -m bdm_db1_tpu.train.pretrain --config cfg.json \
        --data.data-path 0.8 /corpora/pile nlp 0.2 halfcheetah-medium-v2 rl \
        --train.train-iters 10000 ...

Wires: config -> tokenizers -> dataset factory -> stratified loader ->
mesh + sharded train step -> Trainer (logging, eval hooks, orbax
checkpoints with auto-resume).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from bdm_db1_tpu.core.config import DB1Config
from bdm_db1_tpu.core.logging import MetricLogger, print_rank_0
from bdm_db1_tpu.data.dataset_utils import (
    build_train_valid_test_datasets,
    register_creator,
)
from bdm_db1_tpu.data.rl_dataset import RLTokenizerSuite, make_rl_creator
from bdm_db1_tpu.data.samplers import (
    RandomSampler,
    StratifiedGatoLoader,
    mixture_counts,
)
from bdm_db1_tpu.models.transformer_xl import TransformerXL
from bdm_db1_tpu.parallel.mesh import make_mesh
from bdm_db1_tpu.tokenizers.scalar import ScalarTokenizer
from bdm_db1_tpu.tokenizers.text import build_text_tokenizer
from bdm_db1_tpu.train.step import make_optimizer, make_sharded_train_step
from bdm_db1_tpu.train.trainer import Trainer, evaluate_loss, to_gato_batch


def build_tokenizer_suite(cfg: DB1Config) -> RLTokenizerSuite:
    return RLTokenizerSuite(
        cfg.vocab.layout(),
        ScalarTokenizer(cfg.vocab.num_continuous_bin,
                        cfg.vocab.discretize_mu, cfg.vocab.discretize_M),
        build_text_tokenizer(cfg.data.tokenizer_save_path,
                             cfg.vocab.text_vocab_size),
        vision_patch_size=cfg.vision.patch_size,
    )


def build_loader(cfg: DB1Config, datasets_by_modality: Dict[str, object],
                 weights: Dict[str, float], dp_devices: int,
                 consumed: int = 0):
    """Per-process loader: yields this host's share of the global batch
    ([accum, micro * local_dp_devices, ...]); multi-host assembly into
    global arrays happens in the Trainer."""
    n_proc = jax.process_count()
    proc = jax.process_index()
    local_dp = max(1, dp_devices // n_proc)
    micro_local = cfg.train.micro_batch_size * local_dp
    counts = mixture_counts(weights, micro_local)
    accum = max(1, cfg.train.global_batch_size
                // (cfg.train.micro_batch_size * dp_devices))
    samplers = {
        m: RandomSampler(len(d), consumed, counts[m], proc, n_proc,
                         seed=cfg.train.seed)
        for m, d in datasets_by_modality.items()
    }
    return StratifiedGatoLoader(
        datasets_by_modality, samplers, counts, accum,
        num_threads=cfg.data.num_workers)


def group_by_modality(train_ds) -> Dict[str, object]:
    """The stratified loader wants one dataset per SHAPE-HOMOGENEOUS
    group; the blendable mixture already proportions inside each group.

    RL splits into sub-modality groups by image schema: proprioceptive
    samples carry no ``images`` field while image-env samples carry a
    fixed ``[T, H, W, C]`` frame window, and one micro-batch stack needs
    identical pytrees — so image RL rides as ``rl_img<shape>`` groups
    that the model routes to the same embedder
    (models/transformer_xl.py embed_concat sub-modality dispatch)."""
    # The dataset factory returns a blended dataset; per-modality grouping
    # happens at the creator level. For the common case we inspect a probe
    # sample per sub-dataset.
    def group_key(probe) -> str:
        m = probe.get("modality", "rl")
        if m == "rl" and "images" in probe:
            shape = "x".join(str(s) for s in probe["images"].shape)
            return f"rl_img{shape}"
        return m

    if hasattr(train_ds, "datasets"):
        groups: Dict[str, list] = {}
        for d, w in zip(train_ds.datasets, train_ds.weights):
            m = group_key(d[0])
            groups.setdefault(m, []).append((d, float(w)))
        out = {}
        weights = {}
        for m, pairs in groups.items():
            if len(pairs) == 1:
                out[m] = pairs[0][0]
            else:
                from bdm_db1_tpu.data.blendable import BlendableDataset

                out[m] = BlendableDataset(
                    [p[0] for p in pairs], [p[1] for p in pairs],
                    mode="index",
                    size=sum(len(p[0]) for p in pairs))
            weights[m] = sum(p[1] for p in pairs)
        return out, weights
    m = group_key(train_ds[0])
    return {m: train_ds}, {m: 1.0}


def main(cfg: Optional[DB1Config] = None) -> None:
    cfg = cfg or DB1Config.from_cli()
    from bdm_db1_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed(force=cfg.mesh.multihost)

    print_rank_0(f"devices: {len(jax.devices())} x "
                 f"{jax.devices()[0].platform}")
    mesh = make_mesh(cfg.mesh)
    dp_size = mesh.shape["data"]

    tok = build_tokenizer_suite(cfg)
    if cfg.data.rl_dataset_cache_dir:
        rl_creator, suite_creator = make_rl_creator(
            tok, cfg.data.rl_dataset_cache_dir,
            num_fewshot_episodes=cfg.data.num_rl_fewshot_episodes,
            use_prompt=cfg.data.use_prompt,
            prompt_ratio=cfg.data.prompt_ratio,
            prompt_prob=cfg.data.prompt_prob,
            prompt_at_final_transition_prob=(
                cfg.data.prompt_at_final_transition_prob),
            prompt_strategy=cfg.data.prompt_strategy.split(";")[0])
        register_creator("rl", rl_creator)
        register_creator("rl_task_suite", suite_creator)

    if any(t in cfg.data.data_path for t in ("ic", "vqa")):
        from bdm_db1_tpu.data.vit_dataset import (
            make_ic_creator, make_vqa_creator,
        )

        eos = tok.text_tokenizer.eos_token_id
        register_creator("ic", make_ic_creator(
            n_position=cfg.model.n_position,
            image_size=cfg.vision.image_size,
            patch_size=cfg.vision.patch_size, eos_token_id=eos))
        register_creator("vqa", make_vqa_creator(
            n_position=cfg.model.n_position,
            image_size=cfg.vision.image_size,
            patch_size=cfg.vision.patch_size, eos_token_id=eos))

    n_train = cfg.train.train_iters * cfg.train.global_batch_size
    train_ds, valid_ds, _, valid_no_blend = build_train_valid_test_datasets(
        cfg.data.data_path, cfg.data.split, cfg.data.seq_length,
        (n_train, cfg.train.eval_iters * cfg.train.global_batch_size, 0),
        cfg.train.seed, cfg.train.global_batch_size,
        cache_dir=cfg.data.rl_dataset_cache_dir)

    datasets, weights = group_by_modality(train_ds)
    loader = build_loader(cfg, datasets, weights, dp_size)

    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    tx = make_optimizer(cfg.train.optimizer, cfg.train.train_iters)
    example = to_gato_batch(next(loader))
    init_fn, step_fn = make_sharded_train_step(
        model, tx, jax.random.PRNGKey(cfg.train.seed), example, mesh,
        pipeline_microbatches=cfg.mesh.pipeline_microbatches)
    state = init_fn(example)
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(state.params))
    print_rank_0(f"model parameters: {n_params:,}")

    def eval_fn(state, iteration):
        """valid loss + optional RL episode rollouts
        (reference: train.py:86-207 evaluate_and_print_results)."""
        out = {}
        if valid_ds is not None:
            vd, vw = group_by_modality(valid_ds)
            vloader = build_loader(cfg, vd, vw, dp_size)
            batches = [next(vloader) for _ in range(cfg.train.eval_iters)]
            vloader.stop()
            out["loss"] = evaluate_loss(model, state, batches)
        if cfg.eval.env_names and jax.process_index() == 0:
            from bdm_db1_tpu.data.rl_dataset import build_rl_dataset_from_cache
            from bdm_db1_tpu.eval.envs import make_env
            from bdm_db1_tpu.eval.harness import evaluate_env
            from bdm_db1_tpu.eval.wrapper import TokenizedEnv

            params = state.params
            for name in cfg.eval.env_names:
                def make_tenv(n=name):
                    ds = build_rl_dataset_from_cache(
                        n, cfg.data.rl_dataset_cache_dir,
                        cfg.model.n_position, tok,
                        use_prompt=cfg.eval.use_prompt)
                    return TokenizedEnv(make_env(n), ds)

                res = evaluate_env(
                    model, params, make_tenv,
                    num_trials=cfg.eval.num_trials, seed=cfg.eval.seed,
                    max_step_size=cfg.eval.max_step_size)
                out[f"return/{name}"] = res["return_mean"]
                out[f"length/{name}"] = res["length_mean"]
        # in-training IC/VQA metrics on the (unblended) valid splits
        # (reference: train.py:24-25, 173-207 runs caption/VQA eval from
        # the train loop at the eval cadence)
        n_icvqa = cfg.eval.ic_vqa_num_samples
        if n_icvqa and valid_no_blend and jax.process_index() == 0:
            layout = cfg.vocab.layout()
            eos = tok.text_tokenizer.eos_token_id
            for i, ds in enumerate(valid_no_blend.get("ic", [])):
                from bdm_db1_tpu.eval.evaluate_ic import evaluate_ic

                metrics = evaluate_ic(
                    model, state.params, ds, layout, eos,
                    num_samples=n_icvqa,
                    batch_size=cfg.eval.ic_vqa_batch_size)
                for k, v in metrics.items():
                    out[f"ic{i}/{k}"] = v
            for i, ds in enumerate(valid_no_blend.get("vqa", [])):
                from bdm_db1_tpu.eval.evaluate_vqa import evaluate_vqa

                metrics = evaluate_vqa(
                    model, state.params, ds, layout, eos,
                    text_tokenizer=tok.text_tokenizer,
                    num_samples=n_icvqa,
                    batch_size=cfg.eval.ic_vqa_batch_size)
                for k, v in metrics.items():
                    out[f"vqa{i}/{k}"] = v
        return out

    logger = MetricLogger(cfg.train.save_dir, cfg.train.tensorboard_dir)
    trainer = Trainer(cfg, model, step_fn, state, loader,
                      eval_fn=eval_fn, logger=logger, mesh=mesh)
    trainer.train()
    loader.stop()
    print_rank_0("training complete")


if __name__ == "__main__":
    main()
