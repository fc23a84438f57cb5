"""End-to-end training integration: stratified mixed-modality loader ->
sharded train step -> trainer loop with checkpointing."""

import glob
import os

import jax
import numpy as np
import pytest

from bdm_db1_tpu.core.config import OptimizerConfig, db1_tiny
from bdm_db1_tpu.data.indexed_dataset import make_builder
from bdm_db1_tpu.data.dataset_utils import NLPSampleAdapter, build_nlp_splits
from bdm_db1_tpu.data.rl_dataset import (
    RLFullDataset, RLTokenizerSuite, TrajectoryStore, split_rl_dataset,
)
from bdm_db1_tpu.data.samplers import (
    RandomSampler, StratifiedGatoLoader, mixture_counts,
)
from bdm_db1_tpu.eval.envs import FakeContinuousEnv
from bdm_db1_tpu.models.transformer_xl import TransformerXL
from bdm_db1_tpu.parallel.mesh import make_mesh
from bdm_db1_tpu.tokenizers.scalar import ScalarTokenizer
from bdm_db1_tpu.tokenizers.text import ByteTextTokenizer
from bdm_db1_tpu.train.step import make_optimizer, make_sharded_train_step
from bdm_db1_tpu.train.trainer import Trainer, to_gato_batch


def test_mixture_counts():
    c = mixture_counts({"nlp": 0.6, "rl": 0.4}, 8)
    assert c == {"nlp": 5, "rl": 3} or c == {"nlp": 4, "rl": 4}
    assert sum(c.values()) == 8
    c2 = mixture_counts({"nlp": 1.0}, 4)
    assert c2 == {"nlp": 4}


@pytest.fixture(scope="module")
def mixed_setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("trainer")
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    L = cfg.model.n_position

    rng = np.random.RandomState(0)
    prefix = str(tmp_path / "corpus")
    b = make_builder(prefix, vocab_size=cfg.vocab.text_vocab_size)
    for _ in range(40):
        b.add_item(rng.randint(1, 200, size=80))
        b.end_document()
    b.finalize()
    nlp_tr, _, _ = build_nlp_splits(prefix, "90,5,5", L, (200, 8, 8), 0,
                                    cache_dir=str(tmp_path / "maps"))
    nlp_tr = NLPSampleAdapter(nlp_tr)

    env = FakeContinuousEnv(obs_dim=4, act_dim=2, episode_len=10)
    store = TrajectoryStore.from_flat_dataset(env.make_dataset(6))
    suite = RLTokenizerSuite(
        cfg.vocab.layout(), ScalarTokenizer(cfg.vocab.num_continuous_bin),
        ByteTextTokenizer(), vision_patch_size=cfg.vision.patch_size)
    rl_full = RLFullDataset("fake", store, suite, seq_length=L,
                            use_prompt=True, seed=0)
    rl_tr, _, _ = split_rl_dataset(rl_full, "90,5,5", seed=0)
    return cfg, {"nlp": nlp_tr, "rl": rl_tr}, tmp_path


def test_stratified_loader_fixed_structure(mixed_setup):
    cfg, datasets, _ = mixed_setup
    counts = mixture_counts({"nlp": 0.5, "rl": 0.5}, 4)
    samplers = {m: RandomSampler(len(d), 0, counts[m], 0, 1, seed=1)
                for m, d in datasets.items()}
    loader = StratifiedGatoLoader(datasets, samplers, counts, accum_steps=2)
    b1 = next(loader)
    b2 = next(loader)
    loader.stop()
    assert set(b1) == {"nlp", "rl"}
    for m in b1:
        for k in b1[m]:
            assert b1[m][k].shape == b2[m][k].shape
    assert b1["rl"]["tokens"].shape == (2, counts["rl"],
                                        cfg.model.n_position)


def test_trainer_loop_mixed(mixed_setup):
    cfg, datasets, tmp_path = mixed_setup
    cfg.mesh.model_parallel = 2
    cfg.train.train_iters = 6
    cfg.train.log_interval = 2
    cfg.train.save_interval = 3
    cfg.train.save_dir = str(tmp_path / "run1")
    mesh = make_mesh(cfg.mesh)

    # per-modality micro counts must divide the data-parallel axis (4)
    counts = mixture_counts({"nlp": 0.5, "rl": 0.5}, 8)
    samplers = {m: RandomSampler(len(d), 0, counts[m], 0, 1, seed=1)
                for m, d in datasets.items()}
    loader = StratifiedGatoLoader(datasets, samplers, counts, accum_steps=2)

    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    tx = make_optimizer(OptimizerConfig(lr=3e-3, lr_decay_style="constant"),
                        cfg.train.train_iters)
    example = to_gato_batch(next(loader))
    init_fn, step_fn = make_sharded_train_step(
        model, tx, jax.random.PRNGKey(0), example, mesh)
    state = init_fn(example)

    trainer = Trainer(cfg, model, step_fn, state, loader)
    trainer.train()
    loader.stop()
    assert int(trainer.state.step) == 6
    assert os.path.exists(os.path.join(cfg.train.save_dir, "6"))
    metrics = open(os.path.join(cfg.train.save_dir, "metrics.jsonl")).read()
    assert "train/loss" in metrics

    # resume picks up at the saved iteration
    trainer2 = Trainer(cfg, model, step_fn, init_fn(example), loader)
    it = trainer2.maybe_resume()
    assert it == 6


def test_evaluate_loss_accum_micro_layout():
    """evaluate_loss consumes loader-layout batches ([accum, micro, ...])
    one accum slice at a time — feeding the 3D/5D arrays straight into the
    model was a latent crash for every modality (found via the r3 IC
    eval-tick test)."""
    import jax.numpy as jnp

    from bdm_db1_tpu.data.input_specs import NLPTaskBatch
    from bdm_db1_tpu.train.step import init_train_state
    from bdm_db1_tpu.train.trainer import evaluate_loss

    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    L = cfg.model.n_position
    toks1 = jnp.ones((1, 2, L), jnp.int32)
    init_batch = {"nlp": NLPTaskBatch(
        tokens=toks1, loss_mask=jnp.ones_like(toks1, jnp.float32),
        label=toks1)}
    tx = make_optimizer(OptimizerConfig(lr=1e-3), 10)
    state = init_train_state(model, tx, jax.random.PRNGKey(0), init_batch)

    rng = np.random.RandomState(0)
    toks = rng.randint(1, cfg.vocab.layout().total_vocab_size,
                       (2, 2, L)).astype(np.int32)
    raw = {"nlp": {"tokens": toks,
                   "loss_mask": np.ones((2, 2, L), np.float32),
                   "label": toks}}
    loss = evaluate_loss(model, state, [raw])
    assert np.isfinite(loss)
    # equals the mean over the two accum slices evaluated independently
    halves = []
    for a in range(2):
        sub = {"nlp": {k: v[a][None] for k, v in raw["nlp"].items()}}
        halves.append(evaluate_loss(model, state, [sub]))
    assert loss == pytest.approx(float(np.mean(halves)), rel=1e-6)
