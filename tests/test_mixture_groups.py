"""Sub-modality groups: proprio RL and image RL ride one jitted step as
separate shape-homogeneous groups ("rl" + "rl_img"), routed to the same
embedder.

The jitted train step needs every modality group fixed-shape and
fixed-count per micro-batch; proprio samples carry no ``images`` field
while image-env samples carry a fixed frame window, so they can never
stack into one group. The reference's ``my_collate_fn`` groups by
dataclass type and has the same constraint (reference:
src/data/data_samplers.py:28-42) — and its pretrain driver was never
shipped, so mixing the two was never actually exercised there.
"""

import jax
import jax.numpy as jnp
import numpy as np

from bdm_db1_tpu.core.config import db1_tiny
from bdm_db1_tpu.data.rl_dataset import (
    RLFullDataset, RLTokenizerSuite, TrajectoryStore,
)
from bdm_db1_tpu.eval.envs import FakeContinuousEnv, FakeImageEnv
from bdm_db1_tpu.models.transformer_xl import TransformerXL
from bdm_db1_tpu.tokenizers.scalar import ScalarTokenizer
from bdm_db1_tpu.tokenizers.text import ByteTextTokenizer
from bdm_db1_tpu.train.trainer import to_gato_batch


def _suite(cfg):
    return RLTokenizerSuite(
        cfg.vocab.layout(), ScalarTokenizer(cfg.vocab.num_continuous_bin),
        ByteTextTokenizer(), vision_patch_size=cfg.vision.patch_size)


def _rl_datasets(cfg):
    suite = _suite(cfg)
    L = cfg.model.n_position
    hw = 2 * cfg.vision.patch_size
    rl = RLFullDataset(
        "proprio", TrajectoryStore.from_flat_dataset(
            FakeContinuousEnv(obs_dim=4, act_dim=2, episode_len=20,
                              seed=1).make_dataset(3)),
        suite, seq_length=L, use_prompt=False, seed=0)
    rl_img = RLFullDataset(
        "imgenv", TrajectoryStore.from_flat_dataset(
            FakeImageEnv(hw=hw, n_actions=4, episode_len=10,
                         seed=2).make_dataset(3)),
        suite, seq_length=L, use_prompt=False, seed=0)
    return rl, rl_img


def test_rl_and_rl_img_groups_forward():
    """One forward over {"rl", "rl_img"}: the sub-modality key routes to
    embed_rl, the vision tower runs for the image group only, loss is
    finite, and logits cover both groups' rows."""
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    rl, rl_img = _rl_datasets(cfg)
    raw = {
        "rl": {k: np.stack([rl[0][k], rl[1][k]])
               for k in rl[0] if k != "modality"},
        "rl_img": {k: np.stack([rl_img[0][k], rl_img[1][k]])
                   for k in rl_img[0] if k != "modality"},
    }
    batch = to_gato_batch(raw)
    assert batch["rl_img"].images is not None
    assert batch["rl"].images is None
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    logits, loss = jax.jit(
        lambda p, b: model.apply({"params": p}, b))(params, batch)
    assert logits.shape[0] == 4  # 2 rl rows + 2 rl_img rows
    assert np.isfinite(float(loss))


def test_group_key_splits_rl_by_image_schema():
    from bdm_db1_tpu.data.blendable import BlendableDataset
    from bdm_db1_tpu.data.dataset_utils import RLSampleAdapter
    from bdm_db1_tpu.train.pretrain import group_by_modality

    cfg = db1_tiny()
    rl, rl_img = _rl_datasets(cfg)
    blended = BlendableDataset(
        [RLSampleAdapter(rl), RLSampleAdapter(rl_img)], [0.5, 0.5],
        mode="index", size=len(rl) + len(rl_img))
    groups, weights = group_by_modality(blended)
    keys = sorted(groups)
    assert keys[0] == "rl" and keys[1].startswith("rl_img")
    assert abs(sum(weights.values()) - 1.0) < 1e-6
    # each group is shape-homogeneous
    assert "images" not in groups["rl"][0]
    assert "images" in groups[keys[1]][0]


def test_mixture_train_step_with_sub_modalities():
    """The sharded train step compiles and runs over all five groups
    (rl, rl_img, nlp, ic, vqa) — the bench.py train-mixture workload in
    miniature, via the same loader machinery."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "bench.py", "--smoke", "--mode", "train-mixture"],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
        cwd=__import__("os").path.join(__import__("os").path.dirname(
            __file__), ".."))
    assert proc.returncode == 0, proc.stderr[-2000:]
    import json
    recs = [json.loads(ln) for ln in proc.stdout.splitlines()
            if ln.startswith("{")]
    rec = recs[-1]
    assert rec["metric"] == "pretrain_tokens_per_sec_per_chip_smoke_mixture"
    assert rec["value"] > 0 and rec["loader_tokens_per_sec"] > 0
    assert sorted(rec["groups"]) == ["ic", "nlp", "rl", "rl_img", "vqa"]
    assert len(set(rec["groups"].values())) == 1  # uniform rows/group
