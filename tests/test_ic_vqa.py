"""IC/VQA stack tests: dataset packing, caption metrics, generation loops,
and mixed-modality training with ic/vqa groups."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bdm_db1_tpu.core.config import db1_tiny
from bdm_db1_tpu.data.coco import (
    ICDataset, RandomCOCO, ic_caption_budget, ic_loss_mask_and_labels,
)
from bdm_db1_tpu.data.input_specs import ICTaskBatch, VQATaskBatch
from bdm_db1_tpu.data.vqa import VQA, CocoVQA, VQADataset, vqa_loss_mask
from bdm_db1_tpu.eval.metrics import (
    VQAEval, corpus_bleu, evaluate_captions, rouge_l, vqa_accuracy,
)
from bdm_db1_tpu.models.transformer_xl import TransformerXL


def _tiny_cfg():
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    return cfg


def _coco_fixture(tmp_path, cfg, n_images=3):
    p = cfg.vision.patch_size
    hw = 2 * p  # 4 patches
    rng = np.random.RandomState(0)
    images = [{
        "id": i, "file_name": f"{i}.jpg",
        "pixels": rng.rand(3, hw, hw).astype(np.float32).tolist(),
    } for i in range(n_images)]
    anns = []
    for i in range(n_images):
        for c in range(2):
            anns.append({"image_id": i,
                         "caption": [10 + i, 20 + c, 30, 0]})
    data = {"images": images, "annotations": anns,
            "prompt_items": [[1, 2], [3], [4]]}
    path = tmp_path / "captions.json"
    path.write_text(json.dumps(data))
    return str(path), hw


def test_ic_dataset_packing(tmp_path):
    cfg = _tiny_cfg()
    ann, hw = _coco_fixture(tmp_path, cfg)
    L = cfg.model.n_position  # 64
    budget = ic_caption_budget(L, hw, cfg.vision.patch_size)
    assert budget == L - 4 + 1
    coco = RandomCOCO("", ann, seq_length=budget)
    ds = ICDataset(coco, eos_token_id=0, n_position=L)
    item = ds[0]
    prompt_len = 2
    text_len = budget - prompt_len - 1
    assert item["text"].shape == (text_len,)
    # packed length = prompt + patches + text == n_position
    assert prompt_len + 4 + text_len == L
    assert item["label"].shape == (L,)
    assert item["loss_mask"].shape == (L,)
    assert item["images"].shape == (hw, hw, 3)
    # loss only over the caption tail
    assert item["loss_mask"][: L - text_len - 1].sum() == 0
    assert item["loss_mask"].sum() > 0


def test_ic_loss_mask_alignment():
    cap = np.array([5, 6, 7, 0, 0], np.int32)
    tokens, mask, labels = ic_loss_mask_and_labels(cap, 0, 12)
    assert tokens.tolist() == [5, 6, 7, 0]
    # labels right-aligned, one before the text region
    assert labels[-5:].tolist() == [5, 6, 7, 0, 0]
    assert mask[-5] == 1.0  # predicts first caption token
    assert mask[-1] == 0.0  # eod padding carries no loss


def _vqa_fixture(tmp_path, cfg):
    p = cfg.vision.patch_size
    hw = 2 * p
    rng = np.random.RandomState(1)
    images = [{"id": i, "file_name": f"{i}.jpg",
               "pixels": rng.rand(3, hw, hw).astype(np.float32).tolist()}
              for i in range(2)]
    annotations = [{
        "question_id": 100 + i, "image_id": i,
        "answer_type": "other", "question_type": "what",
        "answers": [{"answer": "7"}] * 10,
        "answer_tokens": [[7, 0]],
    } for i in range(2)]
    questions = [{"question_id": 100 + i, "image_id": i,
                  "question_tokens": [40 + i, 41]} for i in range(2)]
    ann_path = tmp_path / "vqa_ann.json"
    ann_path.write_text(json.dumps({
        "annotations": annotations, "images": images,
        "prompt_items": [[1, 2], [3], [4]]}))
    q_path = tmp_path / "vqa_q.json"
    q_path.write_text(json.dumps({"questions": questions}))
    return str(ann_path), str(q_path), hw


def test_vqa_dataset_packing(tmp_path):
    cfg = _tiny_cfg()
    ann, q, hw = _vqa_fixture(tmp_path, cfg)
    L = cfg.model.n_position
    budget = ic_caption_budget(L, hw, cfg.vision.patch_size)
    coco_vqa = CocoVQA("", ann, q, seq_length=budget)
    ds = VQADataset(coco_vqa, eos_token_id=0, n_position=L)
    item = ds[0]
    assert item["text"].shape[0] + 2 + 4 == L  # prompt(2)+patches(4)+text
    assert item["ques_len"] == 4  # prefix(1)+question(2)+suffix(1)
    assert item["loss_mask"].sum() > 0
    assert item["label"].max() == 7


def test_vqa_api_load_res(tmp_path):
    cfg = _tiny_cfg()
    ann, q, hw = _vqa_fixture(tmp_path, cfg)
    vqa = VQA(ann, q)
    assert sorted(vqa.get_ques_ids()) == [100, 101]
    assert vqa.get_img_ids(100) == [0]
    res_path = tmp_path / "res.json"
    res_path.write_text(json.dumps(
        [{"question_id": 100, "answer": "7"},
         {"question_id": 101, "answer": "8"}]))
    res = vqa.load_res(str(res_path))
    ev = VQAEval(vqa, res)
    overall = ev.evaluate()
    assert overall == 50.0  # one exact match of two


def test_caption_metrics_sanity():
    hyp = [["a", "cat", "on", "a", "mat"]]
    refs = [[["a", "cat", "on", "a", "mat"], ["a", "cat", "sits"]]]
    b = corpus_bleu(hyp, refs)
    assert b[0] == pytest.approx(1.0)
    assert b[3] == pytest.approx(1.0)
    assert rouge_l(hyp, refs) == pytest.approx(1.0)
    # CIDEr needs a corpus > 1 image for nonzero idf
    scores = evaluate_captions(
        {0: hyp[0], 1: ["a", "dog", "runs"]},
        {0: refs[0], 1: [["a", "dog", "runs"], ["the", "dog", "running"]]})
    assert scores["Bleu_1"] > 0.9
    assert scores["CIDEr"] > 0

    worse = corpus_bleu([["a", "dog"]], refs)
    assert worse[3] < 0.5


def test_vqa_accuracy_metric():
    assert vqa_accuracy("7", ["7"] * 10) == 1.0
    assert vqa_accuracy("8", ["7"] * 10) == 0.0
    assert 0 < vqa_accuracy("7", ["7"] * 2 + ["8"] * 8) < 1.0
    assert vqa_accuracy("The cat", ["cat"]) == 1.0  # article normalization


def test_model_ic_vqa_forward_and_generation(tmp_path):
    cfg = _tiny_cfg()
    ann, hw = _coco_fixture(tmp_path, cfg)
    L = cfg.model.n_position
    budget = ic_caption_budget(L, hw, cfg.vision.patch_size)
    coco = RandomCOCO("", ann, seq_length=budget)
    ic_ds = ICDataset(coco, eos_token_id=0, n_position=L)

    items = [ic_ds[i] for i in range(2)]
    batch = {"ic": ICTaskBatch(
        prompt=jnp.asarray(np.stack([it["prompt"] for it in items])),
        images=jnp.asarray(np.stack([it["images"] for it in items])),
        text=jnp.asarray(np.stack([it["text"] for it in items])),
        loss_mask=jnp.asarray(np.stack([it["loss_mask"] for it in items])),
        label=jnp.asarray(np.stack([it["label"] for it in items])),
    )}
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    params = model.init(jax.random.PRNGKey(0), batch)["params"]
    logits, loss = model.apply({"params": params}, batch)
    assert logits.shape[:2] == (2, L)
    assert jnp.isfinite(loss)

    # greedy caption generation end-to-end
    from bdm_db1_tpu.eval.evaluate_ic import evaluate_ic

    scores = evaluate_ic(model, params, ic_ds, cfg.vocab.layout(),
                         eos_token_id=0, num_samples=2, batch_size=2)
    assert set(scores) >= {"Bleu_1", "Bleu_4", "CIDEr", "ROUGE_L"}


def test_vqa_generation(tmp_path):
    cfg = _tiny_cfg()
    ann, q, hw = _vqa_fixture(tmp_path, cfg)
    L = cfg.model.n_position
    budget = ic_caption_budget(L, hw, cfg.vision.patch_size)
    coco_vqa = CocoVQA("", ann, q, seq_length=budget)
    ds = VQADataset(coco_vqa, eos_token_id=0, n_position=L)
    items = [ds[i] for i in range(2)]
    batch = {"vqa": VQATaskBatch(
        prompt=jnp.asarray(np.stack([it["prompt"] for it in items])),
        images=jnp.asarray(np.stack([it["images"] for it in items])),
        text=jnp.asarray(np.stack([it["text"] for it in items])),
        ques_len=jnp.asarray(np.stack([it["ques_len"] for it in items])),
        loss_mask=jnp.asarray(np.stack([it["loss_mask"] for it in items])),
        label=jnp.asarray(np.stack([it["label"] for it in items])),
    )}
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    params = model.init(jax.random.PRNGKey(1), batch)["params"]
    _, loss = model.apply({"params": params}, batch)
    assert jnp.isfinite(loss)

    from bdm_db1_tpu.eval.evaluate_vqa import evaluate_vqa

    out = evaluate_vqa(model, params, ds, cfg.vocab.layout(),
                       eos_token_id=0, num_samples=2, batch_size=2)
    assert "vqa_accuracy" in out and out["num_evaluated"] == 2.0


def test_vit_dataset_factories(tmp_path):
    from bdm_db1_tpu.data.vit_dataset import (
        get_ic_coco_dataset, make_ic_creator,
    )

    cfg = _tiny_cfg()
    ann, hw = _coco_fixture(tmp_path, cfg)
    ds = get_ic_coco_dataset(
        "", ann, n_position=cfg.model.n_position, image_size=hw,
        patch_size=cfg.vision.patch_size)
    item = ds[0]
    assert item["modality"] == "ic"
    assert item["label"].shape == (cfg.model.n_position,)

    creator = make_ic_creator(n_position=cfg.model.n_position,
                              image_size=hw,
                              patch_size=cfg.vision.patch_size)
    tr, va, te = creator(f":{ann}", "90,5,5", 64, (1, 1, 1), 0)
    assert len(tr) == len(va) == 3


def test_random_seed_dataset():
    import random

    from bdm_db1_tpu.data.samplers import RandomSeedDataset

    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return random.random()

    ds = RandomSeedDataset(DS(), base_seed=5)
    a, b = ds[3], ds[3]
    assert a == b            # same index -> same augmentation stream
    assert ds[4] != ds[3]
