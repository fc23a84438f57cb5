"""Vision transform + AutoAugment + text codec tests."""

import numpy as np
from PIL import Image

from bdm_db1_tpu.data.autoaugment import ImageNetPolicy
from bdm_db1_tpu.data.text_codec import Decoder, Encoder, split_sentences
from bdm_db1_tpu.data.transforms import (
    ClassificationTransform, center_crop, to_chw_float,
)
from bdm_db1_tpu.tokenizers.text import ByteTextTokenizer


def _img(w=96, h=64):
    rng = np.random.RandomState(0)
    return Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8))


def test_train_transform_shapes():
    t = ClassificationTransform(image_size=32, train=True)
    out = t(_img())
    assert out.shape == (3, 32, 32)
    assert out.dtype == np.float32


def test_eval_transform_deterministic():
    t = ClassificationTransform(image_size=32, train=False)
    a, b = t(_img()), t(_img())
    np.testing.assert_array_equal(a, b)


def test_center_crop_geometry():
    img = center_crop(_img(100, 60), 48)
    assert img.size == (48, 48)


def test_autoaugment_runs():
    import random

    random.seed(0)
    pol = ImageNetPolicy()
    img = _img(64, 64)
    for _ in range(30):  # cycle through many sub-policies/ops
        out = pol(img)
        assert out.size == img.size


def test_text_codec_roundtrip():
    tok = ByteTextTokenizer()
    enc = Encoder(tok)
    sents = enc.encode("Hello world. How are you? Fine.")
    assert len(sents) == 3
    assert sents[-1][-1] == tok.eos_token_id  # EOD appended
    flat = enc.encode_flat("One. Two.")
    dec = Decoder(tok, max_tokens=100)
    assert dec.decode(flat).startswith("One.")

    # clip at eos
    ids = tok.encode("abc") + [tok.eos_token_id] + tok.encode("xyz")
    assert dec.decode(ids) == "abc"


def test_split_sentences_fallback():
    assert split_sentences("A b. C d! E?") == ["A b.", "C d!", "E?"]
