"""Parity tests for the mu-law scalar tokenizer against the exact reference
formulas (reference: src/tokenizer/scalar_tokenizer.py:28-63), including a
torch-based oracle replicating the reference arithmetic."""

import numpy as np
import pytest

from bdm_db1_tpu.tokenizers.scalar import ScalarTokenizer


def _reference_discretize(x, is_action, num_bins=1024, mu=100.0, M=256.0):
    """Oracle: the reference formula evaluated with torch semantics."""
    import torch

    x = torch.from_numpy(np.asarray(x, dtype=np.float32))
    if not is_action:
        x = (
            torch.sign(x)
            * torch.log(torch.abs(x) * mu + 1.0)
            / torch.log(torch.tensor(mu * M + 1.0))
        )
        x = torch.clamp(x, -1, 1)
    x = ((x + 1) / 2 * num_bins).int()
    return torch.clamp(x, 0, num_bins - 1).numpy()


def _reference_decode(bins, is_action, num_bins=1024, mu=100.0, M=256.0):
    import torch

    x = torch.from_numpy(np.asarray(bins)).float()
    x = (x / num_bins) * 2 - 1
    if not is_action:
        x = torch.sign(x) * ((1 + M * mu) ** torch.abs(x) - 1) / mu
    return x.numpy()


@pytest.mark.parametrize("is_action", [False, True])
def test_discretize_matches_reference(is_action):
    tok = ScalarTokenizer()
    rng = np.random.RandomState(0)
    x = np.concatenate([
        rng.randn(512) * 3.0,
        rng.uniform(-1, 1, 256),
        np.array([0.0, 1.0, -1.0, 1e-8, -1e-8, 100.0, -100.0, 1e6, -1e6]),
    ]).astype(np.float32)
    ours = tok.discretize_np(x, is_action=is_action)
    ref = _reference_discretize(x, is_action=is_action)
    np.testing.assert_array_equal(ours, ref)
    # jax path: allow 1-ulp log() differences to flip a bin at boundaries
    ours_jax = np.asarray(tok.discretize(x, is_action=is_action))
    diff = np.abs(ours_jax.astype(np.int64) - ref.astype(np.int64))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.01


@pytest.mark.parametrize("is_action", [False, True])
def test_decode_matches_reference(is_action):
    tok = ScalarTokenizer()
    bins = np.arange(1024)
    ours = tok.decode_np(bins, is_action=is_action)
    ref = _reference_decode(bins, is_action=is_action)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    ours_jax = np.asarray(tok.decode(bins, is_action=is_action))
    np.testing.assert_allclose(ours_jax, ref, rtol=1e-5, atol=1e-6)


def test_roundtrip_error_bounded():
    tok = ScalarTokenizer()
    x = np.linspace(-0.99, 0.99, 1001).astype(np.float32)
    rec = tok.decode_np(tok.discretize_np(x, True), True)
    assert np.abs(rec - x).max() < 2.0 / 1024 + 1e-5
