"""Geometry-bucket coarsening: padded decode == unpadded decode, and
different obs lengths share one compiled program per bucket.

The 870-env suite splinters into ~60 distinct steady-prime shapes
(eval/geometry_census.py); at 1.2B each costs a 10-15 min remote-AOT
compile. ``ActionDecoder(pad_buckets=...)`` pads the steady prime (and a
chunked episode-start prime's last slice) to canonical widths with
QUERY-ONLY rows — ``decode_rl_kv_ring real_q`` reads the first-action
logits at the real last token and commits/advances past real rows only —
so padding is exact, not approximate (reference workload:
src/evaluation/evaluate_rl.py:177-258; obs lengths per env:
evaluate_rl.py:269-283; SURVEY.md §7 hard part 5).
"""

import dataclasses

import numpy as np

from bdm_db1_tpu.eval.decode import (
    DEFAULT_OBS_BUCKETS, DecoderPool, _bucket_for, build_decoder_for_env,
)
from bdm_db1_tpu.eval.envs import FakeContinuousEnv, FakeDiscreteEnv
from bdm_db1_tpu.models.transformer_xl import TransformerXL

from test_batched_eval import _setup
from test_speculative import _chain, _episode_primes


def _variant(cfg, model, **over):
    return TransformerXL(dataclasses.replace(model.cfg, **over),
                         cfg.vocab, cfg.vision)


def _assert_chains_equal(ref, got, tag=""):
    for k, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a, b, err_msg=f"{tag} step {k}")


def test_bucket_for_ladder():
    assert _bucket_for(6, DEFAULT_OBS_BUCKETS) == 8
    assert _bucket_for(8, DEFAULT_OBS_BUCKETS) == 8
    assert _bucket_for(25, DEFAULT_OBS_BUCKETS) == 32
    assert _bucket_for(300, DEFAULT_OBS_BUCKETS) is None


def test_bucketed_matches_unpadded_xla():
    """Steady primes pad 6 -> 8 and the greedy chain is identical,
    including cursor wrap (episode long enough to lap mem_len=32)."""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 3, obs_dim=4, act_dim=2, episode_len=10)
    xmodel = _variant(cfg, model, decode_flash="off")
    primes = _episode_primes(tenvs, 0, 8, 4)
    ref = _chain(build_decoder_for_env(xmodel, params, tenvs[0]),
                 primes, defer=True)
    pdec = build_decoder_for_env(xmodel, params, tenvs[0],
                                 pad_buckets="default")
    assert pdec.pad_buckets == DEFAULT_OBS_BUCKETS
    got = _chain(pdec, primes, defer=True)
    _assert_chains_equal(ref, got, "xla")


def test_bucketed_matches_unpadded_no_defer():
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 2, obs_dim=4, act_dim=3, episode_len=8)
    xmodel = _variant(cfg, model, decode_flash="off")
    primes = _episode_primes(tenvs, 1, 6, 4)
    ref = _chain(build_decoder_for_env(xmodel, params, tenvs[0]),
                 primes, defer=False)
    got = _chain(build_decoder_for_env(xmodel, params, tenvs[0],
                                       pad_buckets="default"),
                 primes, defer=False)
    _assert_chains_equal(ref, got, "no-defer")


def test_bucketed_matches_flash():
    """The fused ring kernels run with padded prime widths (pads are just
    extra query columns; commit masking happens outside the kernel)."""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 2, obs_dim=4, act_dim=2, episode_len=8)
    fmodel = _variant(cfg, model, decode_flash="on")
    primes = _episode_primes(tenvs, 0, 6, 4)
    ref = _chain(build_decoder_for_env(fmodel, params, tenvs[0]),
                 primes, defer=True)
    got = _chain(build_decoder_for_env(fmodel, params, tenvs[0],
                                       pad_buckets="default"),
                 primes, defer=True)
    _assert_chains_equal(ref, got, "flash")


def test_bucketed_matches_int8_cache():
    """Quantized caches: pad rows re-write the slot's current k/v AND
    scale values, so the int8 ring stays bit-identical to unpadded."""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 2, obs_dim=4, act_dim=2, episode_len=8)
    qmodel = _variant(cfg, model, decode_flash="off",
                      decode_cache_dtype="int8")
    primes = _episode_primes(tenvs, 0, 6, 4)
    ref = _chain(build_decoder_for_env(qmodel, params, tenvs[0]),
                 primes, defer=True)
    got = _chain(build_decoder_for_env(qmodel, params, tenvs[0],
                                       pad_buckets="default"),
                 primes, defer=True)
    _assert_chains_equal(ref, got, "int8")


def test_bucketed_discrete_env_with_mask():
    """Discrete geometry: the logit bias (incl. a per-step env action
    mask) is an operand, so bucketing composes with masking."""
    cfg, model, params, tenvs = _setup(
        FakeDiscreteEnv, 2, obs_dim=5, n_actions=4, episode_len=8)
    xmodel = _variant(cfg, model, decode_flash="off")
    # discrete obs are ints in [0, 8): build the fixed prime stream by
    # hand (the shared helper draws gaussian continuous obs)
    rng = np.random.RandomState(0)
    sep = np.array([tenvs[0].separator_id], dtype=np.int64)
    starts = []
    for te in tenvs:
        prompt, _ = te.get_prompt(strict_length=True, rng=rng)
        obs, _, _ = te.reset()
        starts.append(np.concatenate([prompt, obs, sep]))
    primes = [np.stack(starts)]
    for _ in range(5):
        raws = [rng.randint(0, 8, 5).astype(np.int64) for _ in tenvs]
        obs_tok, _ = tenvs[0].encode_obs_batch(raws)
        primes.append(np.concatenate(
            [obs_tok, np.broadcast_to(sep, (2, 1))], axis=1))
    mask = np.array([[1, 1, 0, 1], [0, 1, 1, 1]], np.float32)

    def chain(dec):
        mems = dec.init_mems(2)
        acts = []
        for p in primes:
            a, mems = dec.decode(p, mems, env_action_mask=mask)
            acts.append(np.asarray(a))
        return acts

    ref = chain(build_decoder_for_env(xmodel, params, tenvs[0]))
    got = chain(build_decoder_for_env(xmodel, params, tenvs[0],
                                      pad_buckets="default"))
    _assert_chains_equal(ref, got, "discrete")


def test_pool_shares_programs_across_obs_lengths():
    """Two geometries in one bucket: the pool's decoders share the SAME
    jitted callable and rk projections, and the second geometry's
    steady-state decode adds NO new compiled entry."""
    cfg, model, params, tenvs4 = _setup(
        FakeContinuousEnv, 1, obs_dim=4, act_dim=2, episode_len=6)
    _, _, _, tenvs5 = _setup(
        FakeContinuousEnv, 1, obs_dim=5, act_dim=2, episode_len=6)
    xmodel = _variant(cfg, model, decode_flash="off")
    pool = DecoderPool(xmodel, params, pad_buckets="default")
    dec4 = pool.get(tenvs4[0])
    dec5 = pool.get(tenvs5[0])
    assert dec4 is not dec5              # per-geometry decoder objects
    assert dec4._jit_decode is dec5._jit_decode   # shared program cache
    assert dec4._shared is pool.shared

    sep = np.array([tenvs4[0].separator_id], dtype=np.int64)

    def steady(tenv, dec):
        obs, _, _ = tenv.reset()
        prime = np.concatenate([obs, sep])[None]
        _, mems = dec.decode(prime, dec.init_mems(1))
        return mems

    steady(tenvs4[0], dec4)
    size_after_first = dec4._jit_decode._cache_size()
    steady(tenvs5[0], dec5)          # obs 5+1=6 -> same bucket 8
    assert dec5._jit_decode._cache_size() == size_after_first
    # rk projections shared too: both geometries padded to width 8
    assert 8 in pool.shared.rk_cache


def test_bucketed_speculative_matches_sequential():
    """Bucketing composes with speculative decode: the jit rebuilds the
    padded slice as [real || guesses || pads], and the padded spec chain
    equals both the unpadded spec chain and the classic sequential
    greedy chain."""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 2, obs_dim=4, act_dim=3, episode_len=8)
    smodel = _variant(cfg, model, decode_flash="off",
                      decode_speculative=True)
    dec = build_decoder_for_env(smodel, params, tenvs[0],
                                pad_buckets="default")
    assert dec.speculates and dec.pad_buckets == DEFAULT_OBS_BUCKETS
    primes = _episode_primes(tenvs, 0, 6, 4)
    ref = _chain(build_decoder_for_env(
        _variant(cfg, model, decode_flash="off"), params, tenvs[0]),
        primes, defer=False)
    spec_plain = _chain(build_decoder_for_env(smodel, params, tenvs[0]),
                        primes, defer=True)
    got = _chain(dec, primes, defer=True)
    _assert_chains_equal(ref, spec_plain, "spec-plain")
    _assert_chains_equal(ref, got, "spec-bucketed")


def test_bucketed_speculative_flash():
    """Spec + buckets through the fused ring kernels (interpret mode)."""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 2, obs_dim=4, act_dim=3, episode_len=8)
    fmodel = _variant(cfg, model, decode_flash="on",
                      decode_speculative=True)
    primes = _episode_primes(tenvs, 1, 5, 4)
    ref = _chain(build_decoder_for_env(
        _variant(cfg, model, decode_flash="off"), params, tenvs[0]),
        primes, defer=False)
    got = _chain(build_decoder_for_env(fmodel, params, tenvs[0],
                                       pad_buckets="default"),
                 primes, defer=True)
    _assert_chains_equal(ref, got, "spec-flash-bucketed")


def test_spec_pool_shares_programs_across_obs_lengths():
    """Two continuous geometries sharing a bucket also share the
    compiled SPECULATIVE program (same action_length): running the
    second geometry's steady spec step adds no new compile."""
    cfg, model, params, tenvs4 = _setup(
        FakeContinuousEnv, 1, obs_dim=4, act_dim=3, episode_len=6)
    _, _, _, tenvs5 = _setup(
        FakeContinuousEnv, 1, obs_dim=5, act_dim=3, episode_len=6)
    smodel = _variant(cfg, model, decode_flash="off",
                      decode_speculative=True)
    pool = DecoderPool(smodel, params, pad_buckets="default")
    dec4, dec5 = pool.get(tenvs4[0]), pool.get(tenvs5[0])
    assert dec4._jit_decode_spec is dec5._jit_decode_spec

    sep = np.array([tenvs4[0].separator_id], dtype=np.int64)

    def steady(tenv, dec):
        obs, _, _ = tenv.reset()
        prime = np.concatenate([obs, sep])[None]
        a, mems = dec.decode(prime, dec.init_mems(1))
        return np.asarray(a)

    steady(tenvs4[0], dec4)
    size_after_first = dec4._jit_decode_spec._cache_size()
    steady(tenvs5[0], dec5)          # 6+1 and 5+1 -> same bucket 8
    assert dec5._jit_decode_spec._cache_size() == size_after_first


def test_census_report():
    from bdm_db1_tpu.eval.geometry_census import census

    rep = census()
    assert rep["n_envs"] > 200
    assert rep["programs_bucketed"] < rep["programs_exact"]
    # the point of the exercise: O(10^1) programs for the whole suite
    assert rep["programs_bucketed"] <= 25
    none_buckets = census(buckets=None)
    assert none_buckets["programs_bucketed"] == rep["programs_exact"]
