"""Speculative (Jacobi) greedy action decode: exactness vs the sequential
scan, across the prime variants (one-shot, chunked episode start,
tail-split, flash-interpret kernels) and through the lockstep cohort.

The claim under test (eval/decode.py _decode_step_spec): guessing the whole
continuous-action token block, verifying it as a query-only tail
(models/transformer_xl.py decode_rl_kv_ring spec_tail) and Jacobi-iterating
commit-nothing verify forwards produces exactly the actions the sequential
per-dim decode produces — the reference's one-forward-per-action-dim loop
(reference: src/evaluation/evaluate_rl.py:177-258) collapsed to as little
as one forward per env step."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from bdm_db1_tpu.eval.decode import build_decoder_for_env
from bdm_db1_tpu.eval.envs import FakeContinuousEnv, FakeDiscreteEnv
from bdm_db1_tpu.eval.harness import run_batched_episodes
from bdm_db1_tpu.models.transformer_xl import TransformerXL

from test_batched_eval import _setup


def _spec_decoder(cfg, model, params, tenv, **over):
    scfg = dataclasses.replace(model.cfg, decode_speculative=True, **over)
    smodel = TransformerXL(scfg, cfg.vocab, cfg.vision)
    return build_decoder_for_env(smodel, params, tenv)


def _episode_primes(tenvs, seed, n_steps, obs_dim):
    """A fixed prime stream (episode-start prompt + random obs primes) so
    two decode chains consume identical inputs."""
    rng = np.random.RandomState(seed)
    sep = np.array([tenvs[0].separator_id], dtype=np.int64)
    starts = []
    for te in tenvs:
        prompt, _ = te.get_prompt(strict_length=True, rng=rng)
        obs, _, _ = te.reset()
        starts.append(np.concatenate([prompt, obs, sep]))
    rs = np.random.RandomState(seed + 1)

    def rand_prime():
        raws = [rs.randn(obs_dim).astype(np.float32)
                for _ in range(len(tenvs))]
        obs_tok, _ = tenvs[0].encode_obs_batch(raws)
        return np.concatenate(
            [obs_tok, np.broadcast_to(sep, (len(tenvs), 1))], axis=1)

    return [np.stack(starts)] + [rand_prime() for _ in range(n_steps - 1)]


def _chain(decoder, primes, defer):
    mems = decoder.init_mems(primes[0].shape[0])
    acts, deferred = [], None
    for p in primes:
        if defer:
            a, mems = decoder.decode(p, mems, deferred_tok=deferred,
                                     defer_last=True)
            deferred = np.asarray(a)[..., -decoder.defer_width:]
        else:
            a, mems = decoder.decode(p, mems)
        acts.append(np.asarray(a))
    return acts


def test_speculative_matches_sequential():
    """Deferred spec chain and fold-path spec chain both reproduce the
    sequential greedy actions exactly, including the chunked episode-start
    prime (prompt length > chunk budget)."""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 2, obs_dim=4, act_dim=3, episode_len=6)
    dec = build_decoder_for_env(model, params, tenvs[0])
    sdec = _spec_decoder(cfg, model, params, tenvs[0])
    assert sdec.speculates and sdec.defer_width == 3
    primes = _episode_primes(tenvs, 0, 4, 4)
    ref = _chain(dec, primes, defer=False)
    for defer in (True, False):
        got = _chain(sdec, primes, defer=defer)
        for k, (a, b) in enumerate(zip(ref, got)):
            np.testing.assert_array_equal(a, b,
                                          err_msg=f"defer={defer} step {k}")
    # the loop's round counter is a device scalar bounded by S
    rounds = int(sdec.last_spec_rounds)
    assert 0 <= rounds <= sdec.action_length - 1


def test_speculative_flash_kernels_match():
    """Spec decode through the Pallas ring kernels (interpret mode on CPU)
    matches the XLA sequential path."""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 2, obs_dim=4, act_dim=3, episode_len=6)
    dec = build_decoder_for_env(model, params, tenvs[0])
    fdec = _spec_decoder(cfg, model, params, tenvs[0], decode_flash="on")
    primes = _episode_primes(tenvs, 3, 3, 4)
    ref = _chain(dec, primes, defer=False)
    got = _chain(fdec, primes, defer=True)
    for k, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a, b, err_msg=f"step {k}")


def test_speculative_tail_split():
    """A steady prime whose guess tail would exceed mem_len (q + S > M)
    re-splits its last ring slice; actions still match sequential."""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 2, obs_dim=25, act_dim=4, episode_len=6)
    # steady prime q = 4 (deferred) + 25 + 1 = 30; +S (3) = 33 > mem_len 32
    assert model.cfg.mem_len == 32
    dec = build_decoder_for_env(model, params, tenvs[0])
    sdec = _spec_decoder(cfg, model, params, tenvs[0])
    primes = _episode_primes(tenvs, 5, 3, 25)
    ref = _chain(dec, primes, defer=False)
    got = _chain(sdec, primes, defer=True)
    for k, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a, b, err_msg=f"step {k}")


def test_speculative_cohort_matches_nonspec():
    """run_batched_episodes with a speculative decoder returns the exact
    EpisodeResults of the non-speculative decoder (greedy-equivalent
    policies -> identical env trajectories)."""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 3, obs_dim=4, act_dim=3, episode_len=5)
    dec = build_decoder_for_env(model, params, tenvs[0])
    ref = run_batched_episodes(tenvs, dec, rng=np.random.RandomState(0))

    cfg2, model2, params2, tenvs2 = _setup(
        FakeContinuousEnv, 3, obs_dim=4, act_dim=3, episode_len=5)
    sdec = _spec_decoder(cfg2, model2, params, tenvs2[0])
    got = run_batched_episodes(tenvs2, sdec, rng=np.random.RandomState(0))
    assert [(r.episode_return, r.episode_length) for r in ref] == \
        [(g.episode_return, g.episode_length) for g in got]


def test_speculative_image_geometry_matches():
    """Continuous-action IMAGE env (carracing-like): the guesses ride a
    prime slice that also carries frames (episode-start prompt images +
    per-step obs frame); trajectories match the non-speculative decoder."""
    import jax
    import jax.numpy as jnp

    from bdm_db1_tpu.data.input_specs import RLTaskBatch
    from bdm_db1_tpu.eval.envs import FakeContinuousImageEnv

    def setup():
        cfg, model, params, tenvs = _setup(
            FakeContinuousImageEnv, 2, hw=32, act_dim=3, episode_len=4)
        # _setup's init batch has no images -> re-init with an image slot
        # so the decode finds the vision tower
        L = cfg.model.n_position
        tok = jnp.zeros((1, L), jnp.int32)
        params = model.init(
            jax.random.PRNGKey(0),
            {"rl": RLTaskBatch(
                tokens=tok.at[0, 0].set(-1), position_id=tok,
                loss_mask=tok, label=tok,
                images=jnp.zeros((1, 1, 32, 32, 3), jnp.float32))},
        )["params"]
        return cfg, model, params, tenvs

    cfg, model, params, tenvs = setup()
    dec = build_decoder_for_env(model, params, tenvs[0])
    ref = run_batched_episodes(tenvs, dec, rng=np.random.RandomState(0))

    cfg2, model2, params2, tenvs2 = setup()
    sdec = _spec_decoder(cfg2, model2, params2, tenvs2[0])
    assert sdec.speculates
    got = run_batched_episodes(tenvs2, sdec, rng=np.random.RandomState(0))
    assert [(r.episode_return, r.episode_length) for r in ref] == \
        [(g.episode_return, g.episode_length) for g in got]


def test_speculative_disabled_for_discrete():
    """Single-token (discrete) actions have nothing to speculate — the
    decoder falls back to classic defer_last."""
    cfg, model, params, tenvs = _setup(
        FakeDiscreteEnv, 1, obs_dim=4, n_actions=5, episode_len=4)
    sdec = _spec_decoder(cfg, model, params, tenvs[0])
    assert not sdec.speculates and sdec.defer_width == 1


def test_speculative_int8_cache_runs():
    """Spec decode over an int8 ring cache: the quantized partial-commit
    write path works and actions stay in the continuous range. (No
    sequential-parity claim here: the sequential int8 path reads committed
    quantized action rows while spec attends the exact in-block tokens, so
    int8 spec is if anything MORE exact — both are tolerance paths.)"""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 2, obs_dim=4, act_dim=3, episode_len=6)
    sdec = _spec_decoder(cfg, model, params, tenvs[0],
                         decode_cache_dtype="int8")
    assert sdec.speculates
    layout = cfg.vocab.layout()
    primes = _episode_primes(tenvs, 7, 3, 4)
    acts = _chain(sdec, primes, defer=True)
    for a in acts:
        assert ((a >= layout.continuous_offset)
                & (a < layout.separator_id)).all(), a


def test_speculative_w8a8_weights_match_sequential():
    """Spec decode with MXU-native W8A8 trunk weights
    (decode_weight_dtype="int8a8") reproduces the *sequential* W8A8
    actions exactly: per-row activation quantization is row-independent
    and the int8 dot reduces exactly in int32, so the spec tail verify
    computes the same logits the q=1 sequential forwards do."""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 2, obs_dim=4, act_dim=3, episode_len=6)
    qmodel = TransformerXL(
        dataclasses.replace(model.cfg, decode_weight_dtype="int8a8"),
        cfg.vocab, cfg.vision)
    qdec = build_decoder_for_env(qmodel, params, tenvs[0])
    sdec = _spec_decoder(cfg, model, params, tenvs[0],
                         decode_weight_dtype="int8a8")
    assert sdec.speculates
    primes = _episode_primes(tenvs, 11, 3, 4)
    ref = _chain(qdec, primes, defer=False)
    got = _chain(sdec, primes, defer=True)
    for k, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a, b, err_msg=f"step {k}")


def test_speculative_w8a8_int8_cache_stack_runs():
    """The full quantized decode stack — spec verify + W8A8 weights +
    int8 ring cache (bench.py --speculate --spec-policy bc
    --weight-dtype int8a8 --cache-dtype int8) — runs end to end and
    keeps actions in the continuous token range."""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 2, obs_dim=4, act_dim=3, episode_len=6)
    sdec = _spec_decoder(cfg, model, params, tenvs[0],
                         decode_weight_dtype="int8a8",
                         decode_cache_dtype="int8")
    assert sdec.speculates
    layout = cfg.vocab.layout()
    primes = _episode_primes(tenvs, 17, 3, 4)
    acts = _chain(sdec, primes, defer=True)
    for a in acts:
        assert ((a >= layout.continuous_offset)
                & (a < layout.separator_id)).all(), a


def test_spec_tail_pure_verify_leaves_cache_untouched():
    """decode_rl_kv_ring with spec_tail == q commits nothing: cache arrays
    and cursor come back unchanged."""
    import jax

    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 1, obs_dim=4, act_dim=2, episode_len=4)
    dec = build_decoder_for_env(model, params, tenvs[0])
    mems = dec.init_mems(1)
    toks = jnp.array([[5, 6, 7]], jnp.int32)
    pos = jnp.zeros((1, 3), jnp.int32)
    rk = dec._rk_for(3)
    logits, cache = model.apply(
        {"params": params}, toks, pos, mems, rk,
        method=TransformerXL.decode_rl_kv_ring, spec_tail=3)
    assert logits.shape[:2] == (1, 3) and logits.ndim == 3
    np.testing.assert_array_equal(np.asarray(cache["k"]),
                                  np.asarray(mems["k"]))
    assert int(cache["cursor"]) == int(mems["cursor"])


# ---- adaptive speculation (eval/decode.py SpecController /
# AdaptiveSpecSession): speculate while the verify-rounds EWMA beats the
# break-even, fall back to the classic scan otherwise, probe to re-enter.
# The safety property under test: BOTH paths are exact, so any switching
# sequence reproduces the sequential greedy actions bit-for-bit.


def test_spec_controller_policy():
    """Pure host-side controller logic: exit on a bad EWMA (after min_obs),
    probe on the classic cadence, re-enter on a good probe."""
    from bdm_db1_tpu.eval.decode import SpecController

    c = SpecController(exit_rounds=2.0, reenter_rounds=1.0, probe_every=3,
                       alpha=1.0, min_obs=2)
    assert c.decide() is True
    c.observe(0)
    assert c.decide() is True
    c.observe(0)
    assert c.spec_mode  # low rounds: stays speculative
    assert c.decide() is True
    c.observe(5)        # alpha=1: ewma jumps to 5 > 2 -> exit
    assert not c.spec_mode and c.switches == 1
    assert c.decide() is False
    assert c.decide() is False
    assert c.decide() is True       # probe on the 3rd classic step
    c.observe(3)                    # probe still bad -> stays classic
    assert not c.spec_mode
    assert c.decide() is False
    assert c.decide() is False
    assert c.decide() is True       # next probe
    c.observe(0.5)                  # good -> re-enter
    assert c.spec_mode and c.switches == 2
    assert c.decide() is True
    # one cold-start miss before min_obs never exits
    c2 = SpecController(exit_rounds=1.0, reenter_rounds=0.5, alpha=1.0,
                        min_obs=3)
    c2.decide()
    c2.observe(5)
    assert c2.spec_mode


def _chain_adaptive(sess, primes):
    mems = sess.decoder.init_mems(primes[0].shape[0])
    acts, deferred = [], None
    for p in primes:
        a, mems = sess.decode(p, mems, deferred_tok=deferred,
                              defer_last=True)
        deferred = np.asarray(a)[..., -sess.defer_width:]
        acts.append(np.asarray(a))
    return acts


def test_adaptive_session_matches_sequential_across_switches():
    """A controller forced to flip every couple of steps (exit always,
    probe every 2, re-enter always) exercises spec->classic,
    classic->spec and spec->spec deferred-carry transitions; the action
    stream still equals the classic sequential decoder's exactly."""
    from bdm_db1_tpu.eval.decode import AdaptiveSpecSession, SpecController

    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 2, obs_dim=4, act_dim=3, episode_len=8)
    dec = build_decoder_for_env(model, params, tenvs[0])
    adec = _spec_decoder(cfg, model, params, tenvs[0])
    S = adec.action_length - 1
    ctl = SpecController(exit_rounds=-1.0, reenter_rounds=S, probe_every=2,
                         alpha=1.0, min_obs=1)
    sess = AdaptiveSpecSession(adec, ctl)
    primes = _episode_primes(tenvs, 7, 6, 4)
    ref = _chain(dec, primes, defer=False)
    got = _chain_adaptive(sess, primes)
    for k, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a, b, err_msg=f"step {k}")
    assert ctl.switches >= 2, "forced controller must have flipped modes"
    assert 0 < ctl.spec_steps < ctl.total_steps, \
        "both paths must have run"
    assert ctl.rounds_n == ctl.spec_steps  # every spec step was observed


def test_adaptive_decoder_flag_and_defaults():
    """decode_spec_adaptive alone enables the speculative machinery, and
    the session's default controller scales its thresholds with the
    action length (break-even ~0.6 * S, PERFORMANCE.md)."""
    import dataclasses as _dc

    from bdm_db1_tpu.eval.decode import (
        AdaptiveSpecSession, build_decoder_for_env as _bd,
    )

    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 1, obs_dim=4, act_dim=4, episode_len=4)
    acfg = _dc.replace(model.cfg, decode_spec_adaptive=True)
    amodel = TransformerXL(acfg, cfg.vocab, cfg.vision)
    adec = _bd(amodel, params, tenvs[0])
    assert adec.speculates and adec.spec_adaptive
    sess = AdaptiveSpecSession(adec)
    S = adec.action_length - 1
    assert sess.ctl.exit_rounds == 0.6 * S
    assert sess.ctl.reenter_rounds == 0.5 * S


def test_adaptive_cohort_and_episode_match_nonspec():
    """run_batched_episodes and the single-env run_episode loop with an
    adaptive decoder (default controller) reproduce the classic decoder's
    EpisodeResults exactly."""
    from bdm_db1_tpu.eval.harness import run_episode

    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 3, obs_dim=4, act_dim=3, episode_len=5)
    dec = build_decoder_for_env(model, params, tenvs[0])
    ref = run_batched_episodes(tenvs, dec, rng=np.random.RandomState(0))
    ref1 = run_episode(tenvs[0], dec, use_prompt=True,
                       rng=np.random.RandomState(3))

    cfg2, model2, params2, tenvs2 = _setup(
        FakeContinuousEnv, 3, obs_dim=4, act_dim=3, episode_len=5)
    adec = _spec_decoder(cfg2, model2, params, tenvs2[0],
                         decode_spec_adaptive=True)
    assert adec.spec_adaptive
    got = run_batched_episodes(tenvs2, adec, rng=np.random.RandomState(0))
    got1 = run_episode(tenvs2[0], adec, use_prompt=True,
                       rng=np.random.RandomState(3))
    assert [(r.episode_return, r.episode_length) for r in ref] == \
        [(g.episode_return, g.episode_length) for g in got]
    assert (ref1.episode_return, ref1.episode_length) == \
        (got1.episode_return, got1.episode_length)


def test_adaptive_prewarm_covers_all_switch_programs():
    """prewarm compiles every (mode, deferred-width) program the adaptive
    session can dispatch at the steady prime geometry, so live mode
    switches are jit-cache hits (on the real chip a miss is a multi-minute
    1.2B compile landing mid-episode) — and it leaves the controller and
    guess state untouched."""
    from bdm_db1_tpu.eval.decode import AdaptiveSpecSession

    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 2, obs_dim=4, act_dim=3, episode_len=6)
    adec = _spec_decoder(cfg, model, params, tenvs[0],
                         decode_spec_adaptive=True)
    sess = AdaptiveSpecSession(adec)
    steady = _episode_primes(tenvs, 11, 2, 4)[1]    # [B, obs+sep]
    sess.prewarm(steady)
    assert sess.ctl.total_steps == 0 and sess._guess is None
    n_spec = adec._jit_decode_spec._cache_size()
    n_classic = adec._jit_decode._cache_size()
    assert n_spec >= 1 and n_classic >= 1
    # every steady-state dispatch the session can make is now a cache hit
    A = adec.action_length
    guess = np.full((2, A), adec._default_guess, np.int64)
    for spec in (True, False):
        for w in (1, A):
            mems = adec.init_mems(2)
            act, _ = adec.decode_async(steady, mems,
                                       deferred_tok=guess[:, :w],
                                       defer_last=True, speculate=spec,
                                       guess_tok=guess)
            np.asarray(act)
    assert adec._jit_decode_spec._cache_size() == n_spec
    assert adec._jit_decode._cache_size() == n_classic
