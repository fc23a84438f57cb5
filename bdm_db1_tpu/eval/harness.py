"""RL evaluation harness: episode loop, per-env evaluation, env sharding.

Counterpart of the reference eval driver
(reference: src/evaluation/evaluate_rl.py:286-541) with the TPU-native
decode path: the device holds the segment memory, the host only tokenizes
observations and steps the (gym) env, and the two overlap naturally because
``ActionDecoder.decode`` returns before the TPU finishes (async dispatch).

Multi-host: envs are sharded round-robin across processes
(reference: evaluate_rl.py:452-482 chunks across ranks) and results gathered
with ``multihost_utils.process_allgather`` instead of NCCL gather_object.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from bdm_db1_tpu.eval.decode import (
    ActionDecoder, AdaptiveSpecSession, build_decoder_for_env,
)
from bdm_db1_tpu.eval.wrapper import TokenizedEnv


@dataclasses.dataclass
class EpisodeResult:
    env_name: str
    episode_return: float
    episode_length: int


def run_episode(
    env: TokenizedEnv,
    decoder: ActionDecoder,
    *,
    use_prompt: bool = True,
    strict_length: bool = True,
    minimal_expert_data: bool = False,
    max_step_size: Optional[int] = None,
    rng: Optional[np.random.RandomState] = None,
) -> EpisodeResult:
    """One episode in memory ("moving prompt") mode
    (reference: evaluate_rl.py:286-410, the mem_len>0 path)."""
    sep = np.array([env.separator_id], dtype=np.int64)

    obs_tokens, obs_img, action_mask = env.reset()

    if use_prompt:
        prompt, prompt_img = env.get_prompt(
            strict_length=strict_length,
            minimal_expert_data=minimal_expert_data, rng=rng)
        prime = np.concatenate([prompt, obs_tokens, sep])
        if prompt_img is not None or obs_img is not None:
            parts = [p for p in (prompt_img, obs_img) if p is not None]
            prime_img = np.concatenate(parts, axis=0)
        else:
            prime_img = None
    else:
        prime = np.concatenate([obs_tokens, sep])
        prime_img = obs_img

    episode_return, episode_length = 0.0, 0
    done = False
    defers = bool(getattr(decoder, "defers", False))
    deferred = None
    # adaptive speculation: per-episode session (the decoder is shared
    # across episodes/cohorts; the mode + guess state must not be)
    sess = (AdaptiveSpecSession(decoder)
            if getattr(decoder, "spec_adaptive", False) else None)
    if sess is not None and not getattr(decoder, "_spec_prewarmed", False):
        # compile every (mode, deferred-width) program a mode switch can
        # dispatch at the steady [obs || sep] geometry BEFORE the live
        # caches exist (prewarm's scratch set + live set don't fit HBM
        # together at production batches) — otherwise the first switch
        # lands a 1.2B remote-AOT compile mid-episode. Once per decoder:
        # the jit caches are the decoder's, only session state is fresh.
        sess.prewarm(np.concatenate([obs_tokens, sep])[None],
                     prime_images=(None if obs_img is None
                                   else obs_img[None]),
                     env_action_mask=(None if action_mask is None
                                      else np.asarray(action_mask)[None]))
        decoder._spec_prewarmed = True
    dec = sess.decode if sess is not None else decoder.decode
    mems = decoder.init_mems(1)

    while not done:
        act_tokens, mems = dec(
            prime, mems, prime_images=prime_img, env_action_mask=action_mask,
            deferred_tok=deferred, defer_last=defers)
        if defers:
            w = int(sess.defer_width if sess is not None
                    else getattr(decoder, "defer_width", 1))
            deferred = np.asarray(act_tokens)[..., -w:]
        action = env.tok.decode_action(act_tokens, env.discrete_action)
        obs_tokens, obs_img, action_mask, reward, done, _ = env.step(action)
        episode_return += reward
        episode_length += 1
        if max_step_size is not None and episode_length >= max_step_size:
            break
        # memory carries history; feed only the new observation
        prime = np.concatenate([obs_tokens, sep])
        prime_img = obs_img

    return EpisodeResult(env.ds.name, float(episode_return), episode_length)


def evaluate_env(
    model,
    params,
    make_tokenized_env: Callable[[], TokenizedEnv],
    *,
    num_trials: int = 5,
    seed: int = 100,
    use_prompt: bool = True,
    strict_length: bool = True,
    minimal_expert_data: bool = False,
    max_step_size: Optional[int] = None,
    decoder_pool=None,
) -> Dict[str, float]:
    """Average return/length over trials (reference: evaluate_rl.py:413-449)."""
    env = make_tokenized_env()
    env.seed(seed)
    rng = np.random.RandomState(seed)
    decoder = (decoder_pool.get(env) if decoder_pool is not None
               else build_decoder_for_env(model, params, env))
    rets, lens = [], []
    for _ in range(num_trials):
        res = run_episode(
            env, decoder, use_prompt=use_prompt, strict_length=strict_length,
            minimal_expert_data=minimal_expert_data,
            max_step_size=max_step_size, rng=rng)
        rets.append(res.episode_return)
        lens.append(res.episode_length)
    return {
        "env": env.ds.name,
        "return_mean": float(np.mean(rets)),
        "return_std": float(np.std(rets)),
        "length_mean": float(np.mean(lens)),
        "num_trials": num_trials,
    }


def run_episode_stateless(
    env: TokenizedEnv,
    decoder,  # WindowDecoder
    *,
    use_prompt: bool = True,
    prompt_strategy: str = "fixed_prompt",
    strict_length: bool = True,
    minimal_expert_data: bool = False,
    max_step_size: Optional[int] = None,
    rng: Optional[np.random.RandomState] = None,
) -> EpisodeResult:
    """No-memory episode loop: the host keeps the rolling token window
    (reference: evaluate_rl.py:286-410 with model_memory None —
    fixed_prompt pins the expert prompt and rolls the rest by whole
    transitions; otherwise the oldest transition drops)."""
    sep = np.array([env.separator_id], dtype=np.int64)
    step_size = env.obs_length + env.action_length + 1
    window = decoder.window

    obs_tokens, _, action_mask = env.reset()
    if use_prompt:
        env.eval_prompt_strategy = prompt_strategy
        prompt, _ = env.get_prompt(
            strict_length=strict_length,
            minimal_expert_data=minimal_expert_data, rng=rng)
        prompt_len = len(prompt)
        seq = np.concatenate([prompt, obs_tokens, sep])
    else:
        prompt_len = 0
        seq = np.concatenate([obs_tokens, sep])

    def roll(seq: np.ndarray) -> np.ndarray:
        while len(seq) + env.action_length > window:
            if use_prompt and prompt_strategy == "fixed_prompt":
                # pin the prompt, drop the oldest post-prompt transition
                seq = np.concatenate([seq[:prompt_len],
                                      seq[prompt_len + step_size:]])
            else:
                seq = seq[step_size:]
        return seq

    episode_return, episode_length = 0.0, 0
    done = False
    while not done:
        seq = roll(seq)
        act_tokens, seq = decoder.decode(seq, env_action_mask=action_mask)
        action = env.tok.decode_action(act_tokens, env.discrete_action)
        obs_tokens, _, action_mask, reward, done, _ = env.step(action)
        episode_return += reward
        episode_length += 1
        if max_step_size is not None and episode_length >= max_step_size:
            break
        seq = np.concatenate([seq, obs_tokens, sep])

    return EpisodeResult(env.ds.name, float(episode_return), episode_length)


@dataclasses.dataclass
class _SlotState:
    """Reset-time state of one lockstep slot (env already reset, expert
    prompt already sampled)."""
    prime: np.ndarray                # [prompt || obs || sep] token ids
    prime_img: Optional[np.ndarray]  # image rows for every -1 slot in prime
    obs_img: Optional[np.ndarray]    # image rows of the reset obs only
    mask: Optional[np.ndarray]       # env-supplied action mask


def _reset_env_state(env, *, use_prompt, strict_length,
                     minimal_expert_data, rng) -> _SlotState:
    sep = np.array([env.separator_id], dtype=np.int64)
    obs, img, mask = env.reset()
    if use_prompt:
        prompt, pimg = env.get_prompt(
            strict_length=strict_length,
            minimal_expert_data=minimal_expert_data, rng=rng)
        prime = np.concatenate([prompt, obs, sep])
        pi = None
        if pimg is not None or img is not None:
            pi = np.concatenate(
                [p for p in (pimg, img) if p is not None], axis=0)
        return _SlotState(prime, pi, img, mask)
    return _SlotState(np.concatenate([obs, sep]), img, img, mask)


def _cohort_key(st: _SlotState) -> Tuple:
    """Everything that must agree for slots to share one device batch (and
    therefore one compiled (b, qlen) decode program): the sampled prime
    shape, the image-row layout, and the action-mask layout."""
    return (st.prime.shape,
            None if st.prime_img is None else st.prime_img.shape,
            None if st.mask is None else st.mask.shape)


class _LockstepCohort:
    """State of B same-geometry envs stepping in lockstep. ``dispatch``
    launches the (async) device decode; ``harvest_and_step`` blocks on its
    actions and advances the envs on the host. Splitting the two lets an
    interleaved driver overlap one cohort's host stepping with another's
    device compute. A finished env is never stepped again (real gym/MuJoCo
    envs raise or return garbage after ``done``); its slot keeps replaying
    the final observation so the device batch stays static-shaped, and its
    reward/length stop accumulating.

    ``pad_to`` replicates slot 0 (pre-finished, env never stepped, result
    dropped) until the batch has that many slots, so a bucket's remainder
    chunk reuses the full-batch compiled program instead of paying a fresh
    10-15 min AOT compile for its odd batch size."""

    def __init__(self, envs, decoder, *, states: Optional[
                     List[_SlotState]] = None, use_prompt: bool = True,
                 strict_length: bool = True,
                 minimal_expert_data: bool = False,
                 max_step_size: Optional[int] = None,
                 rng: Optional[np.random.RandomState] = None,
                 pad_to: Optional[int] = None):
        if states is None:
            rng = rng if rng is not None else np.random.RandomState(0)
            states = [
                _reset_env_state(
                    e, use_prompt=use_prompt, strict_length=strict_length,
                    minimal_expert_data=minimal_expert_data, rng=rng)
                for e in envs
            ]
        keys = {_cohort_key(s) for s in states}
        if len(keys) > 1:
            raise ValueError(
                "lockstep cohort is not homogeneous — prime/image/"
                f"action-mask shapes differ across slots: {sorted(map(str, keys))}. "
                "All slots of a batch share one compiled (b, qlen) decode "
                "program. Group work items by sampled prime geometry "
                "(evaluate_envs_lockstep does) or use strict_length=True "
                "prompts so every sample has the same length.")
        self.n_real = len(envs)
        if pad_to is not None and pad_to > len(envs):
            n_pad = pad_to - len(envs)
            envs = list(envs) + [envs[0]] * n_pad
            states = list(states) + [states[0]] * n_pad
        self.envs = envs
        self.decoder = decoder
        self.max_step_size = max_step_size
        b = len(envs)
        self._sep = np.array([envs[0].separator_id], dtype=np.int64)
        self.prime = np.stack([s.prime for s in states])
        self.prime_img = (np.stack([s.prime_img for s in states])
                          if states[0].prime_img is not None else None)
        self.action_mask = (np.stack([s.mask for s in states])
                            if states[0].mask is not None else None)
        # per-slot [obs || sep] / image / mask replayed once a slot
        # finishes, held as whole-batch arrays so the per-step update is a
        # row assignment, not a B-way Python stack; initialized from the
        # reset state so pre-finished padding slots have a valid replay
        # from the first harvest
        obs_sep = envs[0].obs_length + 1
        self.last_tokens = np.stack([s.prime[-obs_sep:] for s in states])
        self.last_imgs = (np.stack([s.obs_img for s in states])
                          if states[0].obs_img is not None else None)
        self.last_masks = (np.stack([s.mask for s in states])
                           if states[0].mask is not None else None)
        # adaptive speculation: mode/EWMA/guess state is per COHORT (the
        # decoder is shared by geometry via DecoderPool), and the deferred
        # width varies per step with the path the session picked
        self._sess = (AdaptiveSpecSession(decoder)
                      if getattr(decoder, "spec_adaptive", False) else None)
        if (self._sess is not None
                and not getattr(decoder, "_spec_prewarmed", False)):
            # compile both modes at both deferred widths at the steady
            # [obs || sep] geometry BEFORE self.mems exists — prewarm's
            # scratch cache set plus the live set don't fit HBM together
            # at production cohort batches; without it the cohort's first
            # mode switch lands a 1.2B remote-AOT compile mid-episode.
            # Once per decoder: jit caches belong to the decoder.
            self._sess.prewarm(self.last_tokens,
                               prime_images=self.last_imgs,
                               env_action_mask=self.last_masks)
            decoder._spec_prewarmed = True
        self.mems = decoder.init_mems(b)
        self.returns = np.zeros(b)
        self.lengths = np.zeros(b, dtype=np.int64)
        self.done = np.zeros(b, dtype=bool)
        self.done[self.n_real:] = True  # padding slots never step
        self._pending = None
        # last-action deferral: the cohort never re-primes mid-run (done
        # slots replay as padding), so every post-reset prime is the
        # uniform [obs || sep] — the previous step's final action token
        # rides in front of it instead of costing its own cache-fold
        # forward (ActionDecoder.decode_async defer_last)
        self._defers = bool(getattr(decoder, "defers", False))
        # speculative decoders defer the WHOLE action block (and reuse it
        # as next step's guesses); classic deferral carries the last token
        self._defer_width = int(getattr(decoder, "defer_width", 1))
        self._deferred = None

    def dispatch(self) -> None:
        dec = (self._sess.decode_async if self._sess is not None
               else self.decoder.decode_async)
        self._pending, self.mems = dec(
            self.prime, self.mems, prime_images=self.prime_img,
            env_action_mask=self.action_mask,
            deferred_tok=self._deferred, defer_last=self._defers)

    def harvest_and_step(self) -> bool:
        """Block on the pending actions, step live envs; True when all done.

        The host work here is the production eval loop's serial section
        (~8 ms/action when done per env, PERFORMANCE.md): action decode and
        observation tokenization run as whole-batch numpy array ops; only
        ``env.step`` itself (and the action-mask fetch) stays per env.
        """
        act_tokens = (self._sess.harvest(self._pending)
                      if self._sess is not None
                      else np.asarray(self._pending))
        self._pending = None
        if self._defers:
            w = (self._sess.defer_width if self._sess is not None
                 else self._defer_width)
            self._deferred = (act_tokens if w > 1 else act_tokens[:, -1])
        live = np.flatnonzero(~self.done)
        if live.size == 0:
            return True
        env0 = self.envs[int(live[0])]
        actions = env0.tok.decode_action_batch(
            act_tokens, env0.discrete_action)
        raws, rewards, dones, masks = [], [], [], []
        for i in live:
            env = self.envs[i]
            a = int(actions[i]) if env.discrete_action else actions[i]
            raw, reward, d, _, mask = env.step_raw(a)
            raws.append(raw)
            rewards.append(reward)
            dones.append(d)
            masks.append(mask)
        self.returns[live] += np.asarray(rewards, np.float64)
        self.lengths[live] += 1
        done_now = np.asarray(dones, dtype=bool)
        if self.max_step_size is not None:
            done_now |= self.lengths[live] >= self.max_step_size
        self.done[live] = done_now
        # batch-tokenize the stepped observations, grouped by dataset: a
        # cohort may mix env names whose datasets post-process differently
        # (fresh arrays each step — the previous ones may still back an
        # in-flight device transfer from dispatch())
        tok_new = self.last_tokens.copy()
        img_new = self.last_imgs.copy() if self.last_imgs is not None else None
        mask_new = (self.last_masks.copy()
                    if self.last_masks is not None else None)
        groups: Dict[int, List[int]] = {}
        for j, i in enumerate(live):
            groups.setdefault(id(self.envs[i].ds), []).append(j)
        for idxs in groups.values():
            rows = live[idxs]
            obs_tok, img = self.envs[int(rows[0])].encode_obs_batch(
                [raws[j] for j in idxs])
            tok_new[rows, :-1] = obs_tok
            tok_new[rows, -1] = self._sep[0]
            if img_new is not None:
                img_new[rows] = img[:, None]
        if mask_new is not None:
            mask_new[live] = np.stack(masks)
        self.last_tokens, self.last_imgs = tok_new, img_new
        self.last_masks = mask_new
        if self.done.all():
            return True
        self.prime, self.prime_img = tok_new, img_new
        self.action_mask = mask_new
        return False

    def results(self) -> List[EpisodeResult]:
        return [EpisodeResult(self.envs[i].ds.name, float(self.returns[i]),
                              int(self.lengths[i]))
                for i in range(self.n_real)]  # padding slots dropped


def run_batched_episodes(
    envs: List[TokenizedEnv],
    decoder: ActionDecoder,
    *,
    use_prompt: bool = True,
    strict_length: bool = True,
    minimal_expert_data: bool = False,
    max_step_size: Optional[int] = None,
    rng: Optional[np.random.RandomState] = None,
) -> List[EpisodeResult]:
    """Run B same-geometry environments in lockstep: one device call decodes
    all B actions per step (amortizes the host<->device round trip the
    reference pays per env, evaluate_rl.py:177-258)."""
    cohort = _LockstepCohort(
        envs, decoder, use_prompt=use_prompt, strict_length=strict_length,
        minimal_expert_data=minimal_expert_data, max_step_size=max_step_size,
        rng=rng or np.random.RandomState(0))
    finished = False
    while not finished:
        cohort.dispatch()
        finished = cohort.harvest_and_step()
    return cohort.results()


def run_interleaved_episodes(
    env_groups: List[List[TokenizedEnv]],
    decoder: ActionDecoder,
    *,
    use_prompt: bool = True,
    strict_length: bool = True,
    minimal_expert_data: bool = False,
    max_step_size: Optional[int] = None,
    rng: Optional[np.random.RandomState] = None,
    states_groups: Optional[List[List[_SlotState]]] = None,
    pad_to: Optional[int] = None,
) -> List[List[EpisodeResult]]:
    """Run several same-geometry cohorts with software pipelining: while the
    device decodes cohort A's actions (async dispatch), the host steps
    cohort B's envs. With real MuJoCo/Atari envs the host stepping time is
    fully hidden behind device compute (and vice versa) — the single-cohort
    loop serializes them. Returns one result list per input group.

    ``states_groups`` supplies pre-reset slot states (envs already reset,
    prompts sampled) so callers can group by sampled prime geometry first;
    ``pad_to`` pads each cohort to a fixed batch size (see _LockstepCohort)."""
    rng = rng or np.random.RandomState(0)
    cohorts = [
        _LockstepCohort(
            envs, decoder,
            states=states_groups[i] if states_groups is not None else None,
            use_prompt=use_prompt,
            strict_length=strict_length,
            minimal_expert_data=minimal_expert_data,
            max_step_size=max_step_size, rng=rng, pad_to=pad_to)
        for i, envs in enumerate(env_groups)
    ]
    live = [c for c in cohorts]
    for c in live:
        c.dispatch()
    while live:
        nxt = []
        for c in live:
            if c.harvest_and_step():
                continue
            c.dispatch()  # queued while the others' harvests run the host
            nxt.append(c)
        live = nxt
    return [c.results() for c in cohorts]


def decode_geometry(tenv: TokenizedEnv) -> Tuple:
    """Decode-geometry key: envs with equal keys share a compiled decoder
    AND may run in the same lockstep batch (SURVEY.md §7 hard part 5)."""
    from bdm_db1_tpu.eval.envs import is_discrete_space

    discrete = is_discrete_space(tenv.action_space)
    return (tenv.obs_length, tenv.action_length, discrete,
            tenv.action_space.n if discrete else None)


def evaluate_envs_lockstep(
    model,
    params,
    env_names: Sequence[str],
    make_tokenized_env: Callable[[str], TokenizedEnv],
    *,
    num_trials: int = 5,
    seed: int = 100,
    batch_size: int = 16,
    decoder_pool=None,
    use_prompt: bool = True,
    strict_length: bool = True,
    minimal_expert_data: bool = False,
    max_step_size: Optional[int] = None,
    interleave: int = 2,
    pad_cohorts: bool = True,
) -> List[Dict[str, float]]:
    """Production lockstep evaluation: bucket (env, trial) work items by
    decode geometry, reset + sample prompts a wave at a time, sub-group the
    wave by the *sampled* prime geometry (prompt lengths can differ with
    strict_length=False, and image/mask layouts are not part of the static
    decode geometry), fill device batches of up to ``batch_size`` slots,
    and run ``interleave`` batches at a time through
    :func:`run_interleaved_episodes` (host env stepping of one cohort hides
    behind device decode of the other). With ``pad_cohorts`` every cohort is
    padded to exactly ``batch_size`` slots so remainder chunks reuse the
    full-batch compiled program (a fresh odd batch size costs a 10-15 min
    remote AOT compile at 1.2B).

    This puts the batched decode path (the one bench.py measures) on the
    real suite: with 870 envs x num_trials trials, most buckets fill whole
    batches, so the per-step device call is amortized across ~batch_size
    episodes instead of 1 (reference evaluates one env per process,
    evaluate_rl.py:452-466). Returns one record per env, same schema as
    :func:`evaluate_env`.
    """
    from collections import defaultdict

    from bdm_db1_tpu.eval.decode import DecoderPool

    pool = decoder_pool or DecoderPool(model, params)

    # one probe instance per env (geometry needs the wrapped dataset); the
    # probe is recycled as the first work-item instance below
    probes: Dict[str, List[TokenizedEnv]] = {}
    geom: Dict[str, Tuple] = {}
    for name in env_names:
        t = make_tokenized_env(name)
        probes[name] = [t]
        geom[name] = decode_geometry(t)

    buckets: Dict[Tuple, List[Tuple[str, int]]] = defaultdict(list)
    for name in env_names:
        for trial in range(num_trials):
            buckets[geom[name]].append((name, trial))

    episodes: Dict[str, List[EpisodeResult]] = defaultdict(list)
    interleave = max(1, interleave)
    prompt_rng = np.random.RandomState(seed)
    wave_size = interleave * batch_size
    for key in buckets:
        items = buckets[key]
        for wstart in range(0, len(items), wave_size):
            # reset + sample prompts for a wave of work items (bounded so
            # at most wave_size env instances are live at once)
            recs = []
            for name, trial in items[wstart:wstart + wave_size]:
                t = (probes[name].pop() if probes[name]
                     else make_tokenized_env(name))
                t.seed(seed + trial)
                st = _reset_env_state(
                    t, use_prompt=use_prompt, strict_length=strict_length,
                    minimal_expert_data=minimal_expert_data, rng=prompt_rng)
                recs.append((name, t, st))
            sub: Dict[Tuple, List] = defaultdict(list)
            for rec in recs:
                sub[_cohort_key(rec[2])].append(rec)
            chunks = [srecs[s:s + batch_size]
                      for srecs in sub.values()
                      for s in range(0, len(srecs), batch_size)]
            for gstart in range(0, len(chunks), interleave):
                group = chunks[gstart:gstart + interleave]
                env_groups = [[r[1] for r in c] for c in group]
                state_groups = [[r[2] for r in c] for c in group]
                decoder = pool.get(env_groups[0][0])
                group_results = run_interleaved_episodes(
                    env_groups, decoder,
                    states_groups=state_groups,
                    pad_to=batch_size if pad_cohorts else None,
                    max_step_size=max_step_size)
                for chunk, results in zip(group, group_results):
                    for (name, t, _), res in zip(chunk, results):
                        episodes[name].append(res)
                        probes[name].append(t)  # recycle: episode is over

    out = []
    for name in env_names:
        eps = episodes[name]
        out.append({
            "env": eps[0].env_name,
            "return_mean": float(np.mean([e.episode_return for e in eps])),
            "return_std": float(np.std([e.episode_return for e in eps])),
            "length_mean": float(np.mean([e.episode_length for e in eps])),
            "num_trials": len(eps),
        })
    return out


def shard_envs(env_names: Sequence[str],
               process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> List[str]:
    """Round-robin env sharding across hosts
    (reference: evaluate_rl.py:452-466 chunks across world size)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [e for i, e in enumerate(env_names) if i % pc == pi]


def parallel_evaluate_envs(
    model, params, env_names: Sequence[str],
    make_tokenized_env: Callable[[str], TokenizedEnv], **kwargs
) -> List[Dict[str, float]]:
    """Evaluate this host's env shard; gather across hosts when distributed."""
    from bdm_db1_tpu.eval.decode import DecoderPool

    pool = kwargs.pop("decoder_pool", None) or DecoderPool(model, params)
    local = [
        evaluate_env(model, params, lambda n=name: make_tokenized_env(n),
                     decoder_pool=pool, **kwargs)
        for name in shard_envs(env_names)
    ]
    if jax.process_count() > 1:  # pragma: no cover (multi-host only)
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(local)
        return [r for host in gathered for r in host]
    return local
