"""Jitted autoregressive action decoding with on-device memory carry.

The reference decodes one action dimension per Python-level forward with a
host<->device ping-pong per token (reference: src/evaluation/evaluate_rl.py:157-266).
Here the whole per-env-step decode is ONE device program:

    prime forward over [obs || sep] (or [prompt || obs || sep] at episode
    start) -> lax.scan over action dims, each feeding back the previous
    argmax token with local-timestep id 0 -> final forward of the last
    action token folds it into the segment memory (the reference does this
    as an extra host-driven call, evaluate_rl.py:245-260).

Only the [action_length] action-token vector crosses back to the host.
Logit masking uses additive biases from ``VocabLayout`` (exact semantics of
masked_logits_for_action, reference: evaluate_rl.py:96-124); per-step env
action masks enter as a runtime bias argument, so no recompilation.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from collections import OrderedDict

from bdm_db1_tpu.core.vocab import VocabLayout
from bdm_db1_tpu.data.packing import action_flags_and_position_ids
from bdm_db1_tpu.models.transformer_xl import TransformerXL


class _LRU:
    """Tiny bounded cache for device-resident decode constants: with
    strict_length=False every new sampled prime length would otherwise pin
    another set of arrays for the decoder's lifetime (r2 advisor finding).
    Hot keys (the q=1 step entry, the steady-state prime geometry) are
    touched every decode and never age out."""

    def __init__(self, cap: int):
        self.cap = cap
        self._d: OrderedDict = OrderedDict()

    def get(self, key, make):
        if key in self._d:
            self._d.move_to_end(key)
            return self._d[key]
        val = make()
        self._d[key] = val
        if len(self._d) > self.cap:
            self._d.popitem(last=False)
        return val

    def __len__(self) -> int:
        return len(self._d)

    def __contains__(self, key) -> bool:
        return key in self._d

    def __getitem__(self, key):
        return self._d[key]


def fold_env_mask_bias(base_bias: np.ndarray, layout: VocabLayout,
                       discrete_action: bool, num_actions,
                       env_action_mask) -> np.ndarray:
    """Fold an env-supplied 0/1 action mask ([n] or [B, n]) into a base
    logit bias (reference: evaluate_rl.py:119-123). Shared by the memory
    (ActionDecoder) and stateless (WindowDecoder) paths."""
    if env_action_mask is None or not discrete_action:
        return base_bias
    m = np.asarray(env_action_mask, np.float32)
    extra = np.abs(m - 1) * 1e10
    lo = layout.discrete_offset
    hi = lo + num_actions
    if m.ndim == 1:
        bias = base_bias.copy()
        bias[lo:hi] -= extra
    else:
        bias = np.broadcast_to(
            base_bias, (m.shape[0],) + base_bias.shape).copy()
        bias[:, lo:hi] -= extra
    return bias


@partial(jax.jit, static_argnums=(2,))
def _fold_mask_dev(base_bias, mask, lo: int):
    """base_bias [B, V] with (1-mask)*1e10 subtracted over the discrete
    action id range — the device-side half of fold_env_mask_bias."""
    n = mask.shape[1]
    extra = (1.0 - mask) * 1e10
    return base_bias.at[:, lo:lo + n].add(-extra)


DEFAULT_OBS_BUCKETS = (8, 16, 24, 32, 48, 64, 96, 128, 192, 256)


def _bucket_for(width: int, buckets) -> Optional[int]:
    """Smallest canonical bucket >= width (None: beyond the ladder —
    the call keeps its exact width and compiles per width)."""
    for b in buckets:
        if b >= width:
            return b
    return None


class SharedDecodePrograms:
    """Compiled decode programs + device-resident positional projections,
    shared across the :class:`ActionDecoder` instances of one
    :class:`DecoderPool`.

    A decoder is cheap Python state per env geometry; what costs 10-15
    min per shape at 1.2B (remote AOT) is the jitted step program, and
    what costs ~200 MB HBM per prime length is the precomputed ``r_net``
    projection. Both are functions of (model, action_length, padded
    prime widths) only — NOT of the env's obs length once geometry
    bucketing pads primes to canonical widths — so pooling them here is
    what turns the 870-env suite's geometry spread into O(#buckets x
    #action-lengths) compiles (SURVEY.md §7 hard part 5; reference
    compiles nothing but pays a host round trip per token instead,
    src/evaluation/evaluate_rl.py:177-258)."""

    def __init__(self, model: TransformerXL):
        self.model = model
        self._jit = {}
        self.rk_cache = _LRU(8)
        self._jit_rk = jax.jit(
            lambda v, q: model.apply(v, q,
                                     method=TransformerXL.precompute_rk),
            static_argnums=(1,))

    def jit_decode(self, action_length: int, use_kv_cache: bool):
        key = ("classic", action_length, use_kv_cache)
        if key not in self._jit:
            self._jit[key] = jax.jit(
                partial(_decode_step, self.model, action_length,
                        use_kv_cache),
                donate_argnums=(3,),
                # frame_splits, defer_last
                static_argnums=(8, 9))
        return self._jit[key]

    def jit_decode_spec(self, action_length: int):
        key = ("spec", action_length)
        if key not in self._jit:
            self._jit[key] = jax.jit(
                partial(_decode_step_spec, self.model, action_length),
                donate_argnums=(3,),
                # frame_splits, tail, defer_last
                static_argnums=(9, 11, 12))
        return self._jit[key]

    def rk_for(self, params, qlen: int):
        return self.rk_cache.get(
            qlen, lambda: self._jit_rk({"params": params}, qlen))


class ActionDecoder:
    """Per-environment-geometry greedy decoder (jit cache per prime qlen)."""

    def __init__(
        self,
        model: TransformerXL,
        params,
        layout: VocabLayout,
        obs_length: int,
        action_length: int,
        discrete_action: bool,
        num_actions: Optional[int] = None,
        mesh=None,
        shared: Optional[SharedDecodePrograms] = None,
        pad_buckets=None,
    ):
        self.model = model
        self.params = params
        self.layout = layout
        # multi-chip decode: with a jax.sharding.Mesh the ring cache shards
        # batch over "data" (independent env rows) and heads over "model"
        # (Megatron TP, matching the trunk weight shardings — pass params
        # through shard_decode_params), inputs shard over "data", and XLA
        # propagates the shardings through the jitted decode, inserting
        # the TP collectives. The reference serves one env per GPU process
        # (evaluate_rl.py:452-466, DP only); this adds TP serving — lower
        # per-action latency and O(devices) cohort capacity. The fused
        # ring kernels (q == 1 steps AND all-pairs primes) run under a
        # shard_map over ("data", "model") — a pallas_call is opaque to the
        # pjit partitioner, so the shard_map is what keeps the fused path
        # on the mesh (flash_ring_decode/flash_ring_prime_ap mesh=...; the
        # (q, h) column flattening happens inside the per-shard body, so
        # heads partition contiguously). Per-shard heads must keep the
        # kernels' lowering constraints, else _use_flash_decode gates back
        # to the XLA ring branch.
        self.mesh = mesh
        if (mesh is not None and model.cfg.decode_flash != "off"
                and getattr(model, "decode_mesh", None) is not mesh):
            model = model.clone(decode_mesh=mesh)
            self.model = model
        self.obs_length = int(obs_length)
        self.action_length = int(action_length)
        self.discrete_action = discrete_action
        if discrete_action:
            assert num_actions is not None
            base = layout.discrete_action_logit_bias(num_actions)
        else:
            base = layout.continuous_action_logit_bias()
        self._base_bias = base
        self._num_actions = num_actions
        # K/V-cache fast path (exact for post-LN, ~10x cheaper per token);
        # pre-LN falls back to reference-style hidden-state memory.
        self.use_kv_cache = not model.cfg.pre_lnorm and model.cfg.mem_len > 0
        # last-action deferral (decode_async defer_last/deferred_tok): the
        # final scan iteration of a decode exists only to fold action token
        # n-1 into the cache (its logits are a throwaway); deferring that
        # token into the NEXT call's prime saves one full forward per env
        # step (1 of ~7 at the flagship geometry). Exact under the same
        # condition as chunked priming: same_length ring attention, where
        # every query sees exactly mem_len keys regardless of how the token
        # stream is split into forwards.
        self.defers = self.use_kv_cache and model.cfg.same_length
        # speculative (Jacobi) greedy decode (ModelConfig.decode_speculative):
        # ALL action tokens defer into the next prime; the current step's
        # tokens are guessed from the previous step's action (control
        # policies are temporally smooth), verified as a query-only tail of
        # the prime forward, and corrected by an on-device while_loop of
        # commit-nothing verify forwards. 1 forward per env step at full
        # acceptance vs 1 + (action_length - 1) sequentially; worst case
        # (every guess wrong every round) equals the sequential count.
        self.speculates = ((bool(getattr(model.cfg, "decode_speculative",
                                         False))
                            or bool(getattr(model.cfg,
                                            "decode_spec_adaptive", False)))
                           and self.defers and not discrete_action
                           and self.action_length > 1)
        # adaptive mode: the decoder exposes BOTH compiled paths and the
        # per-chain AdaptiveSpecSession picks one per call; a bare
        # decode()/decode_async() (no session) still speculates every step
        self.spec_adaptive = (self.speculates and bool(
            getattr(model.cfg, "decode_spec_adaptive", False)))
        # how many trailing action tokens of a decode the caller must carry
        # into the next call's deferred_tok (1 = classic defer_last)
        self.defer_width = self.action_length if self.speculates else 1
        # geometry-bucket coarsening: primes pad up to canonical widths
        # with query-only rows so different obs lengths share one
        # compiled program per bucket (SURVEY.md §7 hard part 5).
        # Composes with speculative decode — the in-jit layout becomes
        # [real || guesses || pads], so the guess tail still directly
        # follows the real prefix (decode_rl_kv_ring real_q+spec_tail).
        if pad_buckets == "default":
            pad_buckets = DEFAULT_OBS_BUCKETS
        self.pad_buckets = (tuple(sorted(pad_buckets)) if pad_buckets
                            and self.use_kv_cache
                            and self.model.cfg.same_length else None)
        # compiled programs + rk projections shared across the pool's
        # decoders (10-15 min AOT compile / ~200 MB HBM per prime width
        # at 1.2B; donate the memory/cache carry — without it every step
        # copies the whole [n_layer, B, mem_len, ...] cache)
        self._shared = shared if shared is not None \
            else SharedDecodePrograms(self.model)
        if self.speculates:
            # cold-start guess (episode's first step): the mid-range
            # continuous bin (~action 0.0); wrong guesses only cost verify
            # rounds, never correctness
            self._default_guess = int(
                layout.continuous_offset + layout.num_continuous_bin // 2)
            self._jit_decode_spec = self._shared.jit_decode_spec(
                self.action_length)
        self._jit_decode = self._shared.jit_decode(
            self.action_length, self.use_kv_cache)
        # maskless (continuous-action) steps reuse one device-resident
        # [B, V] bias instead of re-uploading ~2 MB per step; position ids
        # are pure functions of the prime length — cache both
        self._bias_dev_cache = _LRU(8)
        self._pos_cache = _LRU(16)

    def _dev(self, x, *axes):
        """Host array -> device; on a mesh, shard by the given axis names
        (inputs placed once here let jit propagate shardings end to end).
        An axis whose size doesn't divide its mesh axis falls back to
        replicated — e.g. a single-env (batch 1) episode on a dp > 1 mesh
        still runs, TP-sharded only."""
        if self.mesh is None:
            return jnp.asarray(x)
        from jax.sharding import NamedSharding, PartitionSpec

        x = jnp.asarray(x)
        axes = tuple(
            ax if (ax is None or x.shape[i] % self.mesh.shape[ax] == 0)
            else None
            for i, ax in enumerate(axes))
        return jax.device_put(
            x, NamedSharding(self.mesh, PartitionSpec(*axes)))

    def _rk_for(self, qlen: int):
        if not self.use_kv_cache:
            return None
        return self._shared.rk_for(self.params, qlen)

    def init_mems(self, batch_size: int = 1):
        if self.use_kv_cache:
            mems = self.model.apply(
                {"params": self.params}, batch_size,
                method=TransformerXL.init_kv_cache_ring)
            if self.mesh is not None:
                from bdm_db1_tpu.parallel.mesh import ring_cache_shardings

                data = ("data" if batch_size % self.mesh.shape["data"] == 0
                        else None)
                mems = jax.device_put(
                    mems, ring_cache_shardings(self.mesh, mems, data=data))
            return mems
        mems = self.model.apply(
            {"params": self.params}, batch_size,
            method=TransformerXL.init_mems)
        if self.mesh is not None:  # hidden-state memory: [L, B, M, D]
            mems = self._dev(mems, None, "data", None, None)
        return mems

    def bias_with_env_mask(self, env_action_mask) -> np.ndarray:
        return fold_env_mask_bias(
            self._base_bias, self.layout, self.discrete_action,
            self._num_actions, env_action_mask)

    def decode(
        self,
        prime_tokens: np.ndarray,      # [q] or [B, q] int
        mems,                          # [n_layer, B, mem_len, ...]
        prime_images: Optional[np.ndarray] = None,  # [(B,) T, H, W, C]
        env_action_mask=None,
        deferred_tok: Optional[np.ndarray] = None,
        defer_last: bool = False,
        speculate: Optional[bool] = None,
        guess_tok: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, object]:
        """Greedy-decode one action per batch row; returns (action token ids
        [action_length] or [B, action_length], new mems). Prime sequences
        must start at a transition boundary. Batched rows amortize the
        host<->device round trip across environments (the reference decodes
        one env per process, evaluate_rl.py:452-466)."""
        single = prime_tokens.ndim == 1
        act, new_mems = self.decode_async(
            prime_tokens, mems, prime_images, env_action_mask,
            deferred_tok=deferred_tok, defer_last=defer_last,
            speculate=speculate, guess_tok=guess_tok)
        act = np.asarray(act)
        return (act[0] if single else act), new_mems

    def decode_async(
        self,
        prime_tokens: np.ndarray,
        mems,
        prime_images: Optional[np.ndarray] = None,
        env_action_mask=None,
        deferred_tok: Optional[np.ndarray] = None,
        defer_last: bool = False,
        speculate: Optional[bool] = None,
        guess_tok: Optional[np.ndarray] = None,
    ) -> Tuple[object, object]:
        """Like :meth:`decode` but returns the action tokens as a device
        array WITHOUT blocking — the dispatch is async, so the caller can
        overlap host work (stepping another cohort's envs) with this
        cohort's device compute (eval/harness.py interleaved lockstep).

        ``defer_last=True`` (only when :attr:`defers`) skips the trailing
        cache-fold forward; the caller MUST feed this call's last action
        token back as the next call's ``deferred_tok`` ([B] or [] int), and
        the episode's token stream stays identical — the deferred token is
        simply written by the next prime instead of its own forward.

        ``speculate`` (adaptive mode) picks the path per call: None keeps
        the decoder default (speculative whenever :attr:`speculates`);
        False forces the classic per-dim scan. ``guess_tok`` ([B, >=S]
        int, optional) supplies the speculative guesses explicitly — the
        previous step's full action block — for calls whose
        ``deferred_tok`` carries fewer than action_length tokens (a classic
        defer_last step only leaves ONE uncommitted token behind, but the
        whole previous action is still the right smoothness guess).
        """
        single = prime_tokens.ndim == 1
        if single:
            prime_tokens = prime_tokens[None]
            if prime_images is not None:
                prime_images = prime_images[None]
            if guess_tok is not None:
                guess_tok = np.asarray(guess_tok).reshape(1, -1)
        defer_last = defer_last and self.defers
        lead = 0
        deferred = None
        if deferred_tok is not None:
            assert self.defers, "deferred_tok needs same_length ring decode"
            dt = np.asarray(deferred_tok, np.int64)
            if single:
                dt = dt.reshape(1, -1)
            elif dt.ndim <= 1:          # one token per row (defer_width 1)
                dt = np.broadcast_to(
                    dt.reshape(-1), (prime_tokens.shape[0],))[:, None]
            deferred = dt               # [B, defer_width]
            prime_tokens = np.concatenate([dt, prime_tokens], axis=1)
            lead = dt.shape[1]
        b, q = prime_tokens.shape

        # long primes run through the ring in <=_PRIME_CHUNK slices: the
        # fp32 [B, H, q, M+q] score buffers of a ~1000-token expert-prompt
        # prime are what exceed HBM at large batch (4.2 GB per layer at
        # 1.2B batch 32), not the cache. Image primes chunk at TRANSITION
        # boundaries (each transition carries a fixed image-slot count for
        # a fixed env geometry, so the per-slice frame split is static —
        # r2 VERDICT next #2 lifted the old no-image restriction); primes
        # that don't align to transition boundaries fall back to one-shot.
        # chunking is only exact under same_length (every query sees
        # exactly mem_len keys, so consecutive ring calls attend the same
        # set as one call); plain-causal configs attend the full in-call
        # prefix and must prime one-shot (verified numerically: bit-equal
        # with same_length, ~4e-4 logit drift without)
        chunk = _prime_chunk(self.model.cfg)
        M = self.model.cfg.mem_len
        n_frames = (int(prime_images.shape[1])
                    if prime_images is not None else None)
        sizes = frame_splits = None
        if (self.use_kv_cache and q > chunk
                and self.model.cfg.same_length):
            # the chunk plan describes the prime proper; a deferred lead
            # token rides in the first slice (it is not a -1 slot, so the
            # frame splits are untouched)
            qp = q - lead
            if prime_images is None:
                sizes = [chunk] * (qp // chunk)
                if qp % chunk:
                    sizes.append(qp % chunk)
            else:
                plan = self._image_chunk_plan(qp, n_frames)
                if plan is not None:
                    sizes, frame_splits = plan
            if sizes is not None and lead:
                if sizes[0] + lead <= chunk:
                    sizes[0] += lead
                else:
                    # first slice already at the chunk budget (== mem_len
                    # on small configs): the lead token gets its own
                    # 1-token slice — exactly the old fold forward, still
                    # one program
                    sizes.insert(0, lead)
                    if frame_splits is not None:
                        frame_splits = (0,) + tuple(frame_splits)
        spec_now = self.speculates if speculate is None \
            else (bool(speculate) and self.speculates)
        # geometry-bucket padding: pad the single-slice prime — or the
        # chunked prime's last slice — up to a canonical width with
        # query-only rows (real_q operand, decode_rl_kv_ring), so envs
        # with different obs lengths share one compiled program and one
        # rk projection per bucket (SURVEY.md §7 hard part 5). On the
        # speculative path the guess tail must also fit the ring call
        # (bucket + S <= mem_len) — the jit reorders the padded slice to
        # [real || guesses || pads]. Exact vs unpadded:
        # tests/test_geometry_buckets.py.
        pad_n, real_last = 0, None
        if self.pad_buckets is not None:
            spec_room = (self.action_length - 1) if spec_now else 0
            cap = min(chunk, M - spec_room)
            if sizes is None and q <= M:
                W = _bucket_for(q, self.pad_buckets)
                if W is not None and q < W <= cap:
                    pad_n, real_last = W - q, q
            elif sizes is not None:
                t = sizes[-1]
                W = _bucket_for(t, self.pad_buckets)
                if W is not None and t < W <= cap:
                    pad_n, real_last = W - t, t
                    sizes = sizes[:-1] + [W]
        if pad_n:
            prime_tokens = np.pad(prime_tokens, ((0, 0), (0, pad_n)))

        def _make_pos():
            _, p = action_flags_and_position_ids(
                q - lead, self.obs_length, self.action_length, 0)
            if lead:  # deferred action tokens carry the action slot id 0
                p = np.concatenate([np.zeros(lead, p.dtype), p])
            if pad_n:  # bucket pads are query-only; any id works
                p = np.concatenate([p, np.zeros(pad_n, p.dtype)])
            # device-resident: position ids are a pure function of the
            # prime geometry, and re-uploading them each step costs a
            # tunnel round trip (~27 ms) in remote-TPU setups
            return self._dev(
                np.broadcast_to(p.astype(np.int32)[None], (b, q + pad_n)),
                "data", None)

        pos = self._pos_cache.get((b, q, lead, pad_n), _make_pos)
        bias_dev = self._bias_dev_cache.get(b, lambda: self._dev(
            np.broadcast_to(self._base_bias,
                            (b,) + self._base_bias.shape), "data", None))
        if env_action_mask is not None and self.discrete_action:
            # fold the per-step env mask on DEVICE: only the [B, n] mask
            # crosses the host->device boundary, not a fresh [B, V] f32
            # bias (~5 MB/step at batch 40 — a real cost on a remote-TPU
            # tunnel; reference folds host-side, evaluate_rl.py:119-123)
            m = np.asarray(env_action_mask, np.float32)
            if m.ndim == 1:
                m = np.broadcast_to(m, (b,) + m.shape)
            bias_dev = _fold_mask_dev(bias_dev, self._dev(m, "data", None),
                                      self.layout.discrete_offset)
        tokens = self._dev(prime_tokens.astype(np.int32), "data", None)
        images = (self._dev(np.asarray(prime_images, np.float32), "data")
                  if prime_images is not None else None)
        if spec_now:
            return self._dispatch_spec(tokens, pos, mems, bias_dev, images,
                                       sizes, frame_splits, q + pad_n,
                                       deferred, defer_last, guess_tok,
                                       real_last)
        rk_chunks = (tuple(self._rk_for(s) for s in sizes)
                     if sizes is not None else (self._rk_for(q + pad_n),))
        act_tokens, new_mems = self._jit_decode(
            {"params": self.params}, tokens, pos, mems,
            bias_dev, images, rk_chunks, self._rk_for(1), frame_splits,
            defer_last,
            None if real_last is None else np.int32(real_last))
        return act_tokens, new_mems

    def _dispatch_spec(self, tokens, pos, mems, bias_dev, images, sizes,
                       frame_splits, q, deferred, defer_last,
                       guess_tok=None, real_last=None):
        """Assemble the speculative decode call: persistence guesses from
        the deferred previous action (or an explicit ``guess_tok``, or the
        mid-range cold guess), the ring slice plan with the guess tail
        riding the last slice, and the per-qlen positional projections."""
        S = self.action_length - 1
        b = tokens.shape[0]
        M = self.model.cfg.mem_len
        if guess_tok is not None:
            guesses = np.asarray(guess_tok, np.int64)[:, :S]
        elif (deferred is not None
                and deferred.shape[1] == self.action_length):
            guesses = deferred[:, :S]
        else:
            guesses = np.full((b, S), self._default_guess, np.int64)
        tail = True
        if sizes is None and q <= M:
            sizes = [q]
        if sizes is None:
            tail = False                 # window-slide prime (q > mem_len)
        elif sizes[-1] + S > M:
            # the guess tail must fit the ring call's q <= mem_len bound
            # (never hit for bucket-padded slices: their cap is M - S)
            assert real_last is None, (sizes, S, M)
            if images is None and M - S >= 1:
                t = sizes[-1]
                sizes[-1:] = [t - (M - S), M - S]
            else:
                # image slices can't re-split (transition alignment / the
                # single-slice whole-frame window): commit the prime plain
                # and let the verify loop do round 1
                tail = False
        if sizes is not None:
            rk_chunks = tuple(
                self._rk_for(s + (S if (tail and i == len(sizes) - 1)
                                  else 0))
                for i, s in enumerate(sizes))
        else:
            rk_chunks = (self._rk_for(q),)
        # a padded slice always carries the guess tail (its bucket cap is
        # M - S, so the tail can never be dropped for space)
        assert tail or real_last is None
        act, new_mems, rounds = self._jit_decode_spec(
            {"params": self.params}, tokens, pos, mems, bias_dev, images,
            rk_chunks, self._rk_for(S),
            None if defer_last else self._rk_for(self.action_length),
            frame_splits, self._dev(np.asarray(guesses, np.int32),
                                    "data", None), tail,
            defer_last,
            None if real_last is None else np.int32(real_last))
        # verify rounds of the last call (device scalar, no sync): rounds+1
        # total forwards vs action_length sequentially — bench.py reports
        # the mean as the acceptance diagnostic
        self.last_spec_rounds = rounds
        return act, new_mems

    def _image_chunk_plan(self, q: int, n_frames: int):
        """Transition-aligned prime slicing for image geometries.

        A prime is [T whole transitions || obs || sep] with one image frame
        per obs region; slicing at transition boundaries keeps every slice's
        -1-slot count static, so each slice consumes a static ``[B, f, ...]``
        frame window (embed_rl assigns the j-th -1 run the j-th frame,
        models/transformer_xl.py embed_rl). Returns
        (slice sizes, frames per slice) or None when the prime doesn't
        decompose that way (multi-image observations, non-boundary primes,
        or a transition longer than the chunk budget)."""
        step = self.obs_length + self.action_length + 1
        tail = self.obs_length + 1
        chunk = _prime_chunk(self.model.cfg)
        if (q - tail) % step != 0 or step > chunk:
            return None
        n_trans = (q - tail) // step
        if n_frames != n_trans + 1:  # one frame per obs region, + reset obs
            return None
        t_per = chunk // step
        sizes, frames = [], []
        rem = n_trans
        while rem > 0:
            t = min(t_per, rem)
            sizes.append(t * step)
            frames.append(t)
            rem -= t
        if sizes and sizes[-1] + tail <= chunk:
            sizes[-1] += tail
            frames[-1] += 1
        else:
            sizes.append(tail)
            frames.append(1)
        return sizes, tuple(frames)


class SpecController:
    """Host-side policy for adaptive speculation: speculate while the
    verify-rounds EWMA stays below the measured break-even, fall back to
    the classic per-dim scan when it doesn't, and probe periodically to
    re-enter once the policy smooths out.

    The thresholds come from the 1.2B b40 measurements (PERFORMANCE.md):
    actions/sec is ~linear in rounds_mean between the endpoints (~304 at
    1.13, 187.4 at the all-rejected max of S=5) and crosses the classic
    path's 245 near rounds_mean ~3 — hence exit at 3.0 with re-entry
    hysteresis at 2.5. Pure host arithmetic; unit-testable without a
    device (tests/test_speculative.py)."""

    def __init__(self, *, exit_rounds: float = 3.0,
                 reenter_rounds: float = 2.5, probe_every: int = 64,
                 alpha: float = 0.25, min_obs: int = 4):
        self.exit_rounds = float(exit_rounds)
        self.reenter_rounds = float(reenter_rounds)
        self.probe_every = int(probe_every)
        self.alpha = float(alpha)
        self.min_obs = int(min_obs)
        self.spec_mode = True
        self.ewma: Optional[float] = None
        self.n_obs = 0
        self.switches = 0          # diagnostics: mode flips so far
        self.spec_steps = 0        # diagnostics: steps run speculatively
        self.total_steps = 0
        self.rounds_sum = 0.0      # diagnostics: over observed spec steps
        self.rounds_n = 0
        self._since_probe = 0
        self._probing = False

    def decide(self) -> bool:
        """Call once per decode step, before dispatch."""
        self.total_steps += 1
        if self.spec_mode:
            self._probing = False
            self.spec_steps += 1
            return True
        self._since_probe += 1
        if self._since_probe >= self.probe_every:
            self._since_probe = 0
            self._probing = True
            self.spec_steps += 1
            return True
        self._probing = False
        return False

    def observe(self, rounds: float) -> None:
        """Feed the verify-rounds count of a speculative step (host float;
        the caller fetches it alongside the action tokens, so no extra
        device round trip)."""
        r = float(rounds)
        self.rounds_sum += r
        self.rounds_n += 1
        if self._probing:
            # a probe's single sample decides re-entry (with hysteresis);
            # the EWMA restarts from it so a stale bad average can't veto
            if r <= self.reenter_rounds:
                self.spec_mode = True
                self.switches += 1
                self.ewma, self.n_obs = r, 1
            return
        self.ewma = r if self.ewma is None \
            else (1 - self.alpha) * self.ewma + self.alpha * r
        self.n_obs += 1
        # min_obs keeps one cold-start miss (the episode's first guesses
        # are the mid-range default) from instantly exiting
        if (self.spec_mode and self.n_obs >= self.min_obs
                and self.ewma > self.exit_rounds):
            self.spec_mode = False
            self.switches += 1
            self._since_probe = 0


class AdaptiveSpecSession:
    """Per-decode-chain driver for adaptive speculation.

    One :class:`ActionDecoder` is shared across cohorts (DecoderPool
    shares by geometry), so the adaptive state — speculate-or-not, the
    rounds EWMA, the previous action block used as guesses — lives here,
    one session per episode chain. The caller keeps owning the deferred
    carry; :attr:`defer_width` says how many trailing action tokens this
    call left uncommitted (action_length after a speculative step, 1
    after a classic defer_last step).

    Both paths produce the greedy actions bit-exactly on the exact-cache
    path, so mode switches never change episode behavior — only
    throughput (the safety property that lets speculation default on for
    arbitrary policies; the non-adaptive flag costs 22% when guesses
    never land, PERFORMANCE.md)."""

    def __init__(self, decoder: "ActionDecoder",
                 controller: Optional[SpecController] = None):
        assert getattr(decoder, "speculates", False), \
            "adaptive speculation needs a speculative-capable decoder"
        self.decoder = decoder
        if controller is None:
            # break-even scales with the per-step forwards speculation can
            # save: measured ~3.0 rounds at the flagship's S = 5
            # (PERFORMANCE.md), i.e. ~0.6 * S
            S = decoder.action_length - 1
            controller = SpecController(exit_rounds=0.6 * S,
                                        reenter_rounds=0.5 * S)
        self.ctl = controller
        self.last_was_spec = True
        self.defer_width = decoder.action_length
        self._guess = None           # previous action block [B, A] (host)
        self._rounds_dev = None      # unfetched device scalar
        reg = getattr(decoder, "spec_sessions", None)
        if reg is not None:          # opt-in registry (DecoderPool)
            reg.append(self)

    def decode_async(self, prime_tokens, mems, **kw):
        spec = self.ctl.decide()
        act, mems = self.decoder.decode_async(
            prime_tokens, mems, speculate=spec, guess_tok=self._guess,
            **kw)
        self.last_was_spec = spec
        self.defer_width = (self.decoder.action_length if spec else 1)
        self._rounds_dev = self.decoder.last_spec_rounds if spec else None
        return act, mems

    def harvest(self, pending) -> np.ndarray:
        """Block on a pending decode; returns the action tokens [B, A].
        Fetches the step's verify-rounds scalar in the same transfer
        (device_get overlaps the leaf copies) and advances the
        controller; keeps the action block as the next step's guesses."""
        if self._rounds_dev is not None:
            act, r = jax.device_get((pending, self._rounds_dev))
            act = np.asarray(act)
            self.ctl.observe(float(r))
            self._rounds_dev = None
        else:
            act = np.asarray(pending)
        self._guess = act
        return act

    def decode(self, prime_tokens, mems, **kw):
        act, mems = self.decode_async(prime_tokens, mems, **kw)
        act = self.harvest(act)
        # mirror ActionDecoder.decode's single-row squeeze
        return (act[0] if prime_tokens.ndim == 1 else act), mems

    def prewarm(self, prime_tokens, prime_images=None,
                env_action_mask=None, widths=None) -> None:
        """Compile every decode program this session can dispatch at the
        given steady prime geometry — both modes (speculative and the
        classic per-dim scan) at every deferred lead width a mode switch
        can produce (1 after a classic step, action_length after a
        speculative one) — against scratch memory, then discard.

        Serving setups (and bench.py) call this once at startup: without
        it, the session's FIRST mode switch lands a fresh 1.2B program
        compile (minutes over the remote-AOT tunnel) in the middle of a
        live episode — measured as a 47 actions/sec artifact when the
        switch fell inside bench.py's timed region. Controller and guess
        state are untouched; only the jit caches warm up.

        Threads ONE scratch cache set through all the programs (the mems
        carry is donated, so each run reuses the previous run's buffers in
        place) — at 1.2B / B=40 the ring caches are a large fraction of
        HBM and a fresh set per program OOMs the chip next to the
        caller's live caches."""
        p = np.asarray(prime_tokens)
        if p.ndim == 1:
            p = p[None]
            if prime_images is not None:
                prime_images = np.asarray(prime_images)[None]
        B = p.shape[0]
        A = self.decoder.action_length
        if widths is None:
            widths = (1, A)
        guess = np.full((B, A), self.decoder._default_guess, np.int64)
        mems = self.decoder.init_mems(B)
        for spec in (True, False):
            for w in widths:
                act, mems = self.decoder.decode_async(
                    p, mems, prime_images=prime_images,
                    env_action_mask=env_action_mask,
                    deferred_tok=guess[:, :w], defer_last=True,
                    speculate=spec, guess_tok=guess)
                np.asarray(act)      # block: compile + run to completion


def _prime_chunk(model_cfg) -> int:
    """Max tokens per ring prime slice (also bounds q <= mem_len)."""
    return min(256, model_cfg.mem_len)


def _decode_step(model, action_length, use_kv_cache, variables, tokens, pos,
                 mems, bias, images, rk_chunks=None, rk_step=None,
                 frame_splits=None, defer_last=False, real_q=None):
    """prime forward + scan over action dims, entirely on device.

    tokens/pos: [B, q]; bias: [B, V]; returns ([B, action_length], mems).
    The KV path is ring-buffered end to end: the multi-token prime and the
    single-token action steps both write their K/V rows in place at the
    ring cursor — no full-cache roll/concat/slice ever runs (those were ~8
    full-cache HBM passes per env step at 1.2B, ~40 ms of the 154 ms step).
    ``rk_chunks`` holds one precomputed positional projection per prime
    slice: a same_length prime of any length runs as consecutive ring calls
    (exact under same_length — every query sees exactly mem_len keys,
    tests/test_kv_cache.py chunked-vs-one-shot coverage), which caps the
    fp32 score buffers AND subsumes q > mem_len. Image primes chunk too,
    sliced at transition boundaries with ``frame_splits`` static frames
    per slice (ActionDecoder._image_chunk_plan). Plain-causal or
    non-boundary-aligned primes arrive with a single rk entry and take the
    one-shot paths.

    ``real_q`` (dynamic int32 scalar) marks geometry-bucket padding: the
    LAST slice (or the single-slice prime) carries ``last_size - real_q``
    trailing pad tokens that are query-only — decode_rl_kv_ring reads the
    first-action logits at the real last token and commits real rows
    only, so envs whose obs length differs share one compiled program per
    bucket width (eval/decode.py ActionDecoder pad_buckets)."""
    b, q = tokens.shape
    if use_kv_cache:
        if len(rk_chunks) > 1:          # chunked prime (image or not)
            logits = None
            start = f0 = 0
            last = len(rk_chunks) - 1
            for ci, rk_c in enumerate(rk_chunks):  # static unroll
                size = rk_c.shape[1] - model.cfg.mem_len
                img_c = None
                if images is not None:
                    nf = frame_splits[ci]
                    if nf:  # a lead-token slice carries no frames
                        img_c = jax.lax.slice_in_dim(
                            images, f0, f0 + nf, axis=1)
                        f0 += nf
                logits, mems = model.apply(
                    variables,
                    jax.lax.slice_in_dim(tokens, start, start + size, axis=1),
                    jax.lax.slice_in_dim(pos, start, start + size, axis=1),
                    mems, rk_c, img_c,
                    real_q=(real_q if ci == last else None),
                    method=TransformerXL.decode_rl_kv_ring)
                start += size
        elif q <= model.cfg.mem_len:
            logits, mems = model.apply(
                variables, tokens, pos, mems, rk_chunks[0], images,
                real_q=real_q,
                method=TransformerXL.decode_rl_kv_ring)
        else:
            # an image prime longer than the window that does NOT align to
            # transition boundaries (so _image_chunk_plan refused to slice
            # it) can't ring-scatter in one shot (slots would collide);
            # realign once and take the window-slide path. Never hit at
            # flagship geometry (mem_len == n_position bounds q).
            from bdm_db1_tpu.models.transformer_xl import (
                dequantize_kv, quantize_kv_rows,
            )

            quant = "k_scale" in mems
            dt = jnp.dtype(model.cfg.dtype)
            if quant:  # dequantize in ring layout, then realign
                ring = dict(mems)
                ring["k"] = dequantize_kv(mems["k"], mems["k_scale"], dt)
                ring["v"] = dequantize_kv(mems["v"], mems["v_scale"], dt)
            else:
                ring = mems
            aligned = model.apply(variables, ring,
                                  method=TransformerXL.align_ring_cache)
            logits, aligned = model.apply(
                variables, tokens, pos, aligned, images, rk_chunks[0],
                method=TransformerXL.decode_rl_kv)
            if quant:
                kq, ks = quantize_kv_rows(aligned["k"])
                vq, vs = quantize_kv_rows(aligned["v"])
                mems = {"k": kq, "v": vq, "k_scale": ks, "v_scale": vs,
                        "cursor": jnp.zeros((), jnp.int32)}
            else:
                mems = {"k": aligned["k"], "v": aligned["v"],
                        "cursor": jnp.zeros((), jnp.int32)}
    else:
        logits, mems = model.apply(
            variables, tokens, pos, mems, images,
            method=TransformerXL.decode_rl)
    tok0 = jnp.argmax(logits + bias, axis=-1).astype(jnp.int32)  # [B]

    zero_pos = jnp.zeros((b, 1), jnp.int32)

    def body(carry, _):
        tok, mems = carry
        if use_kv_cache:
            lg, mems = model.apply(
                variables, tok[:, None], zero_pos, mems, rk_step,
                method=TransformerXL.decode_rl_kv_ring)
        else:
            lg, mems = model.apply(
                variables, tok[:, None], zero_pos, mems,
                method=TransformerXL.decode_rl)
        nxt = jnp.argmax(lg + bias, axis=-1).astype(jnp.int32)
        return (nxt, mems), nxt

    if defer_last:
        # token n-1 is never fed: the caller carries it into the next
        # call's prime (deferred_tok), saving one full forward per step
        (_, mems), rest = jax.lax.scan(
            body, (tok0, mems), None, length=action_length - 1)
        act = jnp.concatenate([tok0[None], rest], axis=0)    # [n, B]
    else:
        (_, mems), rest = jax.lax.scan(
            body, (tok0, mems), None, length=action_length)
        # rest[i] is the token decoded after feeding token i; the last one
        # is a throwaway (the feed exists purely to fold token n-1 into
        # the memory)
        act = jnp.concatenate([tok0[None], rest[:-1]], axis=0)  # [n, B]
    return act.T, mems


def _leading_matches(ok):
    """Per-row length of the leading all-True run of ok [B, S]."""
    return jnp.sum(jnp.cumprod(ok.astype(jnp.int32), axis=1), axis=1)


def _decode_step_spec(model, action_length, variables, tokens, pos, mems,
                      bias, images, rk_chunks, rk_verify, rk_fold,
                      frame_splits, guesses, tail, defer_last,
                      real_q=None):
    """Speculative (Jacobi) greedy decode, entirely on device.

    tokens [B, w]: the commit block ([deferred previous action ||] obs ||
    sep); guesses [B, S = action_length-1]: predicted tokens for the first
    S action dims (the previous step's action — control policies are
    temporally smooth). The prime commits exactly as in :func:`_decode_step`
    but carries the guesses as a query-only tail (``spec_tail``) of its
    last ring slice, so its one forward yields greedy candidates for ALL
    action dims at once: position j's candidate is exact whenever guesses
    0..j-1 are. A device ``while_loop`` of commit-nothing verify forwards
    (q = S) then drives every row to the greedy fixed point — candidate 0
    is always exact, so each round confirms at least one more dim and the
    loop runs at most S rounds (the sequential-scan cost) and exactly 0
    rounds at full acceptance. Exactness is the chunked-priming argument:
    under same_length ring attention a query's key set is identical
    however the stream is split across forwards, and wrong guesses are
    never committed (their K/V rows don't write), so the final actions
    equal the sequential greedy ones bit-for-bit on the exact-cache path.

    With ``defer_last`` the confirmed block never commits here at all —
    it rides as the next call's ``deferred_tok`` lead (the generalization
    of defer_last from 1 to action_length tokens); otherwise a trailing
    fold forward commits it (``rk_fold``).

    Reference hot loop this replaces: one host-driven forward per action
    dim, evaluate_rl.py:177-258."""
    from bdm_db1_tpu.models.transformer_xl import TransformerXL

    b, q = tokens.shape
    S = action_length - 1
    M = model.cfg.mem_len
    gpos = jnp.zeros((b, S), jnp.int32)
    bias3 = bias[:, None, :]

    if q <= M or len(rk_chunks) > 1:
        # commit the prime slice by slice (static unroll); in tail mode the
        # last slice carries the guesses and returns [B, S+1, V] logits
        logits = None
        start = f0 = 0
        for ci, rk_c in enumerate(rk_chunks):
            is_last = ci == len(rk_chunks) - 1
            st = S if (tail and is_last) else 0
            size = rk_c.shape[1] - M - st
            tok_c = jax.lax.slice_in_dim(tokens, start, start + size, axis=1)
            pos_c = jax.lax.slice_in_dim(pos, start, start + size, axis=1)
            img_c = None
            if images is not None:
                if frame_splits is None:
                    img_c = images        # single-slice prime
                else:
                    nf = frame_splits[ci]
                    if nf:
                        img_c = jax.lax.slice_in_dim(
                            images, f0, f0 + nf, axis=1)
                        f0 += nf
            if st:
                if real_q is not None:
                    # bucket-padded slice: tok_c is [real || pads] from
                    # the host; rebuild as [real || guesses || pads] (the
                    # guess tail must directly follow the real prefix —
                    # in-call causal attention would otherwise let the
                    # guesses see the pad rows' K/V). Row-index gathers,
                    # dynamic in real_q only.
                    W = tok_c.shape[1]
                    iota = jnp.arange(W + S)
                    fp = tok_c[:, jnp.clip(iota, 0, W - 1)]
                    fg = guesses[:, jnp.clip(iota - real_q, 0, S - 1)
                                 ].astype(tok_c.dtype)
                    tok_c = jnp.where(
                        iota[None] < real_q, fp,
                        jnp.where(iota[None] < real_q + S, fg,
                                  jnp.zeros_like(fp)))
                    pp = pos_c[:, jnp.clip(iota, 0, W - 1)]
                    pos_c = jnp.where(iota[None] < real_q, pp,
                                      jnp.zeros_like(pp))
                else:
                    tok_c = jnp.concatenate(
                        [tok_c, guesses.astype(tok_c.dtype)], axis=1)
                    pos_c = jnp.concatenate([pos_c, gpos], axis=1)
            logits, mems = model.apply(
                variables, tok_c, pos_c, mems, rk_c, img_c,
                method=TransformerXL.decode_rl_kv_ring, spec_tail=st,
                real_q=(real_q if st else None))
            start += size
    else:
        # misaligned image prime longer than the window: same realign +
        # window-slide fallback as _decode_step (commits the prime; round
        # 1 then runs in the verify loop)
        from bdm_db1_tpu.models.transformer_xl import (
            dequantize_kv, quantize_kv_rows,
        )

        quant = "k_scale" in mems
        dt = jnp.dtype(model.cfg.dtype)
        if quant:
            ring = dict(mems)
            ring["k"] = dequantize_kv(mems["k"], mems["k_scale"], dt)
            ring["v"] = dequantize_kv(mems["v"], mems["v_scale"], dt)
        else:
            ring = mems
        aligned = model.apply(variables, ring,
                              method=TransformerXL.align_ring_cache)
        logits, aligned = model.apply(
            variables, tokens, pos, aligned, images, rk_chunks[0],
            method=TransformerXL.decode_rl_kv)
        if quant:
            kq, ks = quantize_kv_rows(aligned["k"])
            vq, vs = quantize_kv_rows(aligned["v"])
            mems = {"k": kq, "v": vq, "k_scale": ks, "v_scale": vs,
                    "cursor": jnp.zeros((), jnp.int32)}
        else:
            mems = {"k": aligned["k"], "v": aligned["v"],
                    "cursor": jnp.zeros((), jnp.int32)}

    if tail:
        # [B, S+1] candidates; leading guess matches are confirmed exact
        cand = jnp.argmax(logits + bias3, axis=-1).astype(jnp.int32)
        done0 = _leading_matches(guesses == cand[:, :S]) >= S
        carry0 = (cand[:, :S], cand, done0, jnp.zeros((), jnp.int32))
    else:
        c0 = jnp.argmax(logits + bias, axis=-1).astype(jnp.int32)  # [B]
        # candidates beyond dim 0 are unverified placeholders; done=False
        # forces at least one verify round
        c = jnp.concatenate([c0[:, None], guesses], axis=1)
        carry0 = (guesses, c, jnp.zeros((b,), bool),
                  jnp.zeros((), jnp.int32))

    def cond(carry):
        return ~jnp.all(carry[2])

    def body(carry):
        g, c, done, rounds = carry
        lg, _ = model.apply(
            variables, g, gpos, mems, rk_verify,
            method=TransformerXL.decode_rl_kv_ring, spec_tail=S)
        # position j's logits candidate action dim j+1; dim 0 is fixed
        # exact from the prime round
        c2 = jnp.argmax(lg + bias3, axis=-1).astype(jnp.int32)  # [B, S]
        c_new = jnp.concatenate([c[:, :1], c2], axis=1)
        done_new = done | (_leading_matches(g == c_new[:, :S]) >= S)
        return (c_new[:, :S], c_new, done_new, rounds + 1)

    _, act, _, rounds = jax.lax.while_loop(cond, body, carry0)

    if not defer_last:
        # fold the confirmed block so non-deferring callers get committed
        # memory (the deferring cohort rides it into the next prime)
        _, mems = model.apply(
            variables, act, jnp.zeros((b, action_length), jnp.int32), mems,
            rk_fold, method=TransformerXL.decode_rl_kv_ring)
    return act, mems, rounds


class DecoderPool:
    """Shares compiled decoders across environments with the same decode
    geometry (obs_len, act_len, action space) — with 870 envs many share
    geometries, so this caps recompiles at the number of distinct shapes
    (SURVEY.md §7 hard part 5)."""

    def __init__(self, model, params, mesh=None,
                 track_spec_sessions: bool = False, pad_buckets=None):
        # hoist the mesh clone out of ActionDecoder so every decoder (and
        # the shared program cache) binds ONE model instance — program
        # sharing is keyed by function identity
        if (mesh is not None and model.cfg.decode_flash != "off"
                and getattr(model, "decode_mesh", None) is not mesh):
            model = model.clone(decode_mesh=mesh)
        self.model = model
        self.mesh = mesh
        params = _maybe_quantize_weights(model, params)
        if mesh is not None:
            params = shard_decode_params(params, mesh)
        self.params = params
        self._cache = {}
        # compiled decode programs + rk projections shared across all of
        # this pool's decoders; with pad_buckets ("default" or a width
        # ladder) primes pad to canonical widths, so the whole 870-env
        # suite needs O(#buckets x #action-lengths) compiled programs
        # instead of one per obs length (SURVEY.md §7 hard part 5)
        self.shared = SharedDecodePrograms(model)
        self.pad_buckets = pad_buckets
        # opt-in diagnostics: when on, every AdaptiveSpecSession created
        # against this pool's decoders registers here, so a driver can
        # aggregate spec_fraction/rounds across cohorts (bench.py
        # production lines). Off by default — a long-lived server would
        # accumulate one small session record per episode.
        self.spec_sessions = [] if track_spec_sessions else None

    def get(self, tokenized_env) -> "ActionDecoder":
        from bdm_db1_tpu.eval.harness import decode_geometry

        key = decode_geometry(tokenized_env)
        if key not in self._cache:
            self._cache[key] = build_decoder_for_env(
                self.model, self.params, tokenized_env, mesh=self.mesh,
                _params_placed=True, shared=self.shared,
                pad_buckets=self.pad_buckets)
            if self.spec_sessions is not None:
                self._cache[key].spec_sessions = self.spec_sessions
        return self._cache[key]


class WindowDecoder:
    """Stateless (no-memory) decoder over a fixed padded token window.

    TPU-native form of the reference's mem-less mode
    (reference: evaluate_rl.py:177-242 with model_memory None): the host
    keeps a growing/rolling sequence; on device the window is padded to a
    fixed width (causality makes pad positions inert), logits are gathered
    at the live position, and generated action tokens scatter back into the
    window — one jit compile per window bucket, not per sequence length."""

    def __init__(self, model, params, layout, obs_length, action_length,
                 discrete_action, num_actions=None,
                 window: Optional[int] = None):
        self.model = model
        self.params = params
        self.layout = layout
        self.obs_length = int(obs_length)
        self.action_length = int(action_length)
        self.discrete_action = discrete_action
        self.window = window or model.cfg.n_position
        if discrete_action:
            assert num_actions is not None
            self._base_bias = layout.discrete_action_logit_bias(num_actions)
        else:
            self._base_bias = layout.continuous_action_logit_bias()
        self._num_actions = num_actions
        self._jit = jax.jit(partial(_window_decode, model, self.action_length))

    def decode(self, seq_tokens: np.ndarray, env_action_mask=None
               ) -> Tuple[np.ndarray, np.ndarray]:
        """seq_tokens: [q] current sequence (<= window). Returns
        (action token ids [action_length], extended sequence [q+action_length])."""
        acts, extended = self.decode_batch([seq_tokens], env_action_mask)
        return acts[0], extended[0]

    def decode_batch(self, seqs, env_action_mask=None):
        """Batched stateless decode over same-geometry rows with per-row
        live lengths. seqs: list of [q_i] token arrays (each
        q_i + action_length <= window); env_action_mask: None, [n], or
        [B, n]. Returns (action ids [B, action_length], list of extended
        sequences). One device program for the whole batch."""
        b = len(seqs)
        lengths = np.array([len(s) for s in seqs], np.int32)
        assert (lengths + self.action_length <= self.window).all(), (
            lengths, self.window)
        _, pos = action_flags_and_position_ids(
            self.window, self.obs_length, self.action_length, 0)
        padded = np.zeros((b, self.window), np.int64)
        for i, s in enumerate(seqs):
            padded[i, :lengths[i]] = s
        bias = fold_env_mask_bias(
            self._base_bias, self.layout, self.discrete_action,
            self._num_actions, env_action_mask)
        if bias.ndim == 1:
            bias = np.broadcast_to(bias, (b,) + bias.shape)
        acts = np.asarray(self._jit(
            {"params": self.params},
            jnp.asarray(padded, jnp.int32),
            jnp.broadcast_to(
                jnp.asarray(pos, jnp.int32)[None], (b, self.window)),
            jnp.asarray(lengths),
            jnp.asarray(bias),
        ))
        return acts, [np.concatenate([s, a]) for s, a in zip(seqs, acts)]


def _window_decode(model, action_length, variables, tokens, pos, lengths,
                   bias):
    """fori over action dims: forward padded window, gather live-position
    logits, argmax, scatter the token back in."""
    from bdm_db1_tpu.data.input_specs import RLTaskBatch

    b = tokens.shape[0]
    rows = jnp.arange(b)

    def body(i, carry):
        tokens, acts = carry
        logits, _ = model.apply(
            variables, {"rl": RLTaskBatch(tokens=tokens, position_id=pos)},
            compute_loss=False)
        idx = lengths + i - 1
        live = logits[rows, idx]                     # [B, V]
        tok = jnp.argmax(live + bias, axis=-1).astype(jnp.int32)
        tokens = tokens.at[rows, lengths + i].set(tok)
        acts = acts.at[:, i].set(tok)
        return tokens, acts

    acts0 = jnp.zeros((b, action_length), jnp.int32)
    _, acts = jax.lax.fori_loop(0, action_length, body, (tokens, acts0))
    return acts


def shard_decode_params(params, mesh):
    """Place params on a mesh by their logical-axis metadata (the same
    Megatron TP layout the training step uses, parallel/mesh.py
    LOGICAL_AXIS_RULES); leaves without metadata replicate."""
    import flax.linen as nn

    from bdm_db1_tpu.parallel.mesh import axis_rules

    logical = nn.get_partition_spec(params)
    shardings = nn.logical_to_mesh_sharding(
        logical, mesh, list(axis_rules(mesh)))
    return jax.device_put(params, shardings)


def _maybe_quantize_weights(model, params):
    """Opt-in int8 trunk weights for decode (ModelConfig.decode_weight_dtype;
    idempotent so DecoderPool and direct construction compose). "int8" and
    "int8a8" share the quantized param tree — they differ only in how
    QDense consumes it (Pallas in-kernel dequant vs MXU-native W8A8)."""
    if getattr(model.cfg, "decode_weight_dtype", "") not in ("int8",
                                                             "int8a8"):
        return params
    from bdm_db1_tpu.models.transformer_xl import (
        decode_weights_quantized, quantize_decode_weights,
    )

    if decode_weights_quantized(params):
        return params
    return quantize_decode_weights(params)


def build_decoder_for_env(model, params, tokenized_env, mesh=None,
                          _params_placed=False, shared=None,
                          pad_buckets=None) -> ActionDecoder:
    from bdm_db1_tpu.eval.envs import is_discrete_space

    if not _params_placed:
        params = _maybe_quantize_weights(model, params)
        if mesh is not None:
            params = shard_decode_params(params, mesh)
    discrete = is_discrete_space(tokenized_env.action_space)
    return ActionDecoder(
        model, params,
        tokenized_env.tok.layout,
        obs_length=tokenized_env.obs_length,
        action_length=tokenized_env.action_length,
        discrete_action=discrete,
        num_actions=tokenized_env.action_space.n if discrete else None,
        mesh=mesh,
        shared=shared,
        pad_buckets=pad_buckets,
    )
