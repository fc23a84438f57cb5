"""KV-cache decode must match the reference-style hidden-state-memory decode
bit-for-bit (post-LN): K/V are per-position projections of the cached
hiddens, so caching them directly is a pure optimization."""

import jax
import jax.numpy as jnp
import numpy as np

from bdm_db1_tpu.core.config import db1_tiny
from bdm_db1_tpu.data.input_specs import RLTaskBatch
from bdm_db1_tpu.models.transformer_xl import TransformerXL


def test_kv_cache_matches_hidden_mems():
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    layout = cfg.vocab.layout()
    L = cfg.model.n_position
    tok0 = jnp.zeros((1, L), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
        tokens=tok0, position_id=tok0, loss_mask=tok0, label=tok0)})["params"]

    mems = model.apply({"params": params}, 1, method=TransformerXL.init_mems)
    cache = model.apply({"params": params}, 1,
                        method=TransformerXL.init_kv_cache)

    rng = np.random.RandomState(0)
    for qlen in (9, 1, 1, 4, 1, 1):
        tokens = jnp.asarray(
            rng.randint(0, layout.total_vocab_size, (1, qlen)), jnp.int32)
        pos = jnp.asarray(rng.randint(0, 8, (1, qlen)), jnp.int32)
        lg_ref, mems = model.apply(
            {"params": params}, tokens, pos, mems,
            method=TransformerXL.decode_rl)
        lg_kv, cache = model.apply(
            {"params": params}, tokens, pos, cache,
            method=TransformerXL.decode_rl_kv)
        np.testing.assert_allclose(
            np.asarray(lg_kv), np.asarray(lg_ref), rtol=1e-5, atol=1e-5)


def test_kv_cache_shapes_and_slide():
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    tok0 = jnp.zeros((1, cfg.model.n_position), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
        tokens=tok0, position_id=tok0, loss_mask=tok0, label=tok0)})["params"]
    cache = model.apply({"params": params}, 2,
                        method=TransformerXL.init_kv_cache)
    m = cfg.model
    assert cache["k"].shape == (m.n_layer, 2, m.mem_len, m.n_head, m.d_head)
    tokens = jnp.ones((2, 5), jnp.int32)
    pos = jnp.zeros((2, 5), jnp.int32)
    _, cache2 = model.apply({"params": params}, tokens, pos, cache,
                            method=TransformerXL.decode_rl_kv)
    assert cache2["k"].shape == cache["k"].shape
    # the new tokens' K entered the cache tail
    assert not np.allclose(np.asarray(cache2["k"][:, :, -5:]), 0.0)


def test_precomputed_rk_matches_inlayer():
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    tok0 = jnp.zeros((1, cfg.model.n_position), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
        tokens=tok0, position_id=tok0, loss_mask=tok0, label=tok0)})["params"]
    cache = model.apply({"params": params}, 1,
                        method=TransformerXL.init_kv_cache)
    tokens = jnp.asarray([[7, 8, 9]], jnp.int32)
    pos = jnp.asarray([[1, 2, 0]], jnp.int32)
    lg_a, _ = model.apply({"params": params}, tokens, pos, cache,
                          method=TransformerXL.decode_rl_kv)
    rk = model.apply({"params": params}, 3,
                     method=TransformerXL.precompute_rk)
    m = cfg.model
    assert rk.shape == (m.n_layer, m.mem_len + 3, m.n_head, m.d_head)
    lg_b, _ = model.apply({"params": params}, tokens, pos, cache, None, rk,
                          method=TransformerXL.decode_rl_kv)
    np.testing.assert_allclose(np.asarray(lg_b), np.asarray(lg_a),
                               rtol=1e-5, atol=1e-5)


def test_ring_cache_matches_aligned():
    """Ring-buffer single-token decode == aligned shift decode, multi-step,
    including re-alignment for a subsequent prime."""
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    layout = cfg.vocab.layout()
    tok0 = jnp.zeros((1, cfg.model.n_position), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
        tokens=tok0, position_id=tok0, loss_mask=tok0, label=tok0)})["params"]

    rk1 = model.apply({"params": params}, 1,
                      method=TransformerXL.precompute_rk)

    aligned = model.apply({"params": params}, 1,
                          method=TransformerXL.init_kv_cache)

    def to_ring(al):
        # same [L,B,M,H,Dh] layout; a fresh ring starts at cursor 0
        return {"k": al["k"], "v": al["v"],
                "cursor": jnp.zeros((), jnp.int32)}

    rng = np.random.RandomState(0)
    # prime both with a short sequence
    prime = jnp.asarray(
        rng.randint(0, layout.total_vocab_size, (1, 5)), jnp.int32)
    ppos = jnp.asarray(rng.randint(0, 6, (1, 5)), jnp.int32)
    rk5 = model.apply({"params": params}, 5,
                      method=TransformerXL.precompute_rk)
    lg_a, aligned = model.apply({"params": params}, prime, ppos, aligned,
                                None, rk5, method=TransformerXL.decode_rl_kv)
    ring = to_ring(aligned)

    # many single-token steps: aligned-shift vs ring must agree,
    # including cursor wraparound (mem_len is 32 in the tiny config)
    for step in range(40):
        t = jnp.asarray(
            rng.randint(0, layout.total_vocab_size, (1, 1)), jnp.int32)
        p = jnp.zeros((1, 1), jnp.int32)
        lg_al, aligned = model.apply(
            {"params": params}, t, p, aligned, None, rk1,
            method=TransformerXL.decode_rl_kv)
        lg_ring, ring = model.apply(
            {"params": params}, t, p, ring, rk1,
            method=TransformerXL.decode_rl_kv_ring)
        np.testing.assert_allclose(
            np.asarray(lg_ring), np.asarray(lg_al), rtol=2e-5, atol=2e-5,
            err_msg=f"step {step}")

    # re-aligning the ring reproduces the aligned cache
    realigned = model.apply({"params": params}, ring,
                            method=TransformerXL.align_ring_cache)
    np.testing.assert_allclose(np.asarray(realigned["k"]),
                               np.asarray(aligned["k"]),
                               rtol=2e-5, atol=2e-5)


def test_ring_cache_int8_close_to_exact():
    """decode_cache_dtype="int8" (per-(position, head) scales, dequant fused
    into the score/PV contractions) tracks the exact ring cache through
    multi-token primes, single-token steps, and cursor wraparound. Opt-in
    serving path: halves the cache HBM read; tolerance, not bit-parity."""
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    cfg8 = db1_tiny()
    cfg8.model.dtype = "float32"
    cfg8.model.decode_cache_dtype = "int8"
    model8 = TransformerXL(cfg8.model, cfg8.vocab, cfg8.vision)
    layout = cfg.vocab.layout()
    tok0 = jnp.zeros((1, cfg.model.n_position), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
        tokens=tok0, position_id=tok0, loss_mask=tok0, label=tok0)})["params"]

    ring = model.apply({"params": params}, 2,
                       method=TransformerXL.init_kv_cache_ring)
    ring8 = model8.apply({"params": params}, 2,
                         method=TransformerXL.init_kv_cache_ring)
    assert ring8["k"].dtype == jnp.int8 and "k_scale" in ring8
    rks = {}

    def rk_for(q):
        if q not in rks:
            rks[q] = model.apply({"params": params}, q,
                                 method=TransformerXL.precompute_rk)
        return rks[q]

    rng = np.random.RandomState(2)
    worst = 0.0
    for i, qlen in enumerate((6, 1, 1, 9, 1, 30, 1, 4, 26, 1)):
        t = jnp.asarray(
            rng.randint(0, layout.total_vocab_size, (2, qlen)), jnp.int32)
        p = jnp.asarray(rng.randint(0, 8, (2, qlen)), jnp.int32)
        lg, ring = model.apply(
            {"params": params}, t, p, ring, rk_for(qlen),
            method=TransformerXL.decode_rl_kv_ring)
        lg8, ring8 = model8.apply(
            {"params": params}, t, p, ring8, rk_for(qlen),
            method=TransformerXL.decode_rl_kv_ring)
        scale = float(np.abs(np.asarray(lg)).max())
        diff = float(np.abs(np.asarray(lg8) - np.asarray(lg)).max())
        worst = max(worst, diff / scale)
        assert diff / scale < 0.05, (i, qlen, diff, scale)
    assert worst > 0  # the quantized path must actually differ (is int8)


def test_ring_multitoken_prime_matches_aligned():
    """Multi-token primes through the ring cache (scatter at cursor +
    rotated BD/mask) must equal the aligned roll/concat/slice path — this
    is the production decode's per-env-step prime (eval/decode.py
    _decode_step). Lengths cross the mem_len=32 wraparound repeatedly."""
    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    layout = cfg.vocab.layout()
    tok0 = jnp.zeros((1, cfg.model.n_position), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
        tokens=tok0, position_id=tok0, loss_mask=tok0, label=tok0)})["params"]

    aligned = model.apply({"params": params}, 2,
                          method=TransformerXL.init_kv_cache)
    ring = model.apply({"params": params}, 2,
                       method=TransformerXL.init_kv_cache_ring)
    rks = {}

    def rk_for(q):
        if q not in rks:
            rks[q] = model.apply({"params": params}, q,
                                 method=TransformerXL.precompute_rk)
        return rks[q]

    rng = np.random.RandomState(1)
    for i, qlen in enumerate((5, 1, 7, 1, 1, 9, 13, 5, 30, 4, 1, 26)):
        t = jnp.asarray(
            rng.randint(0, layout.total_vocab_size, (2, qlen)), jnp.int32)
        p = jnp.asarray(rng.randint(0, 8, (2, qlen)), jnp.int32)
        lg_al, aligned = model.apply(
            {"params": params}, t, p, aligned, None, rk_for(qlen),
            method=TransformerXL.decode_rl_kv)
        lg_ring, ring = model.apply(
            {"params": params}, t, p, ring, rk_for(qlen),
            method=TransformerXL.decode_rl_kv_ring)
        np.testing.assert_allclose(
            np.asarray(lg_ring), np.asarray(lg_al), rtol=2e-5, atol=2e-5,
            err_msg=f"call {i} qlen {qlen}")
    realigned = model.apply({"params": params}, ring,
                            method=TransformerXL.align_ring_cache)
    np.testing.assert_allclose(np.asarray(realigned["k"]),
                               np.asarray(aligned["k"]),
                               rtol=2e-5, atol=2e-5)


def test_chunked_prime_exactness_and_causal_gate():
    """Chunked ring priming (eval/decode.py _decode_step) is bit-equal to
    one-shot priming under same_length; with same_length=False the decoder
    must NOT chunk — long primes take the aligned window-slide fallback,
    which this test checks against a reference decode_rl_kv pass."""
    from bdm_db1_tpu.eval.decode import ActionDecoder, _prime_chunk

    for same_len in (True, False):
        cfg = db1_tiny()
        cfg.model.dtype = "float32"
        cfg.model.same_length = same_len
        model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
        layout = cfg.vocab.layout()
        tok0 = jnp.zeros((1, cfg.model.n_position), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
            tokens=tok0, position_id=tok0, loss_mask=tok0,
            label=tok0)})["params"]
        dec = ActionDecoder(model, params, layout, obs_length=4,
                            action_length=2, discrete_action=False)
        assert dec.use_kv_cache
        chunk = _prime_chunk(cfg.model)  # == mem_len == 32 on tiny
        q = chunk + 9                    # forces chunking / the fallback
        rng = np.random.RandomState(3)
        prime = rng.randint(0, layout.total_vocab_size, (2, q))
        acts, mems = dec.decode(prime, dec.init_mems(2))
        assert acts.shape == (2, 2)

        # reference: one aligned window-slide pass over a fresh cache
        aligned = model.apply({"params": params}, 2,
                              method=TransformerXL.init_kv_cache)
        rk = model.apply({"params": params}, q,
                         method=TransformerXL.precompute_rk)
        pos = np.asarray(dec._pos_cache[(2, q, 0, 0)])
        lg_ref, aligned = model.apply(
            {"params": params}, jnp.asarray(prime, jnp.int32),
            jnp.asarray(pos, jnp.int32), aligned, None, rk,
            method=TransformerXL.decode_rl_kv)
        bias = layout.continuous_action_logit_bias()
        tok_ref = np.argmax(np.asarray(lg_ref) + bias, axis=-1)
        # first decoded action token must match the reference pass exactly
        np.testing.assert_array_equal(np.asarray(acts)[:, 0], tok_ref,
                                      err_msg=f"same_length={same_len}")


def test_image_chunk_plan_math():
    """Transition-aligned slicing: sizes cover the prime, frames cover the
    prompt+reset observations, refusals on non-boundary shapes."""
    from bdm_db1_tpu.eval.decode import ActionDecoder, _prime_chunk

    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    layout = cfg.vocab.layout()
    L = cfg.model.n_position
    tok0 = jnp.zeros((1, L), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
        tokens=tok0, position_id=tok0, loss_mask=tok0, label=tok0)})["params"]
    dec = ActionDecoder(model, params, layout, obs_length=4,
                        action_length=1, discrete_action=True, num_actions=4)
    step, tail = 6, 5
    chunk = _prime_chunk(cfg.model)  # 32 on tiny
    for T in (5, 6, 11):
        q = T * step + tail
        plan = dec._image_chunk_plan(q, T + 1)
        assert plan is not None, T
        sizes, frames = plan
        assert sum(sizes) == q and sum(frames) == T + 1
        assert all(s <= chunk for s in sizes)
        # every slice is whole transitions (+ optionally the obs||sep tail)
        for s in sizes:
            assert s % step == 0 or (s - tail) % step == 0
    # refusals: non-boundary prime, frame-count mismatch, giant transition
    assert dec._image_chunk_plan(6 * step + tail + 1, 7) is None
    assert dec._image_chunk_plan(6 * step + tail, 9) is None
    big = ActionDecoder(model, params, layout, obs_length=40,
                        action_length=1, discrete_action=True, num_actions=4)
    assert big._image_chunk_plan(2 * 42 + 41, 3) is None


def test_chunked_image_prime_matches_one_shot():
    """An Atari-geometry (image obs, discrete action) expert prime longer
    than mem_len decodes identically through the new transition-aligned
    chunked ring path and the old realign/window-slide fallback
    (VERDICT r2 next #2 'Done =' parity test)."""
    from bdm_db1_tpu.eval.decode import ActionDecoder, _prime_chunk

    cfg = db1_tiny()
    cfg.model.dtype = "float32"
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    layout = cfg.vocab.layout()
    p = cfg.vision.patch_size
    hw = 2 * p  # 4 patches -> image obs of 4 tokens
    L = cfg.model.n_position
    tok0 = jnp.zeros((1, L), jnp.int32).at[0, 0].set(-1)
    zeros = jnp.zeros((1, L), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
        tokens=tok0, position_id=zeros, loss_mask=zeros, label=zeros,
        images=jnp.zeros((1, 1, hw, hw, 3), jnp.float32))})["params"]

    obs_len, act_len, n_act = 4, 1, 4
    step, tail = obs_len + act_len + 1, obs_len + 1
    T = 6
    q = T * step + tail
    assert q > _prime_chunk(cfg.model) and q > cfg.model.mem_len

    rng = np.random.RandomState(0)
    sep = layout.separator_id
    row = []
    for _ in range(T):
        row.extend([-1] * obs_len
                   + [sep, layout.discrete_offset + rng.randint(n_act)])
    row.extend([-1] * obs_len + [sep])
    prime = np.tile(np.array(row, np.int64), (2, 1))
    imgs = rng.rand(2, T + 1, hw, hw, 3).astype(np.float32)

    def fresh():
        return ActionDecoder(model, params, layout, obs_length=obs_len,
                             action_length=act_len, discrete_action=True,
                             num_actions=n_act)

    dec_c = fresh()
    assert dec_c._image_chunk_plan(q, T + 1) is not None
    acts_c, mems_c = dec_c.decode(prime, dec_c.init_mems(2),
                                  prime_images=imgs)

    dec_o = fresh()
    dec_o._image_chunk_plan = lambda q_, f_: None  # force the fallback
    acts_o, mems_o = dec_o.decode(prime, dec_o.init_mems(2),
                                  prime_images=imgs)
    np.testing.assert_array_equal(np.asarray(acts_c), np.asarray(acts_o))

    # a follow-up env step from both caches agrees too (the ring cursor
    # state and the realigned cache encode the same history)
    nxt = np.tile(np.array([-1] * obs_len + [sep], np.int64), (2, 1))
    nimg = rng.rand(2, 1, hw, hw, 3).astype(np.float32)
    a2_c, _ = dec_c.decode(nxt, mems_c, prime_images=nimg)
    a2_o, _ = dec_o.decode(nxt, mems_o, prime_images=nimg)
    np.testing.assert_array_equal(np.asarray(a2_c), np.asarray(a2_o))
