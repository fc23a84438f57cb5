"""Real-chip compile + numerics check of every Pallas kernel.

The CPU test suite runs the kernels in interpret mode, which cannot catch
Mosaic lowering rejections (block-shape alignment, VMEM budget, unsupported
ops) — the class of failure that took out the r3 bench (CLAUDE.md: Pallas
kernels "must also be compile-checked on the real chip"). This script runs
each kernel ON the chip at the shapes the 1.2B flagship actually uses —
including the quant_matmul bm-tiled row geometries (r3 advisor finding) —
and checks numerics against an XLA reference.

Usage (real chip, JAX_PLATFORMS=axon is the sandbox default):

    timeout 3600 python scripts/chipcheck.py [filter-substring]

Prints one PASS/FAIL line per check; exits nonzero if any check fails.
"""

from __future__ import annotations

import sys
import traceback

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

_RESULTS = []


def check(name):
    def deco(fn):
        _RESULTS.append((name, fn))
        return fn
    return deco


# ---------------------------------------------------------------------------
# quant_matmul — the bm-tiled row geometries (r3 advisor: interpret-only)
# ---------------------------------------------------------------------------

def _qmm_case(B, K, N, dtype, block_m=1024):
    import jax.numpy as jnp

    from bdm_db1_tpu.ops.quant_matmul import quant_matmul, quantize_weight

    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.05)
    wq, s = quantize_weight(w)
    x = jnp.asarray(rng.randn(B, K).astype(np.float32)).astype(dtype)
    y = quant_matmul(x, wq, s, block_m=block_m)
    ref = x.astype(jnp.float32) @ (wq.astype(jnp.float32) * s[None, :])
    err = float(jnp.max(jnp.abs(y - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    assert err < 2e-2, f"rel err {err}"
    return f"rel_err {err:.2e}"


@check("quant_matmul bf16 B=1040 (bm-tiled, restream-min chooser)")
def _():
    import jax.numpy as jnp
    return _qmm_case(1040, 2048, 8192, jnp.bfloat16)


@check("quant_matmul bf16 B=2049 (odd row count > block_m)")
def _():
    import jax.numpy as jnp
    return _qmm_case(2049, 2048, 8192, jnp.bfloat16)


@check("quant_matmul bf16 B=1008 (sublane-guarded VMEM shrink)")
def _():
    import jax.numpy as jnp
    return _qmm_case(1008, 2048, 8192, jnp.bfloat16)


@check("quant_matmul f32 B=1000 (f32 sublane shrink)")
def _():
    import jax.numpy as jnp
    return _qmm_case(1000, 2048, 8192, jnp.float32)


@check("quant_matmul bf16 B=10240 (decode-prime row count)")
def _():
    import jax.numpy as jnp
    return _qmm_case(10240, 2048, 2048, jnp.bfloat16)


# ---------------------------------------------------------------------------
# fused relative attention fwd + bwd (training path)
# ---------------------------------------------------------------------------

@check("pallas_rel_attention fwd+bwd qlen=1024 klen=2048 (train shape)")
def _():
    import jax
    import jax.numpy as jnp

    from bdm_db1_tpu.ops.pallas_attention import pallas_rel_attention_anylen

    b, qlen, h, dh, mlen = 1, 1024, 16, 128, 1024
    klen = qlen + mlen
    rng = np.random.RandomState(1)

    def t(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.1,
                           jnp.bfloat16)

    q, k, v = t(b, qlen, h, dh), t(b, klen, h, dh), t(b, klen, h, dh)
    rk = t(klen, h, dh)
    rw = jnp.zeros((h, dh), jnp.float32)
    rr = jnp.zeros((h, dh), jnp.float32)

    def loss(q, k, v):
        out = pallas_rel_attention_anylen(
            q, k, v, rk, rw, rr, mlen, False, 1.0 / dh ** 0.5)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    val, grads = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))(q, k, v)
    for g in grads:
        assert bool(jnp.isfinite(g.astype(jnp.float32)).all())
    return f"loss {float(val):.3e}"


@check("pallas_rel_attention_anylen qlen=281 (unaligned prime shape)")
def _():
    import jax
    import jax.numpy as jnp

    from bdm_db1_tpu.ops.pallas_attention import (
        pallas_anylen_applicable, pallas_rel_attention_anylen,
    )

    b, qlen, h, dh, mlen = 2, 281, 16, 128, 1024
    klen = qlen + mlen
    assert pallas_anylen_applicable(qlen, klen)
    rng = np.random.RandomState(2)

    def t(*shape):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.1,
                           jnp.bfloat16)

    out = jax.jit(lambda q, k, v, rk: pallas_rel_attention_anylen(
        q, k, v, rk, jnp.zeros((h, dh), jnp.float32),
        jnp.zeros((h, dh), jnp.float32), mlen, False, 1.0 / dh ** 0.5))(
            t(b, qlen, h, dh), t(b, klen, h, dh), t(b, klen, h, dh),
            t(klen, h, dh))
    assert out.shape == (b, qlen, h, dh)
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
    return "ok"


# ---------------------------------------------------------------------------
# flash ring decode / prime kernels (decode path), exact + int8
# ---------------------------------------------------------------------------

def _ring_setup(L=2, B=8, M=1024, H=16, Dh=128):
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    k = jnp.asarray(rng.randn(L, B, M, H, Dh).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    v = jnp.asarray(rng.randn(L, B, M, H, Dh).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    return k, v, rng


@check("flash_ring_decode bf16 (q=1 decode step)")
def _():
    import jax.numpy as jnp

    from bdm_db1_tpu.ops.flash_ring_decode import flash_ring_decode

    L, B, M, H, Dh = 2, 8, 1024, 16, 128
    k, v, rng = _ring_setup(L, B, M, H, Dh)
    qw = jnp.asarray(rng.randn(B, H, Dh).astype(np.float32), jnp.bfloat16)
    bias = jnp.asarray(rng.randn(B, H, M).astype(np.float32))
    o, m, l = flash_ring_decode(k, v, qw, bias, jnp.int32(1),
                                n_head=H, d_head=Dh, scale=1.0 / Dh ** 0.5)
    # XLA reference on layer 1
    s = (jnp.einsum("bhd,bmhd->bhm", qw.astype(jnp.float32),
                    k[1].astype(jnp.float32)) / Dh ** 0.5 + bias)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhm,bmhd->bhd", p, v[1].astype(jnp.float32))
    got = o / l
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 5e-2, err
    return f"abs_err {err:.2e}"


@check("flash_ring_decode int8 scales (in-kernel dequant)")
def _():
    import jax.numpy as jnp

    from bdm_db1_tpu.ops.flash_ring_decode import flash_ring_decode

    L, B, M, H, Dh = 2, 8, 1024, 16, 128
    k, v, rng = _ring_setup(L, B, M, H, Dh)
    kq = (k.astype(jnp.float32) * 127).round().clip(-127, 127).astype(
        jnp.int8)
    vq = (v.astype(jnp.float32) * 127).round().clip(-127, 127).astype(
        jnp.int8)
    ks = jnp.full((L, B, M, H), 1 / 127, jnp.float32)
    vs = jnp.full((L, B, M, H), 1 / 127, jnp.float32)
    qw = jnp.asarray(rng.randn(B, H, Dh).astype(np.float32), jnp.bfloat16)
    bias = jnp.zeros((B, H, M), jnp.float32)
    o, m, l = flash_ring_decode(kq, vq, qw, bias, jnp.int32(0), ks, vs,
                                n_head=H, d_head=Dh, scale=1.0 / Dh ** 0.5)
    assert bool(jnp.isfinite(o).all())
    return "ok"


@check("flash_ring_prime Q=8 (per-step obs prime)")
def _():
    import jax.numpy as jnp

    from bdm_db1_tpu.ops.flash_ring_decode import flash_ring_prime

    L, B, M, H, Dh, Q = 2, 8, 1024, 16, 128, 8
    k, v, rng = _ring_setup(L, B, M, H, Dh)
    qw = jnp.asarray(rng.randn(B, H, Q, Dh).astype(np.float32), jnp.bfloat16)
    bias = jnp.zeros((B, H, Q, M), jnp.float32)
    o, m, l = flash_ring_prime(k, v, qw, bias, jnp.int32(0),
                               n_head=H, d_head=Dh, scale=1.0 / Dh ** 0.5)
    assert o.shape == (B, H, Q, Dh) and bool(jnp.isfinite(o).all())
    return "ok"


@check("flash_ring_prime_ap Q=24 bf16 + int8 (all-pairs prime)")
def _():
    import jax.numpy as jnp

    from bdm_db1_tpu.ops.flash_ring_decode import flash_ring_prime_ap

    L, B, M, H, Dh, Q = 2, 8, 1024, 16, 128, 24
    k, v, rng = _ring_setup(L, B, M, H, Dh)
    qw = jnp.asarray(rng.randn(B, H, Q, Dh).astype(np.float32), jnp.bfloat16)
    bias = jnp.zeros((B, H, Q, M), jnp.float32)
    o, m, l = flash_ring_prime_ap(k, v, qw, bias, jnp.int32(1),
                                  n_head=H, d_head=Dh,
                                  scale=1.0 / Dh ** 0.5)
    assert o.shape == (B, H, Q, Dh) and bool(jnp.isfinite(o).all())
    kq = (k.astype(jnp.float32) * 127).round().clip(-127, 127).astype(
        jnp.int8)
    vq = (v.astype(jnp.float32) * 127).round().clip(-127, 127).astype(
        jnp.int8)
    ks = jnp.full((L, B, M, H), 1 / 127, jnp.float32)
    vs = jnp.full((L, B, M, H), 1 / 127, jnp.float32)
    o2, _, _ = flash_ring_prime_ap(kq, vq, qw, bias, jnp.int32(1), ks, vs,
                                   n_head=H, d_head=Dh,
                                   scale=1.0 / Dh ** 0.5)
    assert bool(jnp.isfinite(o2).all())
    return "ok"


@check("flash_ring_prime_ap compact softmax Q=24 bf16+int8")
def _():
    import jax.numpy as jnp

    from bdm_db1_tpu.ops.flash_ring_decode import flash_ring_prime_ap

    L, B, M, H, Dh, Q = 2, 8, 1024, 16, 128, 24
    k, v, rng = _ring_setup(L, B, M, H, Dh)
    qw = jnp.asarray(rng.randn(B, H, Q, Dh).astype(np.float32), jnp.bfloat16)
    bias = jnp.zeros((B, H, Q, M), jnp.float32)
    kw = dict(n_head=H, d_head=Dh, scale=1.0 / Dh ** 0.5)
    o_d, m_d, l_d = flash_ring_prime_ap(k, v, qw, bias, jnp.int32(1), **kw)
    o_c, m_c, l_c = flash_ring_prime_ap(k, v, qw, bias, jnp.int32(1),
                                        compact=True, **kw)
    err = float(jnp.max(jnp.abs(o_c / l_c[..., None] - o_d / l_d[..., None])))
    assert err < 5e-2, err
    kq = (k.astype(jnp.float32) * 127).round().clip(-127, 127).astype(
        jnp.int8)
    vq = (v.astype(jnp.float32) * 127).round().clip(-127, 127).astype(
        jnp.int8)
    ks = jnp.full((L, B, M, H), 1 / 127, jnp.float32)
    vs = jnp.full((L, B, M, H), 1 / 127, jnp.float32)
    o2, _, _ = flash_ring_prime_ap(kq, vq, qw, bias, jnp.int32(0), ks, vs,
                                   compact=True, **kw)
    assert bool(jnp.isfinite(o2).all())
    return f"compact==default abs_err {err:.2e}"


@check("masked_ce_tied (fused LM-head cross-entropy)")
def _():
    import jax
    import jax.numpy as jnp

    from bdm_db1_tpu.ops.fused_ce import masked_cross_entropy_fused

    rng = np.random.RandomState(4)
    # 33152 = the 1.2B VocabLayout's MXU-padded vocab; 33025 valid rows
    B, L, D, V_pad, V = 2, 1024, 2048, 33152, 33025
    h = jnp.asarray(rng.randn(B, L, D).astype(np.float32) * 0.05,
                    jnp.bfloat16)
    emb = jnp.asarray(rng.randn(V_pad, D).astype(np.float32) * 0.02,
                      jnp.bfloat16)
    labels = jnp.asarray(rng.randint(0, V, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.float32)

    def loss(h, emb):
        return masked_cross_entropy_fused(h, emb, labels, mask, V)

    val, g = jax.jit(jax.value_and_grad(loss))(h, emb)
    assert bool(jnp.isfinite(g.astype(jnp.float32)).all())
    return f"loss {float(val):.4f}"


@check("spec-tail small-batch gate (1.2B b16 decode program) [slow]")
def _():
    """r5 fault map: the COMPOSED speculative decode program (prime with
    guess tail + verify while_loop) crashed the TPU worker at batch < 32
    on the 1.2B flagship (b16/b24 reproduce, b32/b40 clean; bare
    prime_ap kernels at b8 are fine — see the Q=24 check above — and the
    XLA ring branch at the same batch is fine). decode_rl_kv_ring now
    routes spec_tail calls at batch < 32 to the XLA branch on real
    chips; this check runs the full b16 spec-adaptive decode step
    end-to-end to prove the gate holds (~15 min: one 1.2B remote-AOT
    compile)."""
    import jax
    import jax.numpy as jnp

    from bdm_db1_tpu.core.config import db1_1p2b
    from bdm_db1_tpu.data.input_specs import RLTaskBatch
    from bdm_db1_tpu.data.rl_dataset import (
        RLFullDataset, RLTokenizerSuite, TrajectoryStore,
    )
    from bdm_db1_tpu.eval.decode import build_decoder_for_env
    from bdm_db1_tpu.eval.envs import FakeContinuousEnv
    from bdm_db1_tpu.eval.wrapper import TokenizedEnv
    from bdm_db1_tpu.models.transformer_xl import TransformerXL
    from bdm_db1_tpu.tokenizers.scalar import ScalarTokenizer
    from bdm_db1_tpu.tokenizers.text import ByteTextTokenizer

    cfg = db1_1p2b()
    cfg.model.param_dtype = "bfloat16"
    cfg.model.decode_speculative = True
    suite = RLTokenizerSuite(
        cfg.vocab.layout(),
        ScalarTokenizer(cfg.vocab.num_continuous_bin),
        ByteTextTokenizer(), vision_patch_size=cfg.vision.patch_size)
    env_fn = lambda s: FakeContinuousEnv(  # noqa: E731
        obs_dim=17, act_dim=6, episode_len=20, seed=s)
    store = TrajectoryStore.from_flat_dataset(env_fn(999).make_dataset(3))
    ds = RLFullDataset("chipcheck", store, suite,
                       seq_length=cfg.model.n_position, use_prompt=True,
                       seed=0)
    tenv = TokenizedEnv(env_fn(0), ds)
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    tok = jnp.zeros((1, cfg.model.n_position), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
        tokens=tok, position_id=tok, loss_mask=tok, label=tok)})["params"]
    dec = build_decoder_for_env(model, params, tenv)
    B = 16
    sep = np.array([tenv.separator_id], np.int64)
    obs, _, _ = tenv.reset()
    p = np.broadcast_to(np.concatenate([obs, sep]), (B, 18)).copy()
    guess = np.full((B, dec.action_length), dec._default_guess, np.int64)
    act, _ = dec.decode_async(p, dec.init_mems(B),
                              deferred_tok=guess[:, :1], defer_last=True,
                              speculate=True, guess_tok=guess)
    a = np.asarray(act)
    assert a.shape == (B, dec.action_length), a.shape
    return "gate holds (spec-tail b16 ran XLA branch, no worker crash)"


def main() -> None:
    global jax
    import jax

    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    platform = jax.devices()[0].platform
    print(f"chipcheck on platform={platform} ({len(jax.devices())} dev)")
    failures = 0
    for name, fn in _RESULTS:
        if filt and filt not in name:
            continue
        if "[slow]" in name and filt not in ("[slow]", "slow") \
                and (not filt or filt not in name):
            print(f"SKIP  {name} (pass 'slow' to run)", flush=True)
            continue
        try:
            import time
            t0 = time.time()
            note = fn() or "ok"
            print(f"PASS  {name}: {note}  [{time.time() - t0:.1f}s]",
                  flush=True)
        except Exception:
            failures += 1
            print(f"FAIL  {name}:\n{traceback.format_exc()}", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
