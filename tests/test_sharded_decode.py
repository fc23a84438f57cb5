"""Multi-chip sharded decode: the ring-cache decoder on a jax.sharding.Mesh
(batch over "data", heads/weights over "model" Megatron TP) produces the
single-device greedy actions.

The reference serves one env per GPU process (evaluate_rl.py:452-466, DP
only); this covers the TPU-native extension: TP-sharded serving with the
cache partitioned over heads and XLA inserting the collectives via
sharding propagation (eval/decode.py ActionDecoder(mesh=...)).
"""

import dataclasses

import jax
import numpy as np

from bdm_db1_tpu.core.config import MeshConfig
from bdm_db1_tpu.eval.decode import DecoderPool, build_decoder_for_env
from bdm_db1_tpu.eval.envs import FakeContinuousEnv
from bdm_db1_tpu.models.transformer_xl import TransformerXL
from bdm_db1_tpu.parallel.mesh import make_mesh

from test_batched_eval import _setup
from test_speculative import _chain, _episode_primes


def _mesh(dp, tp):
    return make_mesh(MeshConfig(data_parallel=dp, model_parallel=tp))


def _xla_model(cfg, model, **over):
    return TransformerXL(
        dataclasses.replace(model.cfg, decode_flash="off", **over),
        cfg.vocab, cfg.vision)


def test_sharded_decode_matches_single_device():
    """dp=2 x tp=4 decode chain == single-device chain, and the cache carry
    stays sharded across steps (no silent full-replication)."""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 4, obs_dim=4, act_dim=2, episode_len=5)
    xmodel = _xla_model(cfg, model)
    ref_dec = build_decoder_for_env(xmodel, params, tenvs[0])
    primes = _episode_primes(tenvs, 0, 3, 4)
    ref = _chain(ref_dec, primes, defer=False)

    mesh = _mesh(2, 4)
    sdec = build_decoder_for_env(xmodel, params, tenvs[0], mesh=mesh)
    mems = sdec.init_mems(4)
    k_sh = mems["k"].sharding
    assert "data" in str(k_sh.spec) and "model" in str(k_sh.spec), k_sh
    acts = []
    for p in primes:
        a, mems = sdec.decode(p, mems)
        acts.append(np.asarray(a))
    for k, (a, b) in enumerate(zip(ref, acts)):
        np.testing.assert_array_equal(a, b, err_msg=f"step {k}")
    # propagation kept the carry sharded (donated in == out layout)
    assert mems["k"].sharding.is_equivalent_to(k_sh, mems["k"].ndim), \
        mems["k"].sharding


def test_sharded_speculative_decode():
    """Speculative decode composes with the mesh: same actions, one jitted
    program with the verify while_loop running on sharded operands."""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 4, obs_dim=4, act_dim=3, episode_len=5)
    xmodel = _xla_model(cfg, model)
    ref_dec = build_decoder_for_env(xmodel, params, tenvs[0])
    primes = _episode_primes(tenvs, 2, 3, 4)
    ref = _chain(ref_dec, primes, defer=False)

    smodel = _xla_model(cfg, model, decode_speculative=True)
    sdec = build_decoder_for_env(smodel, params, tenvs[0], mesh=_mesh(2, 4))
    assert sdec.speculates
    got = _chain(sdec, primes, defer=True)
    for k, (a, b) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(a, b, err_msg=f"step {k}")


def test_decoder_pool_shards_once():
    """DecoderPool(mesh=...) shards params once and hands every geometry's
    decoder the placed tree."""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 2, obs_dim=4, act_dim=2, episode_len=4)
    xmodel = _xla_model(cfg, model)
    mesh = _mesh(2, 4)
    pool = DecoderPool(xmodel, params, mesh=mesh)
    dec = pool.get(tenvs[0])
    assert dec.mesh is mesh
    leaves = jax.tree.leaves(pool.params)
    assert all(hasattr(leaf, "sharding") for leaf in leaves)
    a, _ = dec.decode(np.stack([np.r_[:6], np.r_[:6]]).astype(np.int64),
                      dec.init_mems(2))
    assert a.shape == (2, 2)


def test_sharded_flash_decode_matches_single_device():
    """decode_flash="on" + mesh: BOTH fused ring kernels — the q == 1
    per-action forwards and the all-pairs multi-token prime — run under a
    shard_map over ("data", "model") (per-shard heads; the pjit
    partitioner can't split a pallas_call itself, and the prime's (q, h)
    column flattening happens inside the per-shard body), and the greedy
    chain equals the single-device flash chain AND the single-device XLA
    chain (flash_ring_decode/flash_ring_prime_ap mesh=...)."""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 4, obs_dim=4, act_dim=2, episode_len=5)
    # tp=4 divides n_head=4 -> per-shard H=1 (interpret mode lifts the
    # real-chip sublane constraints, same as the single-chip flash tests)
    fmodel = TransformerXL(
        dataclasses.replace(model.cfg, decode_flash="on"),
        cfg.vocab, cfg.vision)
    assert fmodel._use_flash_decode(1)
    primes = _episode_primes(tenvs, 0, 3, 4)
    ref_flash = _chain(build_decoder_for_env(fmodel, params, tenvs[0]),
                       primes, defer=False)
    ref_xla = _chain(
        build_decoder_for_env(_xla_model(cfg, model), params, tenvs[0]),
        primes, defer=False)

    mesh = _mesh(2, 4)
    sdec = build_decoder_for_env(fmodel, params, tenvs[0], mesh=mesh)
    # the cloned model carries the mesh; q == 1 AND primes stay fused
    assert sdec.model.decode_mesh is mesh
    assert sdec.model._use_flash_decode(1)
    assert sdec.model._use_flash_decode(2)
    mems = sdec.init_mems(4)
    assert "model" in str(mems["k"].sharding.spec), mems["k"].sharding
    acts = []
    for p in primes:
        a, mems = sdec.decode(p, mems)
        acts.append(np.asarray(a))
    for k, (a, b, c) in enumerate(zip(ref_flash, acts, ref_xla)):
        np.testing.assert_array_equal(a, b, err_msg=f"step {k} (vs flash)")
        np.testing.assert_array_equal(b, c, err_msg=f"step {k} (vs xla)")


def test_sharded_flash_int8_matches_single_device():
    """The int8-cache (scales) branch of both mesh dispatchers: the dequant
    scales shard over heads alongside the cache ([L, B, M, H] -> model on
    the last axis), and the sharded chain equals the single-device int8
    flash chain exactly (same per-head math, same block merges)."""
    cfg, model, params, tenvs = _setup(
        FakeContinuousEnv, 4, obs_dim=4, act_dim=2, episode_len=5)
    fmodel = TransformerXL(
        dataclasses.replace(model.cfg, decode_flash="on",
                            decode_cache_dtype="int8"),
        cfg.vocab, cfg.vision)
    primes = _episode_primes(tenvs, 0, 3, 4)
    ref = _chain(build_decoder_for_env(fmodel, params, tenvs[0]),
                 primes, defer=False)

    sdec = build_decoder_for_env(fmodel, params, tenvs[0], mesh=_mesh(2, 4))
    assert sdec.model._use_flash_decode(1)
    assert sdec.model._use_flash_decode(2)
    mems = sdec.init_mems(4)
    acts = []
    for p in primes:
        a, mems = sdec.decode(p, mems)
        acts.append(np.asarray(a))
    for k, (a, b) in enumerate(zip(ref, acts)):
        np.testing.assert_array_equal(a, b, err_msg=f"step {k}")


def test_sharded_flash_gates_on_head_divisibility():
    """A tp that doesn't divide n_head falls back to the XLA ring branch
    (never a shape error inside the shard_map)."""
    from bdm_db1_tpu.core.config import db1_tiny

    cfg = db1_tiny(decode_flash="on")
    mesh = _mesh(1, 8)  # tp=8 does not divide n_head=4
    fmodel = TransformerXL(cfg.model, cfg.vocab, cfg.vision,
                           decode_mesh=mesh)
    assert not fmodel._use_flash_decode(1)
    assert not fmodel._use_flash_decode(4)
    # when tp divides, q == 1 and primes both shard_map onto the mesh
    fmodel2 = TransformerXL(cfg.model, cfg.vocab, cfg.vision,
                            decode_mesh=_mesh(2, 4))
    assert fmodel2._use_flash_decode(1)
    assert fmodel2._use_flash_decode(4)
