"""Flagship (1.2B) checkpoint rehearsal on the real chip.

The orbax save/restore and DeepSpeed-conversion paths were only ever
exercised at tiny config on CPU (tests/test_checkpoint.py,
test_ckpt_dir_resolution.py). This script runs both at the REAL 1.2B
geometry against the attached TPU and prints timed JSON lines
(r4 VERDICT missing #4):

Part A — training-state durability (reference has none beyond DeepSpeed
engine save, src/checkpointing.py:17-22):
  build the sharded 1.2B train state (bf16 params, fp32 master, bf16 mu),
  run one step, TIME the async orbax save (dispatch + wait), run a
  reference second step, delete the live state, TIME the restore from an
  abstract template (no double-residency in HBM), re-run the second step
  and assert bitwise loss equality — resume is exact, not approximate.

Part B — the eval CLI's cold path on a raw reference checkpoint
(reference: src/evaluation/evaluate_rl.py:509-511): synthesize a
1.2B-geometry fp16 ``mp_rank_00_model_states.pt`` from flax params
(train/convert.py invert/save), then TIME find->convert->upload->first
decode at the flagship geometry.

Usage: python scripts/ckpt_rehearsal.py [--part a|b|all] [--smoke]
       [--dir /tmp/ckpt_rehearsal]
Results are recorded in PERFORMANCE.md ("Flagship checkpoint
rehearsal").
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def _emit(rec):
    print(json.dumps(rec), flush=True)


def part_a(args) -> None:
    import jax
    import jax.numpy as jnp

    from bdm_db1_tpu.core.config import db1_1p2b, db1_tiny
    from bdm_db1_tpu.data.input_specs import RLTaskBatch
    from bdm_db1_tpu.models.transformer_xl import TransformerXL
    from bdm_db1_tpu.parallel.mesh import make_mesh
    from bdm_db1_tpu.train.checkpoint import CheckpointManager
    from bdm_db1_tpu.train.step import (
        make_optimizer, make_sharded_train_step, make_train_rng,
    )
    from bdm_db1_tpu.train.trainer import to_gato_batch

    if args.smoke:
        cfg = db1_tiny()
        cfg.model.dtype = "float32"
        micro = 2
    else:
        cfg = db1_1p2b()
        cfg.model.param_dtype = "bfloat16"
        cfg.model.remat = True
        cfg.train.optimizer.adam_mu_dtype = "bfloat16"
        micro = 4
    cfg.mesh.model_parallel = 1
    mesh = make_mesh(cfg.mesh)
    layout = cfg.vocab.layout()
    L = cfg.model.n_position
    rng = np.random.RandomState(0)
    toks = rng.randint(0, layout.total_vocab_size,
                       (1, micro, L)).astype(np.int32)
    raw = {"rl": {"tokens": toks,
                  "position_id": np.zeros_like(toks),
                  "loss_mask": np.ones_like(toks, np.float32),
                  "label": toks}}
    batch = to_gato_batch(raw)
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    tx = make_optimizer(cfg.train.optimizer, 1000)
    init_fn, step_fn = make_sharded_train_step(
        model, tx, jax.random.PRNGKey(0), batch, mesh)
    state = init_fn(batch)
    key = make_train_rng(1, "rbg")
    state, m = step_fn(state, batch, key)
    float(m["loss"])  # block: compile done, step-1 state materialized
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(state.params))
    state_bytes = sum(int(np.prod(x.shape)) * x.dtype.itemsize
                      for x in jax.tree.leaves(state))
    ckpt_dir = os.path.join(args.dir, "orbax")
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    mgr = CheckpointManager(ckpt_dir)

    t0 = time.perf_counter()
    mgr.save(1, state, client_state={"iteration": 1})
    t_dispatch = time.perf_counter() - t0
    mgr.wait()
    t_save = time.perf_counter() - t0

    # reference second step (donates `state`; capture the loss first)
    state2, m2 = step_fn(state, batch, key)
    loss2_ref = float(m2["loss"])
    del state, state2  # free HBM before restore materializes a new state

    # abstract template from the init shapes (the live state was deleted
    # above — restoring into a concrete template would put TWO full train
    # states in HBM, ~28 GB at 1.2B on a 16 GB chip)
    abstract = jax.eval_shape(init_fn, batch)
    template = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), abstract)
    t0 = time.perf_counter()
    restored, client = mgr.restore(template)
    jax.block_until_ready(jax.tree.leaves(restored)[0])
    t_restore = time.perf_counter() - t0
    assert client["iteration"] == 1

    _, m2b = step_fn(restored, batch, key)
    loss2_restored = float(m2b["loss"])
    mgr.close()
    on_disk = sum(os.path.getsize(os.path.join(r, f))
                  for r, _, fs in os.walk(ckpt_dir) for f in fs)
    _emit({
        "metric": "ckpt_orbax_1p2b" if not args.smoke else
        "ckpt_orbax_smoke",
        "n_params": n_params,
        "state_bytes": state_bytes,
        "on_disk_bytes": on_disk,
        "save_dispatch_seconds": round(t_dispatch, 2),
        "save_total_seconds": round(t_save, 2),
        "restore_seconds": round(t_restore, 2),
        "resume_loss_ref": loss2_ref,
        "resume_loss_restored": loss2_restored,
        "resume_exact": loss2_restored == loss2_ref,
    })
    assert loss2_restored == loss2_ref, "resume is not bitwise exact"
    if not args.keep:
        shutil.rmtree(ckpt_dir, ignore_errors=True)


def part_b(args) -> None:
    import jax
    import jax.numpy as jnp

    from bdm_db1_tpu.core.config import db1_1p2b, db1_tiny
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
    from bdm_db1_tpu.train.convert import (
        convert_checkpoint, save_deepspeed_checkpoint,
    )

    if args.smoke:
        cfg = db1_tiny()
        cfg.model.dtype = "float32"
        obs_dim, act_dim = 4, 2
    else:
        cfg = db1_1p2b()
        cfg.model.param_dtype = "bfloat16"
        obs_dim, act_dim = 17, 6
    L = cfg.model.n_position
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    tok0 = jnp.zeros((1, L), jnp.int32)
    init_batch = {"rl": RLTaskBatch(tokens=tok0, position_id=tok0,
                                    loss_mask=tok0, label=tok0)}
    params = model.init(jax.random.PRNGKey(0), init_batch)["params"]

    ds_dir = os.path.join(args.dir, "deepspeed")
    shutil.rmtree(ds_dir, ignore_errors=True)
    t0 = time.perf_counter()
    path = save_deepspeed_checkpoint(params, cfg, ds_dir, "synth_1p2b")
    t_synth = time.perf_counter() - t0
    del params
    size = os.path.getsize(path)

    # ---- the cold path, timed end to end ----
    t0 = time.perf_counter()
    np_params = convert_checkpoint(ds_dir, "synth_1p2b", cfg)
    t_convert = time.perf_counter() - t0

    layout = cfg.vocab.layout()
    suite = RLTokenizerSuite(
        layout, ScalarTokenizer(cfg.vocab.num_continuous_bin),
        ByteTextTokenizer(), vision_patch_size=cfg.vision.patch_size)
    store = TrajectoryStore.from_flat_dataset(
        FakeContinuousEnv(obs_dim=obs_dim, act_dim=act_dim,
                          episode_len=20, seed=0).make_dataset(3))
    ds = RLFullDataset("rehearsal", store, suite, seq_length=L,
                       use_prompt=True, seed=0)
    tenv = TokenizedEnv(
        FakeContinuousEnv(obs_dim=obs_dim, act_dim=act_dim,
                          episode_len=20, seed=1), ds)
    t0 = time.perf_counter()
    dt = jnp.dtype(cfg.model.param_dtype or "float32")
    dev_params = jax.tree.map(lambda x: jnp.asarray(x, dt), np_params)
    jax.block_until_ready(jax.tree.leaves(dev_params)[0])
    t_upload = time.perf_counter() - t0
    del np_params

    dec = build_decoder_for_env(model, dev_params, tenv)
    sep = np.array([tenv.separator_id], np.int64)
    obs, _, _ = tenv.reset()
    prime = np.concatenate([obs, sep])[None]
    t0 = time.perf_counter()
    act, mems = dec.decode(prime, dec.init_mems(1))
    np.asarray(act)
    t_first_decode = time.perf_counter() - t0
    _emit({
        "metric": "ckpt_deepspeed_cold_path_1p2b" if not args.smoke
        else "ckpt_deepspeed_cold_path_smoke",
        "file_bytes": size,
        "synthesize_seconds": round(t_synth, 2),
        "convert_seconds": round(t_convert, 2),
        "upload_seconds": round(t_upload, 2),
        "first_decode_seconds": round(t_first_decode, 2),
        "action_shape": list(np.asarray(act).shape),
    })
    if not args.keep:
        shutil.rmtree(ds_dir, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", choices=["a", "b", "all"], default="all")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--dir", default="/tmp/ckpt_rehearsal")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        import jax

        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=1")
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    os.makedirs(args.dir, exist_ok=True)
    if args.part in ("a", "all"):
        part_a(args)
    if args.part in ("b", "all"):
        part_b(args)


if __name__ == "__main__":
    main()
