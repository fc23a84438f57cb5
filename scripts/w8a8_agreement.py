"""W8A8 decode-weight action agreement vs bf16 at the flagship geometry.

W8A8 (`decode_weight_dtype="int8a8"`) wins the throughput bench
(262.4 a/s in BENCH_r04.json) but is a tolerance path — logit drift was
only ever bounded on the tiny config (<3% of range,
tests/test_quant_matmul.py). What serving actually cares about is how
often the GREEDY ACTION flips (reference decode semantics:
src/evaluation/evaluate_rl.py:96-138). This script drives bf16 and W8A8
decoders at 1.2B through IDENTICAL observation streams (both chains
fold their own actions into their own memory, so each is
self-consistent; the obs stream is pre-generated and action-independent)
and reports:

  * full-action agreement rate (all dims equal) per env step,
  * per-dim token agreement rate,
  * mean/max |bin drift| over disagreeing dims (1024-bin action space).

``--policy bc`` first behavior-clones the model on smooth expert data
(train/bc.py) — the realistic operating point; the default random-weight
policy is the adverse one (near-uniform logits flip easiest).
Results go to PERFORMANCE.md ("W8A8 action agreement").

Usage: python scripts/w8a8_agreement.py [--policy bc] [--steps 50]
       [--batch 8] [--smoke]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--policy", choices=["random", "bc"], default="random")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.smoke:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=1")
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

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

    if args.smoke:
        cfg = db1_tiny()
        cfg.model.dtype = "float32"
        obs_dim, act_dim = 4, 3
        steps = min(args.steps, 8)
    else:
        cfg = db1_1p2b()
        cfg.model.param_dtype = "bfloat16"
        obs_dim, act_dim = 17, 6
        steps = args.steps
    B = 2 if args.smoke else args.batch
    walk = 0.08 if args.policy == "bc" else 0.0
    layout = cfg.vocab.layout()
    suite = RLTokenizerSuite(
        layout, ScalarTokenizer(cfg.vocab.num_continuous_bin),
        ByteTextTokenizer(), vision_patch_size=cfg.vision.patch_size)

    def env_fn(seed):
        return FakeContinuousEnv(obs_dim=obs_dim, act_dim=act_dim,
                                 episode_len=steps + 4, seed=seed,
                                 walk_sigma=walk)

    store = TrajectoryStore.from_flat_dataset(env_fn(999).make_dataset(3))
    ds = RLFullDataset("agreement", store, suite,
                       seq_length=cfg.model.n_position, use_prompt=True,
                       seed=0)
    tenvs = [TokenizedEnv(env_fn(i), ds) for i in range(B)]
    model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
    L = cfg.model.n_position
    tok0 = jnp.zeros((1, L), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
        tokens=tok0, position_id=tok0, loss_mask=tok0,
        label=tok0)})["params"]
    if args.policy == "bc":
        from bdm_db1_tpu.train.bc import behavior_clone

        benv = env_fn(555)
        benv.episode_len = 30 if args.smoke else 256
        bc_store = TrajectoryStore.from_flat_dataset(
            benv.make_dataset(2 if args.smoke else 12))
        bc_ds = RLFullDataset("bc-expert", bc_store, suite,
                              seq_length=L, use_prompt=True, seed=1)
        params = behavior_clone(cfg, params, bc_ds,
                                steps=8 if args.smoke else 200,
                                micro=2 if args.smoke else 4,
                                log_every=0 if args.smoke else 50)

    # ---- identical, action-independent prime streams ----
    rng = np.random.RandomState(0)
    sep = np.array([tenvs[0].separator_id], dtype=np.int64)
    starts = []
    for te in tenvs:
        prompt, _ = te.get_prompt(strict_length=True, rng=rng)
        obs, _, _ = te.reset()
        starts.append(np.concatenate([prompt, obs, sep]))
    primes = [np.stack(starts)]
    for _ in range(steps - 1):
        raws = [np.clip(rng.uniform(-1, 1, obs_dim), -1, 1
                        ).astype(np.float32) for _ in range(B)]
        obs_tok, _ = tenvs[0].encode_obs_batch(raws)
        primes.append(np.concatenate(
            [obs_tok, np.broadcast_to(sep, (B, 1))], axis=1))

    def chain(dec):
        mems = dec.init_mems(B)
        deferred = None
        acts = []
        for p in primes:
            a, mems = dec.decode(p, mems, deferred_tok=deferred,
                                 defer_last=dec.defers)
            a = np.asarray(a)
            if dec.defers:
                deferred = a[:, -dec.defer_width:] \
                    if dec.defer_width > 1 else a[:, -1]
            acts.append(a)
        del mems
        return np.stack(acts)  # [steps, B, act_dim]

    t0 = time.perf_counter()
    acts_bf16 = chain(build_decoder_for_env(model, params, tenvs[0]))
    t_bf16 = time.perf_counter() - t0
    qmodel = TransformerXL(
        dataclasses.replace(model.cfg, decode_weight_dtype="int8a8"),
        cfg.vocab, cfg.vision)
    t0 = time.perf_counter()
    acts_w8a8 = chain(build_decoder_for_env(qmodel, params, tenvs[0]))
    t_w8a8 = time.perf_counter() - t0

    same_dim = acts_bf16 == acts_w8a8
    full_agree = same_dim.all(axis=-1)
    drift = np.abs(acts_bf16.astype(np.int64) - acts_w8a8)
    dis = drift[~same_dim]
    n_steps_total = int(np.prod(full_agree.shape))
    print(json.dumps({
        "metric": ("w8a8_action_agreement_1p2b" if not args.smoke
                   else "w8a8_action_agreement_smoke"),
        "policy": args.policy,
        "env_steps": n_steps_total,
        "action_dims": int(np.prod(same_dim.shape)),
        "full_action_agreement": round(float(full_agree.mean()), 4),
        "per_dim_agreement": round(float(same_dim.mean()), 4),
        "mean_bin_drift_when_diff": (round(float(dis.mean()), 2)
                                     if dis.size else 0.0),
        "max_bin_drift": int(drift.max()),
        "num_continuous_bins": layout.num_continuous_bin,
        "chain_seconds_bf16": round(t_bf16, 1),
        "chain_seconds_w8a8": round(t_w8a8, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
