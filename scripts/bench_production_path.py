"""Wall-clock actions/sec of the PRODUCTION eval path at 1.2B: 48 fake
HalfCheetah-geometry envs through evaluate_envs_lockstep (geometry
bucketing, interleave-2 cohorts, padding, host env stepping included)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from bdm_db1_tpu.core.config import db1_1p2b
from bdm_db1_tpu.data.input_specs import RLTaskBatch
from bdm_db1_tpu.data.rl_dataset import (
    RLFullDataset, RLTokenizerSuite, TrajectoryStore,
)
from bdm_db1_tpu.eval.envs import FakeContinuousEnv
from bdm_db1_tpu.eval.harness import evaluate_envs_lockstep
from bdm_db1_tpu.eval.wrapper import TokenizedEnv
from bdm_db1_tpu.models.transformer_xl import TransformerXL
from bdm_db1_tpu.tokenizers.scalar import ScalarTokenizer
from bdm_db1_tpu.tokenizers.text import ByteTextTokenizer

cfg = db1_1p2b()
cfg.model.param_dtype = "bfloat16"
obs_dim, act_dim, EP = 17, 6, 40
layout = cfg.vocab.layout()
suite = RLTokenizerSuite(
    layout, ScalarTokenizer(cfg.vocab.num_continuous_bin),
    ByteTextTokenizer(), vision_patch_size=cfg.vision.patch_size)
store = TrajectoryStore.from_flat_dataset(
    FakeContinuousEnv(obs_dim=obs_dim, act_dim=act_dim,
                      episode_len=EP).make_dataset(3))
ds = RLFullDataset("halfcheetah-geometry", store, suite,
                   seq_length=cfg.model.n_position, use_prompt=True, seed=0)

def make_tenv(name):
    seed = int(name.split("-")[-1])
    return TokenizedEnv(FakeContinuousEnv(obs_dim=obs_dim, act_dim=act_dim,
                                          episode_len=EP, seed=seed), ds)

model = TransformerXL(cfg.model, cfg.vocab, cfg.vision)
L = cfg.model.n_position
tok = jnp.zeros((1, L), jnp.int32)
params = model.init(jax.random.PRNGKey(0), {"rl": RLTaskBatch(
    tokens=tok, position_id=tok, loss_mask=tok, label=tok)})["params"]

from bdm_db1_tpu.eval.decode import DecoderPool

names = [f"fake-{i}" for i in range(48)]
# ONE pool across every pass: a fresh pool per call re-traces the 1.2B
# decode programs inside the timed region (tens of seconds of Python
# tracing the production CLI never pays; cost r3 a 31.7-vs-126.4 mystery)
pool = DecoderPool(model, params)
# warm-up pass compiles prompt-prime + step programs (1 trial, all 48 envs)
t0 = time.perf_counter()
res = evaluate_envs_lockstep(model, params, names, make_tenv, num_trials=1,
                             seed=100, batch_size=24, interleave=2,
                             decoder_pool=pool)
t_warm = time.perf_counter() - t0
total_actions = sum(r["length_mean"] * r["num_trials"] for r in res)
print(f"warm pass (incl. compiles): {t_warm:.1f}s", flush=True)

for bs, il in ((24, 2), (40, 1), (24, 1), (48, 1)):
    t0 = time.perf_counter()
    res = evaluate_envs_lockstep(model, params, names, make_tenv,
                                 num_trials=1, seed=101 + il,
                                 batch_size=bs, interleave=il,
                                 decoder_pool=pool)
    dt = time.perf_counter() - t0
    total_actions = sum(r["length_mean"] * r["num_trials"] for r in res)
    print(f"production b{bs} x interleave {il}: {total_actions:.0f} actions "
          f"in {dt:.1f}s -> {total_actions/dt:.1f} actions/s wall",
          flush=True)
print("DONE_PRODUCTION")
