"""xprof the 1.2B train step and aggregate device op time by category.

Evidence collector for the dropout-cost question (PERFORMANCE.md): with
hardware-RBG keys, where does the measured ~2.3% dropout overhead
actually sit — PRNG bit generation (the lever `dropout_impl="u8"` and
"generate masks in-kernel" both pull) or the mask apply + its remat
recompute (inherent to dropout semantics)?

Usage (real chip):

    timeout 3600 python scripts/xprof_train.py [--no-dropout] [--u8]

Prints a JSON line with total device time per category over the traced
steps plus the top fusions mentioning rng/select ops.
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import tempfile

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


CATEGORIES = (
    ("rng", ("rng-bit-generator", "rng_bit_generator", "threefry")),
    ("convolution", ("convolution",)),
    ("fusion", ("fusion",)),
    ("copy", ("copy",)),
    ("allreduce", ("all-reduce",)),
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-dropout", action="store_true")
    ap.add_argument("--u8", action="store_true",
                    help="dropout_impl='u8' (byte-granular masks)")
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    import jax

    from bdm_db1_tpu.core.config import db1_1p2b
    from bdm_db1_tpu.models.transformer_xl import TransformerXL
    from bdm_db1_tpu.parallel.mesh import make_mesh
    from bdm_db1_tpu.train.step import (
        make_optimizer, make_sharded_train_step, make_train_rng,
    )
    from bdm_db1_tpu.train.trainer import to_gato_batch

    cfg = db1_1p2b()
    cfg.model.param_dtype = "bfloat16"
    cfg.model.remat = True
    cfg.model.remat_policy = "dots"
    cfg.train.optimizer.adam_mu_dtype = "bfloat16"
    if args.no_dropout:
        cfg.model.drop = cfg.model.embd_pdrop = 0.0
        cfg.model.resid_pdrop = cfg.model.attn_pdrop = 0.0
    if args.u8:
        cfg.model.dropout_impl = "u8"
    micro, accum = 4, 1
    cfg.mesh.model_parallel = 1
    mesh = make_mesh(cfg.mesh)
    layout = cfg.vocab.layout()
    L = cfg.model.n_position
    rng = np.random.RandomState(0)
    toks = rng.randint(0, layout.total_vocab_size,
                       (accum, micro, L)).astype(np.int32)
    idx = np.arange(L)
    pos = np.where(idx % 24 <= 17, 1 + (idx % 24), 0)
    raw = {"rl": {
        "tokens": toks,
        "position_id": np.broadcast_to(pos, toks.shape
                                       ).astype(np.int32).copy(),
        "loss_mask": (np.broadcast_to(pos, toks.shape) == 0
                      ).astype(np.float32).copy(),
        "label": toks,
    }}
    batch = to_gato_batch(raw)
    tx = make_optimizer(cfg.train.optimizer, 1000)
    init_fn, step_fn = make_sharded_train_step(
        TransformerXL(cfg.model, cfg.vocab, cfg.vision),
        tx, jax.random.PRNGKey(0), batch, mesh)
    state = init_fn(batch)
    key = make_train_rng(1, "rbg")
    state, m = step_fn(state, batch, key)
    float(m["loss"])  # compile + settle

    tmp = tempfile.mkdtemp(prefix="xprof_train_")
    jax.profiler.start_trace(tmp)
    for _ in range(args.steps):
        state, m = step_fn(state, batch, key)
    jax.block_until_ready(m["loss"])
    jax.profiler.stop_trace()

    path = glob.glob(f"{tmp}/**/*.xplane.pb", recursive=True)[0]
    data = jax.profiler.ProfileData.from_file(path)
    plane = None
    for p in data.planes:
        if "TPU" in p.name or "Device" in p.name:
            plane = p
            break
    assert plane is not None, [p.name for p in data.planes]

    cat_ns: dict = {}
    op_ns: dict = {}
    total_ns = 0
    for line in plane.lines:
        if "XLA Ops" not in line.name and "Steps" in line.name:
            continue
        if "XLA Ops" not in line.name:
            continue
        for ev in line.events:
            dur = ev.duration_ns
            total_ns += dur
            name = ev.name.lower()
            op_ns[ev.name] = op_ns.get(ev.name, 0) + dur
            for cat, pats in CATEGORIES:
                if any(s in name for s in pats):
                    cat_ns[cat] = cat_ns.get(cat, 0) + dur
                    break
            else:
                cat_ns["other"] = cat_ns.get("other", 0) + dur

    rng_ops = sorted(
        ((n, d) for n, d in op_ns.items()
         if any(s in n.lower() for s in ("rng", "select", "bitcast"))),
        key=lambda kv: -kv[1])[:12]
    out = {
        "config": ("no_dropout" if args.no_dropout
                   else ("u8" if args.u8 else "rbg_flax")),
        "steps": args.steps,
        "total_device_ms": round(total_ns / 1e6, 2),
        "per_step_ms": round(total_ns / 1e6 / args.steps, 2),
        "category_ms": {k: round(v / 1e6, 2)
                        for k, v in sorted(cat_ns.items(),
                                           key=lambda kv: -kv[1])},
        "top_rng_select_ops_ms": {n: round(d / 1e6, 3) for n, d in rng_ops},
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
