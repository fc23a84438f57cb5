"""xprof the 1.2B headline decode (b40 lockstep) and rank device op time.

Evidence collector for the decode roofline (PERFORMANCE.md): the fused
ring kernels put the cache stream at ~1 pass/forward, yet the measured
env step (163 ms at 245 a/s) still sits ~2x above the naive HBM floor
(cache + weights once per forward). This script traces the exact
bench_eval steady-state loop and prints where the device time actually
goes — kernel vs bias build vs block merge vs FFN/proj matmuls vs gaps.

Usage (real chip):

    timeout 3600 python scripts/xprof_decode.py [--steps 3] [--warmup 3]
        [--batch 40] [--geometry mujoco] [--cache-dtype int8]
"""

from __future__ import annotations

import argparse
import glob
import json
import sys
import tempfile
import time
import types

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--geometry", default="mujoco")
    ap.add_argument("--cache-dtype", default="")
    ap.add_argument("--weight-dtype", default="")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax

    import bench

    if args.smoke:
        bench._force_cpu_smoke()

    # reuse bench_eval's exact setup through a synthetic args namespace
    bargs = types.SimpleNamespace(
        smoke=args.smoke, cache_dtype=args.cache_dtype,
        weight_dtype=args.weight_dtype, speculate=False,
        spec_ceiling=False, spec_adaptive=False, spec_policy="",
        batch=args.batch, steps=args.steps, warmup=args.warmup,
        geometry=args.geometry, tag="")
    episode_len = args.warmup + args.steps + 1
    B = bench._default_eval_batch(bargs, args.geometry)
    cfg, model, params, ds, tenvs, _ = bench._eval_setup(
        bargs, B, episode_len, args.geometry)
    from bdm_db1_tpu.eval.decode import build_decoder_for_env

    decoder = build_decoder_for_env(model, params, tenvs[0])

    rng = np.random.RandomState(0)
    sep = np.array([tenvs[0].separator_id], dtype=np.int64)
    primes, prime_imgs = [], []
    for te in tenvs:
        prompt, pimg = te.get_prompt(strict_length=True, rng=rng)
        obs_tokens, oimg, _ = te.reset()
        primes.append(np.concatenate([prompt, obs_tokens, sep]))
        if pimg is not None:
            prime_imgs.append(np.concatenate([pimg, oimg], axis=0))
    prime = np.stack(primes)
    prime_img = np.stack(prime_imgs) if prime_imgs else None
    mems = decoder.init_mems(B)

    deferred = None

    # fake envs in bench_eval drive via the tokenized wrapper; here the
    # steady prime just replays the reset observation (same shapes, same
    # program) — the device program is what we are tracing
    steady_rows = []
    steady_imgs = []
    for te in tenvs:
        obs_tokens, oimg, _ = te.reset()
        steady_rows.append(np.concatenate([obs_tokens, sep]))
        if oimg is not None:
            steady_imgs.append(oimg)
    steady = np.stack(steady_rows)
    steady_img = np.stack(steady_imgs) if steady_imgs else None

    def one_step(prime, prime_img, mems, deferred):
        act_tokens, mems = decoder.decode(
            prime, mems, prime_images=prime_img,
            deferred_tok=deferred, defer_last=decoder.defers)
        act = np.asarray(act_tokens)
        if decoder.defers:
            w = getattr(decoder, "defer_width", 1)
            deferred = act[:, -w:] if w > 1 else act[:, -1]
        return mems, deferred

    # step 0: long prompt prime; then steady [obs || sep] steps
    mems, deferred = one_step(prime, prime_img, mems, deferred)
    for _ in range(args.warmup):
        mems, deferred = one_step(steady, steady_img, mems, deferred)

    tmp = tempfile.mkdtemp(prefix="xprof_decode_")
    t0 = time.perf_counter()
    jax.profiler.start_trace(tmp)
    for _ in range(args.steps):
        mems, deferred = one_step(steady, steady_img, mems, deferred)
    jax.profiler.stop_trace()
    wall_ms = (time.perf_counter() - t0) / args.steps * 1e3

    path = glob.glob(f"{tmp}/**/*.xplane.pb", recursive=True)[0]
    data = jax.profiler.ProfileData.from_file(path)
    plane = None
    for p in data.planes:
        if "TPU" in p.name or "Device" in p.name:
            plane = p
            break
    if plane is None and args.smoke:  # CPU smoke: host plane only
        plane = next(p for p in data.planes if "CPU" in p.name)
    assert plane is not None, [p.name for p in data.planes]

    op_ns: dict = {}
    total_ns = 0
    for line in plane.lines:
        if "XLA Ops" not in line.name:
            continue
        for ev in line.events:
            total_ns += ev.duration_ns
            op_ns[ev.name] = op_ns.get(ev.name, 0) + ev.duration_ns

    buckets = (
        ("pallas_q1", ("flash_ring_decode", "decode_kernel")),
        ("pallas_prime", ("flash_ring_prime", "prime_ap", "prime_kernel")),
        ("dus_cache_write", ("dynamic-update-slice", "dynamic_update")),
        ("dyn_slice", ("dynamic-slice",)),
        ("copy", ("copy",)),
        ("custom_call", ("custom-call",)),
        ("fusion", ("fusion",)),
    )
    cat_ns: dict = {}
    for name, dur in op_ns.items():
        low = name.lower()
        for cat, pats in buckets:
            if any(s in low for s in pats):
                cat_ns[cat] = cat_ns.get(cat, 0) + dur
                break
        else:
            cat_ns["other"] = cat_ns.get("other", 0) + dur

    top = sorted(op_ns.items(), key=lambda kv: -kv[1])[:args.top]
    out = {
        "geometry": args.geometry,
        "batch": B,
        "steps": args.steps,
        "wall_ms_per_env_step": round(wall_ms, 2),
        "device_ms_per_env_step": round(total_ns / 1e6 / args.steps, 2),
        "category_ms_per_step": {
            k: round(v / 1e6 / args.steps, 3)
            for k, v in sorted(cat_ns.items(), key=lambda kv: -kv[1])},
        "top_ops_ms_per_step": {
            n: round(d / 1e6 / args.steps, 3) for n, d in top},
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
