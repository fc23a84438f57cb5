"""Typed configuration tree.

Replaces the reference's layered argparse (reference: src/config.py:25-180,
src/train_utils/train_config.py:22-440, src/evaluation/evaluate_rl.py:58-82)
with nested dataclasses + a generic CLI/JSON bridge. Defaults mirror the
reference flags; the ``db1_1p2b()`` preset mirrors the launch script
(reference: scripts/evaluate/evaluate_rl_1.2B.sh:14-90).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

from bdm_db1_tpu.core.vocab import VocabLayout


@dataclass
class VocabConfig:
    text_vocab_size: int = 32_000
    num_discrete_values: int = 1_024
    num_continuous_bin: int = 1_024
    overlap_with_text: bool = True
    discretize_mu: float = 100.0
    discretize_M: float = 256.0

    def layout(self) -> VocabLayout:
        return VocabLayout(
            text_vocab_size=self.text_vocab_size,
            num_discrete_values=self.num_discrete_values,
            num_continuous_bin=self.num_continuous_bin,
            overlap_with_text=self.overlap_with_text,
        )


@dataclass
class VisionConfig:
    num_input_channels: int = 3
    patch_size: int = 16
    position_vocab_size: int = 128
    hidden_dropout_prob: float = 0.5
    # IC/VQA input resolution (reference vit_dataset.py transform stacks)
    image_size: int = 224


@dataclass
class ModelConfig:
    n_embed: int = 768
    n_position: int = 1024
    n_layer: int = 12
    n_head: int = 12
    n_inner: Optional[int] = None
    activation_fn: str = "gelu"
    layer_norm_epsilon: float = 1e-5
    # dropout family (reference: src/config.py:108-168)
    resid_pdrop: float = 0.1
    attn_pdrop: float = 0.0
    embd_pdrop: float = 0.1
    drop: float = 0.1
    dropattn: float = 0.0
    # "u8": byte-granular masks (ops/fast_dropout.py) — 4x fewer PRNG
    # bits than nn.Dropout's per-element uint32; keep prob quantized to
    # 1/256 (0.1 -> 230/256), survivors rescaled by the true quantized
    # prob (unbiased). Measured FLAT on v5e at 1.2B (12,776.6 vs 12,791
    # tok/s): with hardware-RBG keys the bit generation is already ~free,
    # so the residual dropout cost is the mask apply + its remat
    # recompute, not PRNG volume (PERFORMANCE.md). Default stays "flax"
    # (nn.Dropout, float-granular like the reference's torch dropout).
    dropout_impl: str = "flax"
    # TransformerXL
    mem_len: int = 0
    pre_lnorm: bool = False
    same_length: bool = True
    untie_r: bool = False
    clamp_len: Optional[int] = None  # defaults to n_position
    use_deepnorm: bool = False
    share_input_output_embedding: bool = True
    # RL local-timestep embedding vocab: ids 1..512 for obs+separator, 0 = action
    rl_timestep_vocab_size: int = 513
    # "auto": fused Pallas flash rel-attention on TPU when shapes allow,
    # XLA einsum path otherwise; "xla" / "pallas" force a path.
    attention_impl: str = "auto"
    # rematerialize each decoder layer in backward (jax.checkpoint):
    # trades ~30% step FLOPs for O(n_layer) less activation HBM.
    remat: bool = False
    # "full": recompute everything; "dots": save matmul outputs, recompute
    # only elementwise ops (cheaper backward, ~B*1GB more activation HBM)
    remat_policy: str = "full"
    # Megatron-style sequence parallelism: shard the sequence axis of
    # activations over the "model" mesh axis between blocks (LN/dropout/
    # embedding work and activation memory divide by TP; XLA inserts the
    # all-gathers around attention/FFN).
    sequence_sharded_activations: bool = False
    # TPU numerics: bf16 activations, fp32 attention scores/softmax/loss.
    dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # eval decode K/V ring cache storage: "" = activations dtype; "int8"
    # stores the cache as int8 with per-(position, head) scales — halves
    # the cache HBM read per decode step (the cache outweighs the weights
    # at lockstep batch >= 16 at 1.2B) at ~0.5% score error. Opt-in: the
    # greedy-argmax parity guarantee only holds for the exact cache.
    decode_cache_dtype: str = ""
    decode_weight_dtype: str = ""  # trunk weights (QDense) at eval:
    # "int8" = Pallas in-kernel dequant; "int8a8" = + per-row activation
    # quant, MXU-native int8 dot (both tolerance paths, experimental)
    # fused Pallas single-token ring-decode attention
    # (ops/flash_ring_decode.py): streams the stacked K/V cache once per
    # forward instead of XLA's stage-then-dot ~3x traffic. "auto": on TPU
    # when shapes allow; "on" forces it (interpret mode off-TPU, for
    # tests); "off" keeps the XLA einsum ring path.
    decode_flash: str = "auto"
    # speculative (Jacobi) greedy action decode (eval/decode.py): guess the
    # whole continuous-action token block from the previous env step,
    # verify every dimension in one multi-query forward, and loop on
    # device until the greedy fixed point. Produces exactly the sequential
    # greedy actions (same same_length ring argument as chunked priming /
    # deferred tokens) in 1 forward per env step at full acceptance vs
    # action_length forwards sequentially — control policies' temporal
    # action smoothness makes acceptance high. Ignored for discrete
    # (single-token) actions and non-same_length configs.
    decode_speculative: bool = False
    # adaptive speculation (implies decode_speculative capability): each
    # decode chain (cohort/episode) monitors the verify-rounds EWMA and
    # falls back to the classic per-dim scan when guesses stop landing
    # (measured: spec wins +24% at rounds_mean 1.13 but LOSES 22% at the
    # all-rejected endpoint, PERFORMANCE.md) — probing re-enters when the
    # policy smooths out. Greedy actions are identical on the exact-cache
    # path whichever mode each step runs (both paths are exact), so this
    # only changes throughput, never behavior.
    decode_spec_adaptive: bool = False
    # compact softmax in the all-pairs prime kernel
    # (ops/flash_ring_decode.py _prime_ap_core compact=True): the
    # all-pairs [bm*H, Q*H] score matrix wastes 15/16 of its softmax VPU
    # work on off-diagonal (key-head, query-head) pairs (xprof r5: the
    # prime kernel runs 3.4x above its HBM floor, VPU-bound); this
    # variant extracts the valid diagonal into a [bm, Q*H] matrix,
    # softmaxes that, and expands the probabilities for the PV dot.
    # Output-equal with the default (parity-tested); opt-in pending
    # chip-side win measurement.
    decode_prime_compact: bool = False

    @property
    def d_head(self) -> int:
        assert self.n_embed % self.n_head == 0
        return self.n_embed // self.n_head

    @property
    def d_inner(self) -> int:
        return self.n_inner if self.n_inner is not None else 4 * self.n_embed

    @property
    def effective_clamp_len(self) -> int:
        return self.clamp_len if self.clamp_len is not None else self.n_position


@dataclass
class MeshConfig:
    """SPMD device mesh over ICI/DCN. DP = ``data`` axis, TP = ``model``
    axis; PP (> 1) adds a ``pipe`` axis and runs the GPipe trunk
    (parallel/pipeline.py) with layer params sharded across stages."""

    data_parallel: int = -1  # -1: infer from device count / model_parallel
    model_parallel: int = 1
    pipeline_parallel: int = 1
    # pipeline microbatches per (grad-accum) micro step; -1 -> 2 * stages
    pipeline_microbatches: int = -1
    axis_names: Tuple[str, str] = ("data", "model")
    # multi-controller bootstrap: None = auto-detect from the launcher's
    # environment (SLURM/OpenMPI/TPU-pod vars, parallel/distributed.py),
    # True = force jax.distributed.initialize(), False = never
    multihost: Optional[bool] = None


@dataclass
class OptimizerConfig:
    optimizer: str = "adamw"
    lr: float = 1e-4
    min_lr: float = 1e-5
    adam_beta1: float = 0.9
    adam_beta2: float = 0.95
    adam_eps: float = 1e-8
    weight_decay: float = 0.1
    end_weight_decay: float = 0.1
    start_weight_decay: float = 0.1
    weight_decay_incr_style: str = "constant"
    clip_grad: float = 1.0
    adam_mu_dtype: Optional[str] = None  # e.g. "bfloat16" to halve moment HBM
    adam_nu_dtype: Optional[str] = None  # same for the second moment
    fused: bool = False  # single-tree_map AdamW (train/step.py fused_adamw)
    lr_decay_style: str = "cosine"
    lr_warmup_iters: int = 0
    lr_warmup_fraction: Optional[float] = None
    lr_decay_iters: Optional[int] = None


@dataclass
class TrainConfig:
    train_iters: int = 10_000
    global_batch_size: int = 512
    micro_batch_size: int = 4
    seed: int = 1234
    log_interval: int = 10
    eval_interval: int = 1000
    eval_iters: int = 10
    save_interval: int = 1000
    save_dir: Optional[str] = None
    load_dir: Optional[str] = None
    ckpt_tag: str = "latest_model"
    tensorboard_dir: Optional[str] = None
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    # loss in fp32; grads accumulated in fp32
    grad_accum_dtype: str = "float32"
    # PRNG impl for the training rng (dropout masks): "rbg" uses the TPU
    # hardware RngBitGenerator — threefry mask generation costs ~16% of the
    # 1.2B train step. "threefry" for cross-platform bit-exactness.
    prng_impl: str = "rbg"


@dataclass
class DataConfig:
    # (weight, prefix, type) triples, reference --data-path semantics
    # (reference: src/data/dataset_utils.py:244-278)
    data_path: Tuple[str, ...] = ()
    split: str = "90,5,5"
    seq_length: int = 1024
    rl_dataset_cache_dir: Optional[str] = None
    use_prompt: bool = True
    prompt_ratio: float = 0.5
    prompt_prob: float = 0.25
    prompt_at_final_transition_prob: float = 0.5
    prompt_strategy: str = "stochastic_subseq;moving_prompt"
    num_workers: int = 2
    tokenizer_save_path: Optional[str] = None
    # few-shot RL finetuning: restrict each RL train split to samples from
    # the first N trajectories (reference: train_config.py:432-440
    # --num-rl-fewshot_episodes -> RLFinetuneDataset)
    num_rl_fewshot_episodes: Optional[int] = None


@dataclass
class EvalConfig:
    env_names: Tuple[str, ...] = ()
    task_suite_names: Tuple[str, ...] = ()
    num_trials: int = 5
    max_step_size: Optional[int] = None
    strict_length: bool = True
    minimal_expert_data: bool = False
    use_prompt: bool = True
    prompt_strategy: str = "stochastic_subseq;moving_prompt"
    seed: int = 100
    # lockstep batching: decode up to batch_size same-geometry episodes per
    # device call (the path bench.py measures); batched=False falls back to
    # the reference-style one-env-at-a-time loop
    # NOTE: the production driver runs `interleave` cohorts concurrently and
    # each live cohort holds its own ring KV cache (24 x batch 1.2B bf16
    # cache = 4.8 GB), so interleave * batch_size bounds HBM — 2 x 24 fits
    # one v5e with headroom; a single cohort can go to 40 (bench.py's
    # measured 142.6 actions/s point).
    batched: bool = True
    batch_size: int = 24
    # cohorts pipelined per geometry bucket: host env stepping of one
    # cohort overlaps device decode of the others (eval/harness.py)
    interleave: int = 2
    # in-training IC/VQA cadence (reference: train.py:173-207 runs
    # caption/VQA metrics from the train loop): samples scored per valid
    # dataset at each eval tick; 0 disables the hook
    ic_vqa_num_samples: int = 64
    ic_vqa_batch_size: int = 8
    # per-env random/expert baselines (JSON: {env: {random, expert}});
    # when set, evaluate_rl appends the expert-normalized suite summary
    # ("fraction of tasks >= threshold", the reference README headline)
    # to its results
    baselines_path: Optional[str] = None
    score_threshold: float = 0.5
    # multi-chip decode: shard the decoder over make_mesh(cfg.mesh) —
    # cohort rows over "data", cache heads + trunk weights over "model"
    # (Megatron TP; eval/decode.py ActionDecoder(mesh=...)). Lower
    # per-action latency and interleave*batch_size scaling O(devices).
    # Requires model.decode_flash="off" (the fused single-chip ring
    # kernels don't partition under pjit).
    sharded_decode: bool = False
    # geometry-bucket coarsening for suite-scale serving: pad steady
    # primes (and chunked primes' last slices) to canonical widths with
    # query-only rows so the 870-env suite needs O(#buckets x
    # #action-lengths) compiled decode programs instead of one per obs
    # length (~60; each is a 10-15 min remote-AOT compile at 1.2B).
    # EXACT — padded greedy actions equal unpadded
    # (tests/test_geometry_buckets.py); census + counts:
    # bdm_db1_tpu/eval/geometry_census.py. Speculative decoders keep
    # exact widths (the guess tail uses the same trailing-row slot).
    decode_obs_buckets: bool = True


@dataclass
class DB1Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    vocab: VocabConfig = field(default_factory=VocabConfig)
    vision: VisionConfig = field(default_factory=VisionConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)

    # ---- serialization ---------------------------------------------------
    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def from_dict(cls, d: dict) -> "DB1Config":
        return _from_dict(cls, d)

    @classmethod
    def from_json(cls, path: str) -> "DB1Config":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    # ---- CLI ---------------------------------------------------------------
    @classmethod
    def parser(cls) -> argparse.ArgumentParser:
        p = argparse.ArgumentParser("bdm-db1-tpu")
        p.add_argument("--config", type=str, default=None, help="JSON config file")
        _add_dataclass_args(p, cls, prefix="")
        return p

    @classmethod
    def from_cli(cls, argv=None) -> "DB1Config":
        args = cls.parser().parse_args(argv)
        cfg = cls.from_json(args.config) if args.config else cls()
        _apply_overrides(cfg, vars(args))
        return cfg


def db1_1p2b(**model_overrides) -> DB1Config:
    """The 1.2B flagship (reference: scripts/evaluate/evaluate_rl_1.2B.sh:16-86)."""
    cfg = DB1Config()
    kw = dict(
        n_embed=2048, n_position=1024, n_layer=24, n_head=16, n_inner=8192,
        activation_fn="geglu", mem_len=1024, pre_lnorm=False,
        same_length=True, untie_r=False, share_input_output_embedding=True,
    )
    kw.update(model_overrides)
    cfg.model = ModelConfig(**kw)
    return cfg


def db1_tiny(**model_overrides) -> DB1Config:
    """A test-scale config with the same structural choices as the flagship."""
    cfg = DB1Config()
    cfg.vocab = VocabConfig(text_vocab_size=256, num_discrete_values=64,
                            num_continuous_bin=64)
    kw = dict(
        n_embed=64, n_position=64, n_layer=2, n_head=4, n_inner=256,
        activation_fn="geglu", mem_len=32, pre_lnorm=False, same_length=True,
        untie_r=False, share_input_output_embedding=True,
    )
    kw.update(model_overrides)
    cfg.model = ModelConfig(**kw)
    cfg.data.seq_length = 64
    return cfg


# ---- generic dataclass<->CLI/JSON plumbing ----------------------------------

def _is_dc(t) -> bool:
    return dataclasses.is_dataclass(t) and isinstance(t, type)


def _from_dict(cls, d: dict):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if _is_dc(f.type if isinstance(f.type, type) else type(None)) and isinstance(v, dict):
            kwargs[f.name] = _from_dict(f.type, v)
        elif isinstance(v, dict) and _is_dc(_resolve_type(cls, f)):
            kwargs[f.name] = _from_dict(_resolve_type(cls, f), v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def _resolve_type(cls, f):
    # dataclass fields may carry string annotations under future-import
    t = f.type
    if isinstance(t, str):
        import typing
        t = typing.get_type_hints(cls).get(f.name, Any)
    return t


def _add_dataclass_args(p, cls, prefix: str):
    for f in dataclasses.fields(cls):
        t = _resolve_type(cls, f)
        name = f"{prefix}{f.name}".replace("_", "-")
        if _is_dc(t):
            _add_dataclass_args(p, t, prefix=f"{prefix}{f.name}.")
            continue
        import typing
        origin = typing.get_origin(t)
        if origin is typing.Union:  # Optional[X]
            inner = [a for a in typing.get_args(t) if a is not type(None)]
            t = inner[0] if inner else str
            origin = typing.get_origin(t)
        if t is bool:
            p.add_argument(f"--{name}", type=_str2bool, default=None)
        elif origin in (tuple, list):
            p.add_argument(f"--{name}", type=str, nargs="*", default=None)
        elif t in (int, float, str):
            p.add_argument(f"--{name}", type=t, default=None)


def _str2bool(x: str) -> bool:
    if x in ("True", "true", "1"):
        return True
    if x in ("False", "false", "0"):
        return False
    raise ValueError(x)


def _apply_overrides(cfg, flat: dict) -> None:
    for k, v in flat.items():
        if v is None or k == "config":
            continue
        obj = cfg
        parts = k.split(".")
        for part in parts[:-1]:
            obj = getattr(obj, part)
        leaf = parts[-1]
        if hasattr(obj, leaf):
            cur = getattr(obj, leaf)
            if isinstance(cur, tuple) and isinstance(v, list):
                v = tuple(v)
            setattr(obj, leaf, v)
