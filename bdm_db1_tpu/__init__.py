"""bdm-db1-tpu: a TPU-native (JAX/XLA/Pallas/pjit) generalist decision-model
framework with the capabilities of BDM-DB1 (Gato-style multi-modal,
multi-task TransformerXL). See README.md / SURVEY.md.

Common entry points re-exported lazily (heavy deps load on first use):

    from bdm_db1_tpu import DB1Config, TransformerXL, VocabLayout
"""

import importlib

__version__ = "0.1.0"

_LAZY = {
    "DB1Config": ("bdm_db1_tpu.core.config", "DB1Config"),
    "db1_1p2b": ("bdm_db1_tpu.core.config", "db1_1p2b"),
    "db1_tiny": ("bdm_db1_tpu.core.config", "db1_tiny"),
    "VocabLayout": ("bdm_db1_tpu.core.vocab", "VocabLayout"),
    "TransformerXL": ("bdm_db1_tpu.models.transformer_xl", "TransformerXL"),
    "ScalarTokenizer": ("bdm_db1_tpu.tokenizers.scalar", "ScalarTokenizer"),
    "build_text_tokenizer": ("bdm_db1_tpu.tokenizers.text",
                             "build_text_tokenizer"),
    "RLFullDataset": ("bdm_db1_tpu.data.rl_dataset", "RLFullDataset"),
    "TrajectoryStore": ("bdm_db1_tpu.data.rl_dataset", "TrajectoryStore"),
    "TokenizedEnv": ("bdm_db1_tpu.eval.wrapper", "TokenizedEnv"),
    "ActionDecoder": ("bdm_db1_tpu.eval.decode", "ActionDecoder"),
    "make_mesh": ("bdm_db1_tpu.parallel.mesh", "make_mesh"),
    "Trainer": ("bdm_db1_tpu.train.trainer", "Trainer"),
    "convert_checkpoint": ("bdm_db1_tpu.train.convert", "convert_checkpoint"),
}


def __getattr__(name: str):
    if name in _LAZY:
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(_LAZY) + ["__version__"])
