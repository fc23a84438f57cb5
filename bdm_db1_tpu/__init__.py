"""bdm-db1-tpu: a TPU-native (JAX/XLA/Pallas/pjit) generalist decision-model
framework with the capabilities of BDM-DB1 (Gato-style multi-modal,
multi-task TransformerXL). See SURVEY.md for the blueprint."""

__version__ = "0.1.0"
