"""Misc utilities: profiling/tracing."""

from t2onet_tpu.utils.profiling import PhaseTimer, trace  # noqa: F401
