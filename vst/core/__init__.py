"""vst.core — config, rng, checkpointing, precision, logging."""

from vst.core.checkpoint import Checkpointer
from vst.core.metrics import MetricsLogger, save_json, aggregate_means
from vst.core.trace import profile_trace, annotate, ChainTimer

__all__ = ["Checkpointer", "MetricsLogger", "save_json", "aggregate_means",
           "profile_trace", "annotate", "ChainTimer"]
