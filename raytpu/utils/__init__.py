"""Utilities: profiling/timing, structured run metrics, checkpointing."""

from raytpu.utils.profiling import Timer, profile_trace, scoped
from raytpu.utils.checkpoint import load_checkpoint, save_checkpoint

__all__ = ["Timer", "profile_trace", "scoped",
           "save_checkpoint", "load_checkpoint"]
