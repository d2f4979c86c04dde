"""Shared utilities: profiling hooks and small helpers."""

from .profiling import stage_timer, trace_annotation

__all__ = ["stage_timer", "trace_annotation"]
