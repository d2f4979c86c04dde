"""Shared utilities: profiling hooks and small helpers."""

from .profiling import stage_timer, trace_annotation
from .compile_cache import enable_compilation_cache

__all__ = ["stage_timer", "trace_annotation", "enable_compilation_cache"]
