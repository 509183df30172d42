"""Batch input sources (the streaming ones live in cdp_spark.streaming)."""

from .stdin import read_stdin

__all__ = ["read_stdin"]
