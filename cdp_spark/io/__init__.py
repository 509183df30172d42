"""IO: sink executors (batch) and NDJSON helpers re-exported."""

from .sinks import sink_payload_lines

__all__ = ["sink_payload_lines"]
