"""Structured Streaming mode.

The reference is an always-on stream processor; this package maps its
source/sink/window machinery onto Structured Streaming:

- sources: rate (generator analog), file-drop NDJSON (tail analog),
  Kafka as the canonical broker (amqp/mqtt/redis bridge point)
- event-time windows + watermarks (a capability the reference lacks —
  its windows are processing-time only, src/step.ts:76-77)
- count_or_time: the reference's exact count-or-time vector assembly
  as a stateful operator (applyInPandasWithState)
- sinks via foreachBatch reusing the batch sink executors
"""

from .sources import stream_dead_letters, stream_generator, stream_ndjson_files
from .count_or_time import streaming_count_or_time
from .runner import PipelineRunner, run_pipeline_managed, run_pipeline_stream
from .poll import PollDataSource, stream_poll
from .kafka import kafka_event_sink, stream_kafka_events
from .curate import curate_stream

__all__ = [
    "stream_dead_letters",
    "stream_generator",
    "stream_ndjson_files",
    "streaming_count_or_time",
    "run_pipeline_stream",
    "run_pipeline_managed",
    "PipelineRunner",
    "PollDataSource",
    "stream_poll",
    "kafka_event_sink",
    "stream_kafka_events",
    "curate_stream",
]
