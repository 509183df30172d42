"""Run a validated pipeline template as a Structured Streaming query.

The reference executes one continuous process: events flow through the
step DAG as they arrive, vectors assemble per-step by count-or-time
(src/api.ts:318-441, src/pipeline.ts:109-254).  Here the same
*compiled* pipeline runs per micro-batch via ``foreachBatch``: every
trigger, the batch compiler lowers the template over that batch's
events and executes sinks + output.

Semantics vs the reference:

- The batch-shared arrival timestamp is exact parity: the reference
  stamps every event in one poll with a single wall-clock read
  (``arrivalTimestamp`` box, src/event.ts:198-206); here every event
  in a micro-batch gets the trigger's wall-clock read.
- Step windows assemble *within* a micro-batch.  A count window whose
  buffer spans a trigger boundary flushes at the boundary (as if the
  reference's time limit fired at the trigger interval).  For exact
  cross-batch count-or-time state, use
  :func:`cdp_spark.streaming.streaming_count_or_time` — the stateful
  operator — on a single step's stream; the per-batch runner trades
  that state for running the *whole DAG* including sinks.
- Backpressure / queueing are Spark's (trigger intervals, source rate
  limits) — not reimplemented (SURVEY §2.5).

Metrics: pass a :class:`cdp_spark.metrics.PipelineMetrics`; per-batch
observed counters accumulate into the reference's counter families.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..metrics import PipelineMetrics
from ..pipeline.compiler import compile_pipeline
from ..pipeline.template import PipelineTemplate
from .sources import stream_generator, stream_ndjson_files


def _input_stream(spark: SparkSession, template: PipelineTemplate) -> DataFrame:
    form, opts = template.input_form, template.input_options
    o = opts if isinstance(opts, dict) else {}
    if form in ("file", "tail"):
        path = opts if isinstance(opts, str) else o["path"]
        return stream_ndjson_files(spark, path, wrap=o.get("wrap"))
    if form == "generator":
        return stream_generator(
            spark,
            name=o.get("name", "_generated"),
            seconds=float(o.get("seconds", 1)),
        )
    if form == "http":
        from .http_input import stream_http

        endpoint = opts if isinstance(opts, str) else o.get("endpoint", "/events")
        stream, _server = stream_http(
            spark,
            spool_dir=o.get("spool-dir", "/tmp/cdp_spark_http_spool"),
            endpoint=endpoint,
            port=int(o.get("port", 0)) or 0,
            wrap=o.get("wrap"),
        )
        return stream
    raise NotImplementedError(
        f"input form '{form}' has no streaming executor here; brokered "
        "inputs (amqp/mqtt/redis) map to the Kafka source, poll to "
        "an ingest bridge (cdp_spark.streaming.sources module notes)"
    )


def run_pipeline_stream(
    template: PipelineTemplate,
    spark: Optional[SparkSession] = None,
    input_stream: Optional[DataFrame] = None,
    on_batch: Optional[Callable[[DataFrame, int], None]] = None,
    metrics: Optional[PipelineMetrics] = None,
    checkpoint_dir: Optional[str] = None,
    trigger_seconds: Optional[float] = None,
    available_now: bool = False,
) -> StreamingQuery:
    """Start the pipeline as a streaming query and return it.

    ``input_stream`` overrides the template's input form (the library
    entry point, like ``input_df`` in batch).  ``on_batch`` receives
    each micro-batch's terminal output (already trace-stamped); sinks
    declared in the template run every batch regardless.
    """
    if input_stream is None:
        if spark is None:
            raise ValueError("need spark or input_stream")
        input_stream = _input_stream(spark, template)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # One wall-clock read per micro-batch = the reference's
        # batch-shared arrivalTimestamp (src/event.ts:198-206).
        arrival = time.time()
        result = compile_pipeline(
            batch_df.sparkSession,
            template,
            input_df=batch_df,
            arrival_ts=arrival,
            observe=metrics is not None,
        )
        result.run_sinks()
        if on_batch is not None:
            on_batch(result.output, epoch_id)
        elif metrics is not None:
            # Observations need the output plan to execute once.
            result.output.count()
        if metrics is not None:
            metrics.update_from(result)

    writer = input_stream.writeStream.foreachBatch(process_batch)
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_seconds is not None:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
