"""stdin input (src/input/stdin.ts:68-112).

The reference reads NDJSON from the process's stdin until EOF.  The
Spark analog captures stdin driver-side (it is inherently a single
local feed) and parses it with the same tolerant line parser as every
other line-oriented source, so wrap directives, vector flattening, and
dead letters behave identically to tail/file/http inputs.

``read_stdin`` is the batch form: drain stdin to EOF, return (events,
dead_letters).  For continuous stdin feeds, spool to a directory and
use ``stream_ndjson_files`` — the reference's stdin is also
drain-to-EOF (it resolves its end-promise when stdin closes), so the
batch form is the faithful one.
"""

from __future__ import annotations

import sys
from typing import IO, Optional

from pyspark.sql import DataFrame, SparkSession

from ..events import WrapDirective, parse_lines


def read_stdin(
    spark: SparkSession,
    wrap: WrapDirective = None,
    source: Optional[IO[str]] = None,
) -> tuple[DataFrame, DataFrame]:
    """Drain stdin (or an injected file-like ``source``, for tests and
    embedding apps) and parse its lines into (events, dead_letters)."""
    stream = source if source is not None else sys.stdin
    lines = [line.rstrip("\n") for line in stream]
    lines_df = spark.createDataFrame(
        [(line,) for line in lines] or [], "value string"
    )
    return parse_lines(lines_df, "value", wrap)
