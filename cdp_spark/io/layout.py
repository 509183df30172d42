"""Table layout for the 100 TB tier: time-partitioned parquet with
partition-pruned reads.

A single 100 TB events table is only queryable if scans touch the
slice they need.  Hive-style time partitioning (``.../p_date=2024-01-05/``)
makes Catalyst prune at PLANNING time: a filter on the partition
column becomes ``PartitionFilters`` in the scan — unmatched
directories are never listed, never opened, never read.  This is the
difference between "reads 3 days" and "reads 3 years".

Layout rules encoded here:

- partition on a DERIVED low-cardinality column (date, not raw
  timestamp — one directory per microsecond is the classic
  anti-pattern), keep the raw column in the data;
- order within files by the partition column's natural sort key so
  parquet min/max row-group stats stay tight for range predicates on
  the raw timestamp (pushed as ``PushedFilters``);
- pruning composes with everything else in this repo: the pruned
  DataFrame is a normal input to the pipeline compiler, the dedup /
  analytics operators, and the ANN index readers (which use the same
  mechanism — their bucket id IS a partition column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    partition_col: str = "p_date",
    files_per_partition: int = 1,
) -> None:
    """Write ``df`` as parquet partitioned by the DATE of ``ts_col``.

    Repartitioning on ``(p_date, hash(ts) % files_per_partition)``
    spreads each directory's rows over up to ``files_per_partition``
    write tasks: parallelism scales with the NUMBER OF DATES (at
    100 TB, thousands of concurrent writers), and the file-count knob
    genuinely splits within a directory (files per directory =
    distinct tasks holding that date, capped at
    ``files_per_partition``).  A plain
    ``repartition(n, partition_col)`` would do neither — ``n`` is the
    TOTAL shuffle-partition count (``n=1`` funnels the whole dataset
    through one serial write task), and each date hashes to a single
    task, so directories never get more than one file.

    The shuffle-partition count is pinned explicitly (session
    ``spark.sql.shuffle.partitions``) because AQE coalesces
    column-only repartitions by data size — at small volume it would
    merge everything back into one task, silently disabling the knob;
    explicit user counts are exempt from coalescing.  Within each
    file, rows sort by the raw timestamp for tight row-group stats.
    """
    num_tasks = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    (
        df.withColumn(partition_col, F.to_date(F.col(ts_col)))
        .repartition(
            num_tasks,
            F.col(partition_col),
            F.pmod(F.xxhash64(F.col(ts_col)), F.lit(files_per_partition)),
        )
        .sortWithinPartitions(partition_col, ts_col)
        .write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(path)
    )


def read_time_partitioned(
    spark: SparkSession,
    path: str,
) -> DataFrame:
    """Read a time-partitioned table; filters on the partition column
    (or on expressions Catalyst can reduce to it) prune directories at
    planning time."""
    return spark.read.parquet(path)


def partition_filters_of(df: DataFrame) -> str:
    """The PartitionFilters the physical scan will apply — assert on
    this in tests: a pruned plan names the partition predicate here,
    an unpruned plan has an empty list and reads the world."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            start = line.index("PartitionFilters")
            return line[start:].split("], ", 1)[0] + "]"
    return ""
