"""Time-partitioned layout: pruned reads must name PartitionFilters
in the physical scan and return exactly the filtered slice."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdp_spark.io.layout import (
    partition_filters_of,
    read_time_partitioned,
    write_time_partitioned,
)
from cdp_spark.session import load_table

SF = "/root/testdata/sf0.001"


def test_partitioned_write_and_pruned_read(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "events_by_date")
    write_time_partitioned(ev, path)

    table = read_time_partitioned(spark, path)
    # layout: one directory per date, raw ts preserved in the data
    assert "p_date" in table.columns and "ts" in table.columns
    assert table.count() == ev.count()

    pruned = table.where(F.col("p_date") == "2024-01-05")
    filters = partition_filters_of(pruned)
    assert "p_date" in filters, f"no partition pruning in plan: {filters!r}"

    expected = ev.where(F.to_date("ts") == "2024-01-05").count()
    assert pruned.count() == expected


def test_pruning_composes_with_range_predicates(spark, tmp_path):
    """A date-range predicate on the partition column prunes; the raw
    timestamp bound additionally pushes into the parquet scan."""
    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "events_by_date")
    write_time_partitioned(ev, path)
    table = read_time_partitioned(spark, path)

    sliced = table.where(
        (F.col("p_date").between("2024-01-03", "2024-01-04"))
        & (F.col("ts") >= "2024-01-03 12:00:00")
    )
    assert "p_date" in partition_filters_of(sliced)
    expected = ev.where(
        (F.to_date("ts").between("2024-01-03", "2024-01-04"))
        & (F.col("ts") >= "2024-01-03 12:00:00")
    ).count()
    assert sliced.count() == expected


def test_files_per_partition_splits_within_directories(spark, tmp_path):
    """files_per_partition=N must split directories into up to N files
    with write parallelism scaling by date (dates x N hash slots), not
    N TOTAL shuffle partitions with one file per date — the pre-fix
    behavior was 1 file per directory regardless of the knob."""
    import glob
    import os

    ev = load_table(spark, SF, "events")
    path = str(tmp_path / "events_split")
    write_time_partitioned(ev, path, files_per_partition=3)

    date_dirs = sorted(glob.glob(os.path.join(path, "p_date=*")))
    assert date_dirs, "no partition directories written"
    counts = {
        d: len(glob.glob(os.path.join(d, "*.parquet"))) for d in date_dirs
    }
    # hash-slot cap: never more than N files per directory
    assert all(1 <= c <= 3 for c in counts.values()), counts
    # the knob actually splits: directories average >1 file (3 hash
    # slots over >=32 pinned shuffle partitions rarely all collide)
    assert sum(counts.values()) > len(counts), counts

    table = read_time_partitioned(spark, path)
    assert table.count() == ev.count()


def test_unfiltered_read_has_no_partition_filters(spark, tmp_path):
    ev = load_table(spark, SF, "events").limit(100)
    path = str(tmp_path / "events_by_date")
    write_time_partitioned(ev, path)
    table = read_time_partitioned(spark, path)
    assert partition_filters_of(table) in ("", "PartitionFilters: []")
