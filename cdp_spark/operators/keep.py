"""keep — truncate each window vector to its first or last K events
(src/step-functions/keep.ts:79-103).

Spark mapping: row_number over the window-id ordered by arrival
(ascending for first, descending for last) + filter — the distributed
top-K-per-group idiom (no global sort, no collect).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..windows import WINDOW_COL


def keep(
    df: DataFrame,
    order_by: str | Column,
    first: Optional[int] = None,
    last: Optional[int] = None,
    window_col: Optional[str] = WINDOW_COL,
) -> DataFrame:
    if (first is None) == (last is None):
        raise ValueError("keep: exactly one of first/last is required")
    k = first if first is not None else last
    if k is None or k < 0:
        raise ValueError("keep: count must be >= 0")
    order = F.col(order_by) if isinstance(order_by, str) else order_by
    order = order.asc() if first is not None else order.desc()
    part = (
        Window.partitionBy(window_col)
        if window_col is not None and window_col in df.columns
        else Window.partitionBy()
    )
    w = part.orderBy(order)
    return (
        df.withColumn("_keep_rn", F.row_number().over(w))
        .filter(F.col("_keep_rn") <= k)
        .drop("_keep_rn")
    )
