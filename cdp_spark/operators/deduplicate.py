"""deduplicate — drop duplicate events within each window vector
(src/step-functions/deduplicate.ts:82-124).

Key is any subset of {name, data, trace} (defaults: name+data,
src/step-functions/deduplicate.ts:92-119); the FIRST occurrence in
arrival order survives.  The all-false configuration keys every event
identically, so only the first event of each vector survives.

Spark mapping: a row_number over (window-id, key columns) ordered by
arrival — one shuffle on (window, key), map-side combinable by AQE.
We key on the canonical JSON of the payload rather than the
reference's SHA-1-of-JSON (same equivalence classes; hashing is an
implementation detail of the single-node engine).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..windows import WINDOW_COL


def deduplicate(
    df: DataFrame,
    order_by: str | Column,
    consider_name: bool = True,
    consider_data: bool = True,
    consider_trace: bool = False,
    window_col: Optional[str] = WINDOW_COL,
) -> DataFrame:
    keys: list[Column] = []
    if window_col is not None and window_col in df.columns:
        keys.append(F.col(window_col))
    if consider_name:
        keys.append(F.col("n"))
    if consider_data:
        # Canonical form: parse+reserialize so textually-different but
        # equal JSON payloads compare equal; SQL NULL (absent) stays
        # distinct from JSON null via a marker.
        keys.append(F.coalesce(F.to_json(F.try_parse_json(F.col("d"))), F.lit("\x00absent")))
    if consider_trace:
        keys.append(F.coalesce(F.to_json(F.col("t")), F.lit("\x00absent")))
    if not keys or (window_col is not None and len(keys) == 1 and window_col in df.columns):
        # all-false: constant key — keep only the first event per vector
        # (src/step-functions/deduplicate.ts:105 'constant key').
        keys.append(F.lit(1))
    w = Window.partitionBy(*keys).orderBy(order_by)
    return (
        df.withColumn("_dedup_rn", F.row_number().over(w))
        .filter(F.col("_dedup_rn") == 1)
        .drop("_dedup_rn")
    )
