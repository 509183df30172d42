"""rename — rewrite event names (src/step-functions/rename.ts:89-107).

Either replace the whole name, or attach prepend/append affixes by
plain string concatenation (affixes may extend a word or add new
dot-separated words; validation at src/step-functions/rename.ts:50-80).
Compiles to a single JVM-side concat — no shuffle, no UDF.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..patterns import is_valid_event_name


def validate_rename(
    replace: Optional[str] = None,
    prepend: Optional[str] = None,
    append: Optional[str] = None,
) -> None:
    if replace is not None:
        if prepend is not None or append is not None:
            raise ValueError("rename: replace is exclusive with prepend/append")
        if not is_valid_event_name(replace):
            raise ValueError("rename.replace must be a proper event name")
        return
    if append is not None and not (
        (append.startswith(".") and is_valid_event_name(append[1:]))
        or is_valid_event_name(append)
    ):
        raise ValueError("rename.append must be a proper event name suffix")
    if prepend is not None and not (
        (prepend.endswith(".") and is_valid_event_name(prepend[:-1]))
        or is_valid_event_name(prepend)
    ):
        raise ValueError("rename.prepend must be a proper event name prefix")


def rename(
    df: DataFrame,
    replace: Optional[str] = None,
    prepend: Optional[str] = None,
    append: Optional[str] = None,
    name_col: str = "n",
) -> DataFrame:
    validate_rename(replace, prepend, append)
    if replace is not None:
        return df.withColumn(name_col, F.lit(replace))
    new_name = F.concat(F.lit(prepend or ""), F.col(name_col), F.lit(append or ""))
    return df.withColumn(name_col, new_name)
