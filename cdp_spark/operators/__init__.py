"""Step functions: per-vector transforms over event DataFrames.

Each operator is a function ``DataFrame -> DataFrame`` over the event
schema (n, d, t [, window/order columns]) — the Spark analog of the
reference's ``Channel<Event[], Event>`` step functions
(src/step-functions/).
"""

from .rename import rename, validate_rename
from .deduplicate import deduplicate
from .keep import keep
from .keep_when import keep_when

__all__ = ["rename", "validate_rename", "deduplicate", "keep", "keep_when"]
