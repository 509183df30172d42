"""LLM-data-pipeline extensions (beyond the reference's surface).

Operators a large-scale training-data pipeline needs, built
shuffle-aware for the 100 TB regime: text analysis, exact and
near-duplicate detection, embedding similarity search, and multimodal
column plumbing.  All hot paths are JVM-side Column expressions
(split/filter/transform/aggregate higher-order functions, xxhash64);
Python appears only in clearly-marked stubs.
"""

from . import (
    dedup,
    graph,
    multimodal,
    quality_rules,
    sampling,
    similarity,
    sketches,
    text,
)

__all__ = [
    "dedup",
    "graph",
    "multimodal",
    "quality_rules",
    "sampling",
    "similarity",
    "sketches",
    "text",
]
