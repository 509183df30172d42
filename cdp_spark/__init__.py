"""cdp_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kklingenberg/cdp ("Composable Data
Pipelines"), re-expressed Spark-first.

The reference (/root/reference, ~7.3k LoC TypeScript) is a single-node
streaming event-pipeline executor: YAML pipeline -> DAG of steps over
JSON event streams.  This package compiles the same pipeline model onto
Spark DataFrames (batch) and Structured Streaming (unbounded), letting
Catalyst/Tungsten own optimization and execution, and extends the
surface with the relational operators and LLM-data-pipeline operators
(dedup, similarity search, text analysis) the reference lacks.

Layout:
- patterns    — event-name pattern algebra -> Column predicates
- events      — event envelope schema, NDJSON IO, trace stamping
- windows     — count/time windowing (reduce/flatmap) in batch
- operators/  — step functions (rename, deduplicate, keep, keep-when, ...)
- pipeline/   — YAML front-end + DataFrame compiler
- streaming/  — Structured Streaming mode (count-or-time state, sinks)
- datapipe/   — LLM-data-pipeline extensions (dedup, ANN, text stats)
"""

__version__ = "0.1.0"
