"""YAML pipeline front-end + DataFrame compiler.

``template.make_pipeline_template`` validates a parsed YAML document
exactly like the reference's makePipelineTemplate (src/api.ts:246-306):
schema shape, per-step invariants, pattern validity, window bounds, and
DAG soundness.  ``compiler.compile_pipeline`` then lowers the template
onto a DataFrame DAG — each step a ``DataFrame -> DataFrame`` function,
fan-in by unionByName, pattern routing by filter, windows from
cdp_spark.windows — and Catalyst takes it from there.
"""

from .template import PipelineTemplate, StepDef, from_yaml, make_pipeline_template
from .compiler import compile_pipeline, PipelineResult

__all__ = [
    "PipelineTemplate",
    "StepDef",
    "from_yaml",
    "make_pipeline_template",
    "compile_pipeline",
    "PipelineResult",
]
