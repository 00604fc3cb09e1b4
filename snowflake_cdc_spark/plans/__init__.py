"""Control-plane: pipeline specifications (the reference's template-JSON IR
replaced by plain dataclasses, SURVEY.md §3)."""

from snowflake_cdc_spark.plans.spec import DeleteStrategy, PipelineSpec, StartPosition

__all__ = ["PipelineSpec", "DeleteStrategy", "StartPosition"]
