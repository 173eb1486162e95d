"""Physical-plan audit helpers."""

from filters_spark.plans.audit import (  # noqa: F401
    executed_plan,
    has_python_eval,
    pushed_filters,
    scan_columns,
    wholestage_codegen_ids,
)
