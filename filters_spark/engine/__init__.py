"""CDC engine: batch merge-apply loop with exactly-once semantics."""

from filters_spark.engine.cdc import CDCEngine  # noqa: F401
from filters_spark.engine.evolution import SpecRegistry, VersionSpec  # noqa: F401
from filters_spark.engine.fanout import (  # noqa: F401
    TableRoute,
    fan_out_debezium,
    start_fanout_stream,
)
