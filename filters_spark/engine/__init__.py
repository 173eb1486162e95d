"""CDC engine: batch merge-apply loop with exactly-once semantics."""

from filters_spark.engine.cdc import CDCEngine  # noqa: F401
from filters_spark.engine.evolution import SpecRegistry, VersionSpec  # noqa: F401
from filters_spark.engine.fanout import (  # noqa: F401
    TableRoute,
    consistent_cut,
    fan_out_debezium,
    feed_positions,
    start_fanout_stream,
)
from filters_spark.engine.txn import (  # noqa: F401
    fan_out_atomic,
    pending_txns,
    recover_fanout,
)
