from matdb_spark.operators.asof import asof_join
from matdb_spark.operators.rangejoin import range_join
from matdb_spark.operators.topk import top_k_per_group
from matdb_spark.operators.sessionize import sessionize
from matdb_spark.operators import (
    bpe,
    dedup,
    index_maint,
    multimodal,
    selection,
    similarity,
)

__all__ = [
    "asof_join",
    "range_join",
    "top_k_per_group",
    "sessionize",
    "bpe",
    "dedup",
    "index_maint",
    "multimodal",
    "selection",
    "similarity",
]
