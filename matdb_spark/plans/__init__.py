"""Physical-plan inspection helpers.

The 100 TB design discipline in this repo is enforced by tests, not
hope: these helpers let a test assert that a query's physical plan has
the shape we designed for — broadcasts where we expect them, filters
pushed into the parquet scan, partition pruning engaged, no stray
shuffles (see tests/test_plans.py).
"""

from matdb_spark.plans.inspect import (
    broadcast_join_count,
    exchange_count,
    partition_filters,
    physical_plan,
    pushed_filters,
    scan_counts,
)

__all__ = [
    "physical_plan",
    "exchange_count",
    "broadcast_join_count",
    "pushed_filters",
    "partition_filters",
    "scan_counts",
]
