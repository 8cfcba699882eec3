"""matdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ejrh/matdb, rebuilt Spark-first.

The reference (/root/reference, Rust) is an embedded, transactional,
chunked, dense multi-dimensional integer store whose single query
operator is an ordered, version-resolving full scan. This package
re-creates that data model and its transaction/visibility semantics on
top of Parquet + Spark DataFrames (see SURVEY.md §1.7 for the concept
mapping), then exposes the full Spark analytics surface on the snapshot
relation, plus large-scale training-data-pipeline operators
(deduplication, similarity search, text analysis, multimodal columns).

Nothing here is a translation of the reference's execution engine:
storage is Parquet with Hive-style partition directories (chunk
routing == partition pruning), visibility is a manifest-commit
protocol (rename-commit == manifest PUT), and the ordered
version-resolving scan is a Catalyst plan (union → window dedup →
order), not a k-way merge loop.
"""

from matdb_spark.schema import Dimension, Value, Schema
from matdb_spark.database import Database
from matdb_spark.transaction import Transaction
from matdb_spark.session import get_spark
from matdb_spark.catalog import register_store, register_warehouse

__all__ = [
    "Dimension",
    "Value",
    "Schema",
    "Database",
    "Transaction",
    "get_spark",
    "register_store",
    "register_warehouse",
]

__version__ = "0.1.0"
