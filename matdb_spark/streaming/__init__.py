"""Structured Streaming surface of matdb_spark.

The reference is purely batch (SURVEY §2.2: no streaming anywhere in
ejrh/matdb); this package is the scale extension for continuous
ingest and event-time analytics, built entirely on Structured
Streaming primitives:

- ``sources.events_stream``: file-source readStream with the same
  schema/timestamp normalization as the batch loader.
- ``windows``: tumbling / sliding / session-window aggregations that
  accept EITHER a batch or a streaming DataFrame (one code path; the
  streaming variant adds a watermark for state eviction).
- ``ingest.stream_into_database``: micro-batch ingest into the MVCC
  store — each micro-batch commits as one transaction, so concurrent
  snapshot readers always see batch-aligned consistent state.
- ``stateful.sessionize_with_state``: applyInPandasWithState custom
  stateful operator (per-key session accumulation with timeout).
- ``joins.interval_join``: stream-stream event-time interval join
  (watermark-bounded state), batch-compatible.
- ``admission.stream_admission``: dedup-at-the-door for an arriving
  corpus — each micro-batch is admitted against the persisted MinHash
  index and optionally committed into the MVCC store exactly-once.
- ``vectors.stream_ivf_append``: continuous embedding ingest into a
  persisted IVF index (broadcast assignment + partitioned append per
  micro-batch), with ``compact_stream_ivf_index`` as the maintenance
  pass that reclaims crash-replay debris.
- ``vectors.stream_lsh_append``: the same lifecycle for the
  multi-table LSH index (stored-hash-family bucketing per batch),
  with ``compact_stream_lsh_index`` maintenance.
"""

from matdb_spark.streaming.sources import events_stream
from matdb_spark.streaming.windows import session_agg, sliding_agg, tumbling_agg
from matdb_spark.streaming.ingest import stream_into_database
from matdb_spark.streaming.stateful import running_totals_with_state, sessionize_with_state
from matdb_spark.streaming.admission import stream_admission
from matdb_spark.streaming.joins import interval_join
from matdb_spark.streaming.vectors import (
    compact_stream_ivf_index,
    compact_stream_lsh_index,
    stream_ivf_append,
    stream_lsh_append,
)

__all__ = [
    "events_stream",
    "tumbling_agg",
    "sliding_agg",
    "session_agg",
    "stream_into_database",
    "running_totals_with_state",
    "sessionize_with_state",
    "interval_join",
    "stream_ivf_append",
    "compact_stream_ivf_index",
    "stream_lsh_append",
    "compact_stream_lsh_index",
    "stream_admission",
]
