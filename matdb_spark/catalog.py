"""Session-catalog integration: reach matdb stores by NAME from
``spark.sql``.

Spark 4.1's Python Data Source API does not forward table
OPTIONS/LOCATION to the reader (probed — sources/dsv2.py), so a real
``CREATE TABLE ... USING matdb`` cannot carry the store path yet.
Until that lands JVM-side, this module provides the pragmatic
equivalent: register each store as a session view over the
``matdb`` format, so every downstream consumer writes plain SQL
against a name, exactly as they would against a catalog table.

The view's plan goes through the DSv2 reader, so queries against it
keep the format's properties: pushed-filter chunk pruning, as_of time
travel, zero-shuffle chunk-local newest-wins resolution.

Freshness contract: a view PINS the snapshot committed at
REGISTRATION time — register_store resolves the store's newest
committed txn id on the driver and bakes it into the reader as
``as_of``, so later commits are never visible through the view no
matter when its first query runs. (Without the explicit pin, the
Python DSv2 reader's plan point is its first EXECUTION — measured:
a view queried before a commit stays stale, one first queried after
sees it — which is exactly the nondeterminism a catalog must not
have.) This is snapshot isolation, the same pinning a long-running
``Transaction`` gets; call ``refresh_store`` to advance, or pass
``as_of`` for an explicit historical horizon.
"""

from __future__ import annotations

import os

from matdb_spark.database import SCHEMA_FILENAME


def register_store(spark, name: str, path: str, as_of: int | None = None):
    """Register one store as a temp view ``name``; returns the view's
    DataFrame. Idempotent (re-registering replaces the view and
    re-pins the snapshot)."""
    from matdb_spark import manifest
    from matdb_spark.sources.dsv2 import register_matdb_source

    register_matdb_source(spark)
    if as_of is None:
        committed = manifest.committed_txn_ids(path)
        as_of = max(committed) if committed else 0
    df = (
        spark.read.format("matdb")
        .option("as_of", str(as_of))
        .load(path)
    )
    df.createOrReplaceTempView(name)
    return df


def refresh_store(spark, name: str, path: str, as_of: int | None = None):
    """Advance a registered view to the store's newest commit (or to
    ``as_of``). Alias of register_store — the re-plan IS the refresh;
    named separately so call sites read as intent."""
    return register_store(spark, name, path, as_of)


def register_warehouse(
    spark, root: str, prefix: str = ""
) -> dict[str, str]:
    """Discover every matdb store directly under ``root`` (a directory
    holding ``schema.json``) and register each as a view named
    ``prefix + <dirname>``. Returns {view_name: store_path}. The
    listing is driver-side and one level deep — a warehouse layout,
    not a recursive crawl."""
    out: dict[str, str] = {}
    for entry in sorted(os.listdir(root)):
        p = os.path.join(root, entry)
        if os.path.isdir(p) and os.path.isfile(
            os.path.join(p, SCHEMA_FILENAME)
        ):
            name = prefix + entry
            register_store(spark, name, p)
            out[name] = p
    return out
