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
REGISTRATION time — register_store resolves the store's out-of-order-
safe commit watermark (``manifest.safe_feed_head``: the highest txn id
below every outstanding reservation) on the driver and bakes it into
the reader as ``as_of``, so later commits — including a LOWER-id txn
reserved before registration but published after — are never visible
through the view no matter when its first query runs. (Without the explicit pin, the
Python DSv2 reader's plan point is its first EXECUTION — measured:
a view queried before a commit stays stale, one first queried after
sees it — which is exactly the nondeterminism a catalog must not
have.) This is snapshot isolation, the same pinning a long-running
``Transaction`` gets; call ``refresh_store`` to advance, or pass
``as_of`` for an explicit historical horizon.
"""

from __future__ import annotations

import os
import re
import warnings

from matdb_spark.database import SCHEMA_FILENAME

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _view_name(raw: str, taken: set[str]) -> str:
    """Derive a valid SQL identifier from a directory name: replace
    every invalid character with ``_`` and prefix ``_`` if the first
    character is a digit (``my-store`` → ``my_store``, ``1data`` →
    ``_1data``). Collisions after sanitizing get a numeric suffix, so
    one oddly-named directory can never abort (or shadow) the rest of
    warehouse discovery."""
    name = raw if _IDENT_RE.match(raw) else re.sub(r"[^A-Za-z0-9_]", "_", raw)
    if name and name[0].isdigit():
        name = "_" + name
    if not name:
        name = "_store"
    base, n = name, 2
    while name in taken:
        name = f"{base}_{n}"
        n += 1
    return name


def register_store(spark, name: str, path: str, as_of: int | None = None):
    """Register one store as a temp view ``name``; returns the view's
    DataFrame. Idempotent (re-registering replaces the view and
    re-pins the snapshot)."""
    from matdb_spark import manifest
    from matdb_spark.sources.dsv2 import register_matdb_source

    register_matdb_source(spark)
    if as_of is None:
        # Pin at the out-of-order-safe watermark, NOT max(committed):
        # txn ids are reserved before publish, so under concurrent
        # writers a LOWER-id txn can commit after registration. A pin
        # at max(committed) would let that late manifest slip under the
        # horizon and surface through the "pinned" view. safe_feed_head
        # = min(outstanding reservations) - 1 (capped at the committed
        # head) — the same low-watermark rule the change feed uses — so
        # every txn at-or-below the pin is either committed now or can
        # never commit (its reservation is gone).
        as_of = manifest.safe_feed_head(path)
        # A reservation leaked by a crashed writer pins safe_feed_head
        # in the past silently — fully committed newer txns would stay
        # invisible until recover() sweeps it. Make that diagnosable at
        # registration time (r7 advice, low).
        committed = manifest.committed_txn_ids(path)
        head = committed[-1] if committed else 0
        if as_of < head:
            stalled = [
                t for t in manifest.outstanding_txn_ids(path) if t <= head
            ]
            warnings.warn(
                f"store {path!r}: view pinned at safe_feed_head {as_of} "
                f"behind committed head {head} — outstanding txn "
                f"reservation(s) {stalled} hold the watermark back "
                f"(a crashed writer's leak is swept by Database.recover/"
                f"open after the staleness grace; pass as_of={head} to "
                f"pin at the committed head regardless)",
                stacklevel=2,
            )
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
    ``prefix + <dirname>`` (sanitized to a valid SQL identifier — see
    ``_view_name``; a directory like ``my-store`` registers as
    ``my_store`` instead of aborting discovery partway). Returns
    {view_name: store_path}. The listing is driver-side and one level
    deep — a warehouse layout, not a recursive crawl."""
    out: dict[str, str] = {}
    for entry in sorted(os.listdir(root)):
        p = os.path.join(root, entry)
        if os.path.isdir(p) and os.path.isfile(
            os.path.join(p, SCHEMA_FILENAME)
        ):
            name = _view_name(prefix + entry, set(out))
            register_store(spark, name, p)
            out[name] = p
    return out
