"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin
on DuckDB over the same parquet tables, then compares row count,
column names, and values (rows sorted, columns sorted by name). Exact
comparison for non-floats; floats report max abs diff and fail beyond
1e-9 — stricter than any plausible driver hash, so a pass here should
mean a pass there.

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [--sf sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from matdb_spark.session import get_spark
from matdb_spark.sources.tables import TABLES


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    return v


def compare(name, sdf, con, sql):
    t0 = time.time()
    spark_pd = sdf.toPandas()
    t_spark = time.time() - t0
    t0 = time.time()
    duck_pd = con.execute(sql).fetchdf()
    t_duck = time.time() - t0

    issues = []
    if len(spark_pd) != len(duck_pd):
        issues.append(f"rowcount spark={len(spark_pd)} duck={len(duck_pd)}")
    scols, dcols = sorted(spark_pd.columns), sorted(duck_pd.columns)
    if scols != dcols:
        issues.append(f"columns spark={scols} duck={dcols}")
    max_float_diff = 0.0
    if not issues:
        s = spark_pd[scols]
        d = duck_pd[dcols]
        skey = s.apply(lambda r: tuple(str(norm_cell(x)) for x in r), axis=1)
        dkey = d.apply(lambda r: tuple(str(norm_cell(x)) for x in r), axis=1)
        s = s.iloc[skey.argsort().values].reset_index(drop=True) if len(s) else s
        d = d.iloc[dkey.argsort().values].reset_index(drop=True) if len(d) else d
        n_bad = 0
        first_bad = None
        for col in scols:
            sv, dv = s[col].tolist(), d[col].tolist()
            for i, (a, b) in enumerate(zip(sv, dv)):
                a, b = norm_cell(a), norm_cell(b)
                if a is None and b is None:
                    continue
                if isinstance(a, float) and isinstance(b, float):
                    diff = abs(a - b)
                    rel = diff / max(abs(a), abs(b), 1e-300)
                    max_float_diff = max(max_float_diff, rel)
                    if rel > 1e-9:
                        n_bad += 1
                        first_bad = first_bad or (col, i, a, b)
                else:
                    if str(a) != str(b):
                        n_bad += 1
                        first_bad = first_bad or (col, i, a, b)
        if n_bad:
            issues.append(f"{n_bad} cell mismatches, first={first_bad}")
    status = "OK " if not issues else "FAIL"
    extra = f" maxrel={max_float_diff:.2e}" if max_float_diff else ""
    print(
        f"{status} {name:28s} rows={len(spark_pd):6d} spark={t_spark:5.1f}s duck={t_duck:5.1f}s{extra} "
        + ("; ".join(issues) if issues else "")
    )
    return not issues


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default="sf0.01",
        help="scale-factor tag under /root/testdata, or a directory "
        "path holding <table>.parquet files/dirs (e.g. the derived "
        ".scratch/sf1.0 set)",
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    sf_dir = args.sf if os.path.isdir(args.sf) else f"/root/testdata/{args.sf}"

    spark = get_spark(app_name="check_oracle", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    con = duckdb.connect()
    # big oracles (derived sf1.0) spill; DuckDB's default temp dir is
    # the SHARED cwd-relative .tmp/, where two concurrent check_oracle
    # processes delete each other's spill files and abort the process
    # (unhandled duckdb::IOException -> terminate). Give each process
    # its own spill dir.
    tmpdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch",
        f"duckdb_tmp_{os.getpid()}",
    )
    os.makedirs(tmpdir, exist_ok=True)
    con.execute(f"SET temp_directory='{tmpdir}'")
    import atexit
    import shutil

    atexit.register(shutil.rmtree, tmpdir, True)
    present = []
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(p):
            continue  # partial table set (derived sf1.0 holds 3 tables)
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
        present.append(t)
    if len(present) < len(TABLES):
        print(f"NOTE partial table set at {sf_dir}: {present}")

    qs = entrymod.queries()
    names = args.queries or list(qs)
    ok = bad = no_oracle = 0
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: unknown")
            continue
        try:
            # gate call FIRST (gates build their .scratch fixtures
            # eagerly, before returning the lazy plan), then fetch the
            # oracle fresh — fixture-derived oracles (q_ann_recall_opq
            # inlines the persisted rotation sidecar) must see the
            # built fixture, not the state at import time
            sdf = qs[name](spark, sf_dir)
            sql = entrymod.oracle_sql().get(name)
            if sql is None:
                print(
                    f"NOOR {name:28s} rows={sdf.count():6d} "
                    "(no oracle; rows-only check)"
                )
                no_oracle += 1
                continue
            if compare(name, sdf, con, sql):
                ok += 1
            else:
                bad += 1
        except Exception as e:
            bad += 1
            msg = str(e).replace("\n", " ")[:300]
            print(f"FAIL {name:28s} exception: {type(e).__name__}: {msg}")
    print(f"\n{ok} ok, {bad} fail, {no_oracle} rows-only, of {len(names)}")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
