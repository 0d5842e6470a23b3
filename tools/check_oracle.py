"""Local simulation of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at the given sf dir,
compare row count + order-insensitive value hash (columns sorted by name).

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df):
    """Sort columns by name, stringify EXACTLY (no float rounding), sort rows.

    The driver's correctness gate hashes raw stringified values, so a DuckDB
    HUGEINT that pandas renders as float ('32.0') must NOT be rounded into
    agreement with Spark's bigint ('32') — local PASS must imply driver PASS.
    Set SPARK_GRAFT_ORACLE_LOOSE=1 to restore the old %.6g rounding for
    debugging numeric-noise-only diffs.
    """
    import pandas as pd

    loose = os.environ.get("SPARK_GRAFT_ORACLE_LOOSE") == "1"
    df = df[sorted(df.columns)]
    def cell(v):
        if isinstance(v, float):
            return f"{v:.6g}" if loose else str(v)
        if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    rows = sorted(tuple(cell(v) for v in row) for row in df.itertuples(index=False))
    return rows


def value_hash(rows) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from bella_domify_spark.engine.session import build_session

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = build_session(app_name="oracle-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle — rows-only)")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error {str(e)[:200]}")
            n_fail += 1
            continue
        srows, orows = normalize(sdf), normalize(odf)
        if len(srows) != len(orows):
            print(f"FAIL  {name}: row count spark={len(srows)} duckdb={len(orows)}")
            n_fail += 1
        elif value_hash(srows) != value_hash(orows):
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL  {name}: value hash mismatch ({len(srows)} rows)")
            for a, b in diff:
                print(f"      spark : {a}")
                print(f"      duckdb: {b}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(srows)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
