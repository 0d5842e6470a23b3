"""spark-submit entry point for the extraction pipeline.

    spark-submit --py-files engine.zip job.py \
        --input  <transcripts dir/parquet OR catalog table, e.g.
                  iceberg_cat.db.transcripts> \
        --output <output dir> \
        [--buckets 512] [--partitions 0=auto] [--run-id run1]

--input is a filesystem path (read as parquet) unless it looks like a
dotted catalog table name, which is read via spark.read.table — the way an
Iceberg table is consumed (BASELINE input_hint); Iceberg needs the runtime
jar + catalog conf on the submitting cluster, e.g.
--conf spark.sql.catalog.iceberg_cat=org.apache.iceberg.spark.SparkCatalog.
Either source reaches the same plan: hidden-partition/file pruning and
column projection push into the scan (docs/PLANS.md §2).

Build engine.zip with:  python tools/make_pyfiles.py

The job is resumable: re-running with the same --output skips buckets whose
manifests exist (see bella_domify_spark/engine/manifest.py). Per-bucket
lineage + metrics land in <output>/_manifests/.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def read_input(spark, source: str):
    """Path → parquet scan; dotted catalog identifier → spark.read.table,
    which is how Iceberg/HMS tables are read. Only a strict
    ``ident.ident[.ident]`` form that does not exist on the local
    filesystem routes to the catalog, so file names with dots
    (events.snappy.pq, data.v2/) keep the parquet path."""
    import os
    import re

    looks_like_table = (re.fullmatch(
        r"[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*){1,2}", source)
        and not os.path.exists(source))
    return (spark.read.table(source) if looks_like_table
            else spark.read.parquet(source))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=512)
    ap.add_argument("--partitions", type=int, default=0)
    ap.add_argument("--run-id", default=f"run-{int(time.time())}")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from bella_domify_spark.engine.manifest import run_resumable

    spark = SparkSession.builder.appName("bella-domify-extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    df = read_input(spark, args.input)
    t0 = time.monotonic()
    summary = run_resumable(df, args.output, n_buckets=args.buckets,
                            partitions=args.partitions or None,
                            run_id=args.run_id)
    wall = time.monotonic() - t0
    summary["wall_sec"] = round(wall, 2)
    summary["turns_per_sec"] = round(summary["rows"] / wall, 1) if wall > 0 else None
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
