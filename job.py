"""spark-submit entry point for the extraction pipeline.

    spark-submit --py-files engine.zip job.py \
        --input  <transcripts dir/parquet path, or with --table a catalog
                  identifier, e.g. iceberg_cat.db.transcripts> \
        --output <output dir> \
        [--table] [--buckets 512] [--partitions 0=auto] [--run-id run1]

--input is a filesystem path read as parquet; pass --table to read it as a
catalog identifier via spark.read.table — the way an Iceberg table is
consumed (BASELINE input_hint); Iceberg needs the runtime jar + catalog
conf on the submitting cluster, e.g.
--conf spark.sql.catalog.iceberg_cat=org.apache.iceberg.spark.SparkCatalog.
The flag is explicit (not inferred from name shape) so a typo'd or
remote-only path like 'data.parquet' fails as a path error instead of a
confusing catalog lookup. Either source reaches the same plan:
hidden-partition/file pruning and column projection push into the scan
(docs/PLANS.md §2).

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


def read_input(spark, source: str, table: bool = False):
    """``table=True`` → catalog identifier via spark.read.table (how
    Iceberg/HMS tables are read); otherwise a filesystem path read as
    parquet. Explicit, never inferred: a dotted *path* (data.parquet,
    events.snappy.pq) must fail as a path error, not become a surprise
    catalog lookup."""
    return spark.read.table(source) if table else spark.read.parquet(source)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--table", action="store_true",
                    help="read --input as a catalog table identifier "
                         "(Iceberg/HMS) instead of a parquet path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--buckets", type=int, default=512)
    ap.add_argument("--partitions", type=int, default=0)
    ap.add_argument("--run-id", default=f"run-{int(time.time())}")
    ap.add_argument("--ocr-provider", default=None,
                    help="image-provider registry name (context.py), e.g. "
                         "'stub'; default: images stay bare placeholders")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from bella_domify_spark.engine.manifest import run_resumable

    spark = SparkSession.builder.appName("bella-domify-extract").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    df = read_input(spark, args.input, table=args.table)
    t0 = time.monotonic()
    summary = run_resumable(df, args.output, n_buckets=args.buckets,
                            partitions=args.partitions or None,
                            run_id=args.run_id,
                            ocr_provider=args.ocr_provider)
    wall = time.monotonic() - t0
    summary["wall_sec"] = round(wall, 2)
    summary["turns_per_sec"] = round(summary["rows"] / wall, 1) if wall > 0 else None
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
