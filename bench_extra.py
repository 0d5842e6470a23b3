"""Per-query optimization harness (guide §1.4): times individual declared
queries with the noop sink, best-of-N, and optionally dumps
``.explain("formatted")`` to a file — so a single query can be iterated on
without the full frozen ``bench.py`` suite.

Usage:
    python bench_extra.py q1 q2 ...          # time queries, best of N
    BENCH_EXTRA_RUNS=4 python bench_extra.py kcore_peel
    BENCH_EXTRA_PLANS=plans/r07 BENCH_EXTRA_TAG=before \
        python bench_extra.py kcore_peel     # also write <q>_before.txt

Env (same contract as bench.py): SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
Prints one JSON line {"queries": {name: best_sec}, "attempts": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("BENCH_EXTRA_RUNS", "3"))
    plans_dir = os.environ.get("BENCH_EXTRA_PLANS", "")
    tag = os.environ.get("BENCH_EXTRA_TAG", "plan")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from bella_domify_spark.engine.session import build_session

    spark = build_session(app_name="bella-domify-bench-extra", cores=cpus,
                          shuffle_partitions=max(cpus, 8))
    qs = entrymod.queries()
    names = sys.argv[1:] or []
    timings: dict[str, float] = {}
    attempts: dict[str, list] = {}
    for name in names:
        fn = qs[name]
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        raw = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            raw.append(round(time.monotonic() - t0, 3))
        timings[name] = min(raw)
        attempts[name] = raw
    print(json.dumps({"queries": timings, "attempts": attempts,
                      "sf_dir": sf_dir, "cpus": cpus}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
