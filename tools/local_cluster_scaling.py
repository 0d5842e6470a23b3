"""Multi-JVM scaling experiment (VERDICT r5 task 3): does the 8→32
efficiency shortfall disappear when the 32 cores are split across FOUR
executor JVMs (the shape a real cluster runs) instead of one?

The round-5 stage attribution (BENCH/stage_attrib_8_32.json) exonerated
shuffle (3% of wall) and sink, and measured 8-core Spark compute at 100%
of the taskset-pinned pure-Python ceiling — leaving "ONE JVM serializing
Arrow batches + GC for 32 concurrent Python workers" as the inferred
bottleneck. This script tests that inference directly with Spark's
standalone local-cluster mode (real Worker+Executor JVMs, no cluster
needed):

    lo = local-cluster[1,8,<mem>]  — one executor JVM, 8 cores
    hi = local-cluster[W,8,<mem>]  — W executor JVMs × 8 cores

Same job as bench_scaling.py (`run_resumable`: salted bucket shuffle →
Arrow parse → checkpointed sink), same corpus, fresh JVMs per level,
whole process tree taskset-pinned to exactly the level's cores, full
warmup run, best-of-N. Prints one JSON line and appends to
BENCH/BASELINE.md.

Env: SCALING_CONVS (default 5000 ≈ the 789k-turn corpus),
     SCALING_RUNS (default 3), SCALING_WORKERS (default 4),
     SCALING_EXEC_MEM_MB (default 8192).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {root!r})
from pyspark.sql import SparkSession
from bella_domify_spark.engine.manifest import run_resumable

workers = int(sys.argv[1]); corpus = sys.argv[2]; runs = int(sys.argv[3])
mem_mb = int(sys.argv[4])
cores = workers * 8
N_BUCKETS = 256
spark = (
    SparkSession.builder
    .master(f"local-cluster[{{workers}},8,{{mem_mb}}]")
    .appName(f"lc-scaling-{{workers}}x8")
    .config("spark.sql.shuffle.partitions", str(max(cores * 2, 16)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
    .config("spark.sql.files.maxPartitionBytes", "32m")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    .config("spark.executor.memory", f"{{mem_mb - 1024}}m")
    # executor JVMs fork the Python workers — they need the repo on path
    .config("spark.executorEnv.PYTHONPATH", {root!r})
    .getOrCreate())
spark.sparkContext.setLogLevel("WARN")
df = spark.read.parquet(f"{{corpus}}/transcripts.parquet")
n = df.count()

def one_run(run):
    sink_dir = f"/tmp/bds_lc_scaling_{{os.getpid()}}_{{run}}"
    shutil.rmtree(sink_dir, ignore_errors=True)
    t0 = time.monotonic()
    run_resumable(df, sink_dir, n_buckets=N_BUCKETS, partitions=cores * 2)
    wall = time.monotonic() - t0
    shutil.rmtree(sink_dir, ignore_errors=True)
    return wall

one_run("warm")
out = []
for run in range(runs):
    wall = one_run(run)
    out.append({{"wall_sec": round(wall, 3),
                 "turns_per_sec": round(n / wall, 1)}})
print("RESULT " + json.dumps({{"workers": workers, "cores": cores,
                               "n_turns": n, "runs": out}}))
spark.stop()
"""


def run_level(workers: int, corpus: str, runs: int, mem_mb: int) -> dict:
    code = RUNNER.format(root=ROOT)
    cores = workers * 8
    cmd = ["taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", code,
           str(workers), corpus, str(runs), str(mem_mb)]
    env = dict(os.environ, PYTHONPATH=ROOT)
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3000,
                          env=env)
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from workers={workers}:\n"
                       f"{proc.stdout[-3000:]}\n{proc.stderr[-3000:]}")


def main() -> int:
    n_convs = int(os.environ.get("SCALING_CONVS", "5000"))
    runs = int(os.environ.get("SCALING_RUNS", "3"))
    hi_workers = int(os.environ.get("SCALING_WORKERS", "4"))
    mem_mb = int(os.environ.get("SCALING_EXEC_MEM_MB", "8192"))
    sys.path.insert(0, ROOT)
    from fixtures.gen_corpus import GEN_VERSION
    corpus = f"/tmp/bds_scaling_corpus_v{GEN_VERSION}_c{n_convs}"
    if not os.path.exists(f"{corpus}/transcripts.parquet"):
        from fixtures.gen_corpus import gen_transcripts_parallel
        os.makedirs(f"{corpus}/transcripts.parquet", exist_ok=True)
        df = gen_transcripts_parallel(n_convs)
        df["ts"] = df["ts"].astype("datetime64[us]")
        chunk = max(len(df) // 16, 1)
        for i in range(0, 16):
            part = df.iloc[i * chunk: (i + 1) * chunk
                           if i < 15 else len(df)]
            if len(part):
                part.to_parquet(
                    f"{corpus}/transcripts.parquet/part-{i:03d}.parquet",
                    index=False)

    def probe():
        # pure-Python same-work ceiling reading (host-state evidence)
        cmd = [sys.executable, "tools/ceiling_probe.py", corpus, "8,8", "1"]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=1200, cwd=ROOT).stdout.strip()
        try:
            return json.loads(out.splitlines()[-1])[
                "pure_python_best_turns_per_sec"]["8"]
        except Exception:
            return None

    probe_before = probe()
    levels = {}
    for w in (1, hi_workers):
        levels[w] = run_level(w, corpus, runs, mem_mb)
    probe_after = probe()

    best = {w: max(r["turns_per_sec"] for r in levels[w]["runs"])
            for w in levels}
    med = {w: statistics.median(r["turns_per_sec"] for r in levels[w]["runs"])
           for w in levels}
    eff = (best[hi_workers] / best[1]) / hi_workers
    n_turns = levels[1]["n_turns"]

    result = {
        "metric": f"local_cluster_scaling_8_to_{hi_workers * 8}",
        "value": round(eff, 3),
        "unit": "ratio",
        "best_turns_per_sec": {f"{w}x8": best[w] for w in best},
        "median_turns_per_sec": {f"{w}x8": med[w] for w in med},
        "n_turns": n_turns,
        "runs_per_level": runs,
        "exec_mem_mb": mem_mb,
        "probe_8core_turns_per_sec": {"before": probe_before,
                                      "after": probe_after},
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    print(json.dumps(result))

    lines = [
        f"## Multi-JVM 8→{hi_workers * 8}: local-cluster[1,8] vs "
        f"local-cluster[{hi_workers},8] (r5 attribution test)",
        "",
        "Tests the round-5 inference that the single-JVM Arrow fan-out is",
        "the 8→32 bottleneck: same `run_resumable` job, same corpus, but",
        f"the {hi_workers * 8}-core level runs {hi_workers} executor JVMs"
        " × 8 cores (Spark standalone",
        "local-cluster mode — the shape a real multi-executor cluster",
        "runs) instead of one JVM × 32 task slots.",
        "",
        f"- corpus: {n_turns} turns; executor memory {mem_mb} MB;"
        f" {runs} timed runs per level, best-of-N, taskset-pinned",
        f"- probe-paired: 8-core pure-Python ceiling {probe_before} -> "
        f"{probe_after} turns/s around the runs; loadavg "
        f"{[round(x, 2) for x in os.getloadavg()]}",
        "",
        "| level | runs (turns/sec) | best | median |",
        "|---|---|---|---|",
    ]
    for w in (1, hi_workers):
        rs = ", ".join(str(r["turns_per_sec"]) for r in levels[w]["runs"])
        lines.append(f"| local-cluster[{w},8,{mem_mb}] | {rs} | {best[w]} |"
                     f" {med[w]} |")
    lines += [
        "",
        f"**Multi-JVM scaling efficiency (8→{hi_workers * 8}) = "
        f"({best[hi_workers]} / {best[1]}) / {hi_workers} = {eff:.3f}**",
        "",
    ]
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
