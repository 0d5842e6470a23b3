"""Machine-ceiling probe: how far does THIS HOST scale pure-Python work?

Zero Spark: parse the scaling corpus's payloads with `parse_payload` via
`multiprocessing.Pool(k)`, the whole process tree pinned to k CPUs with
taskset. The ratio between two k levels is the platform's own scaling
ceiling — the extraction job's scaling is judged against it, separating
plan behavior from shared-host noise (BENCH/BASELINE.md).

Usage: python tools/ceiling_probe.py <corpus_dir> [k1,k2] [runs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {root!r})
import pandas as pd
from multiprocessing import Pool
from bella_domify_spark.parsers.dispatch import parse_payload

k = int(sys.argv[1]); corpus = sys.argv[2]; runs = int(sys.argv[3])
texts = pd.read_parquet(f"{{corpus}}/transcripts.parquet",
                        columns=["text"])["text"].tolist()

def work(chunk):
    return sum(len(parse_payload(t)["extracted_text"]) for t in chunk)

chunks = [texts[i::k * 4] for i in range(k * 4)]
with Pool(k) as pool:
    pool.map(work, chunks)            # warmup: imports in every worker
    out = []
    for _ in range(runs):
        t0 = time.monotonic()
        pool.map(work, chunks)
        wall = time.monotonic() - t0
        out.append(round(len(texts) / wall, 1))
print("RESULT " + json.dumps({{"k": k, "turns_per_sec": out}}))
"""


def main() -> int:
    corpus = sys.argv[1]
    k1, k2 = (int(x) for x in (sys.argv[2] if len(sys.argv) > 2
                               else "8,32").split(","))
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    levels = {}
    for k in (k1, k2):
        cmd = ["taskset", "-c", f"0-{k - 1}", sys.executable, "-c",
               RUNNER.format(root=ROOT), str(k), corpus, str(runs)]
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=2400)
        for line in proc.stdout.splitlines():
            if line.startswith("RESULT "):
                levels[k] = json.loads(line[len("RESULT "):])
                break
        else:
            raise RuntimeError(proc.stderr[-2000:])
    best = {k: max(v["turns_per_sec"]) for k, v in levels.items()}
    print(json.dumps({
        "metric": f"machine_ceiling_{k1}_to_{k2}",
        "pure_python_best_turns_per_sec": {str(k): best[k] for k in best},
        "platform_speedup": round(best[k2] / best[k1], 3),
        "platform_efficiency": round(best[k2] / best[k1] / (k2 / k1), 3),
        "all_runs": {str(k): v["turns_per_sec"] for k, v in levels.items()},
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
