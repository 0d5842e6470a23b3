"""Run-progress summary from an extraction output directory's manifests.

    python tools/progress.py <out_dir> [total_buckets]

Pure manifest reads (works on local paths and pyarrow URIs) — no Spark
session, safe to run WHILE a job is writing: only committed buckets have
manifests, so the numbers are exact-at-commit. The per-bucket wall_ms is
worker compute time, so rows/wall gives per-core parse throughput;
aggregate cluster throughput = rows / elapsed wall-clock.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_all(out_dir: str, max_workers: int = 32) -> list:
    """Manifest reads fanned out over a thread pool — each is one small
    GET, so threads (not processes) remove the serial round-trip wall.
    At the runbook's 2^20-bucket scale even 32-way fan-out means ~10^4+
    seconds of GETs against an object store: for routine monitoring there,
    prefer the bucket COUNT (cheap LIST, pct_done only) or point this at
    a per-run subset; full metric sums are an end-of-run report."""
    from concurrent.futures import ThreadPoolExecutor

    from bella_domify_spark.engine.manifest import BucketStore

    store = BucketStore(out_dir)
    names = [n for n in store.manifest_names() if n.startswith("bucket-")]
    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        return list(ex.map(lambda n: store.read_json("_manifests", n), names))


def summarize(out_dir: str, total_buckets: int | None = None) -> dict:
    ms = _read_all(out_dir)
    rows = sum(m["rows"] for m in ms)
    nbytes = sum(m["bytes"] for m in ms)
    wall_ms = sum(m["wall_ms"] for m in ms)
    sizes = sorted(m["rows"] for m in ms) or [0]
    out = {
        "buckets_done": len(ms),
        "buckets_total": total_buckets,
        "pct_done": (round(100.0 * len(ms) / total_buckets, 2)
                     if total_buckets else None),
        "rows": rows,
        "bytes": nbytes,
        "worker_compute_sec": round(wall_ms / 1000.0, 1),
        "rows_per_core_sec": (round(rows / (wall_ms / 1000.0), 1)
                              if wall_ms else None),
        "bucket_rows_min": sizes[0],
        "bucket_rows_median": sizes[len(sizes) // 2],
        "bucket_rows_max": sizes[-1],
        "run_ids": sorted({m["run_id"] for m in ms}),
    }
    return out


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    total = int(sys.argv[2]) if len(sys.argv) > 2 else None
    print(json.dumps(summarize(sys.argv[1], total), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
