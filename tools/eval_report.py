"""Markdown evaluation report — the reference's ``generate_report``
(run_evaluation.py:1324+, xlsx output) as a CLI over parquet tables.

    python tools/eval_report.py <parsed.parquet> <labels.parquet> [out.md]

Both inputs need (doc_id, domtree_json) columns; labels define the corpus
(ground truth). Prints the report to stdout, optionally writes a file.
Smoke-testable against the gate docs:

    python - <<'PY'
    ... gate_extract(...).write.parquet("/tmp/trees") ...
    PY
    python tools/eval_report.py /tmp/trees /tmp/trees
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_report(parsed_path: str, labels_path: str) -> str:
    from pyspark.sql import functions as F

    from bella_domify_spark.engine.evaluate import (
        evaluate_extractions,
        evaluation_summary,
        layout_confusion,
        per_type_accuracy,
    )
    from bella_domify_spark.engine.session import build_session

    spark = build_session(app_name="bella-domify-eval-report", cores=8,
                          shuffle_partitions=8)
    parsed = spark.read.parquet(parsed_path)
    labels = spark.read.parquet(labels_path)
    metrics = evaluate_extractions(parsed, labels).cache()

    s = evaluation_summary(metrics).collect()[0]
    types = per_type_accuracy(metrics).orderBy("label_type").collect()
    conf = (layout_confusion(metrics)
            .filter(F.col("label_type") != F.col("parsed_type"))
            .orderBy(F.desc("weight")).limit(10).collect())
    worst = (metrics
             .withColumn("score", F.try_divide("n_1v1", "n_label"))
             .orderBy("score", "doc_id").limit(10)
             .select("doc_id", "n_label", "n_1v1", "mean_edit",
                     "structure_right", "structure_total").collect())
    n_docs = metrics.count()
    metrics.unpersist()

    lines = [
        "# Extraction evaluation report",
        "",
        f"Documents evaluated: **{n_docs}**",
        "",
        "## Headline metrics",
        "",
        f"- block split (1v1 rate): **{s['block_1v1_rate']}**",
        f"- mean edit similarity: **{s['mean_edit_similarity']}**",
        f"- layout (type) accuracy: **{s['layout_accuracy']}**",
        f"- structure accuracy: **{s['structure_accuracy']}**",
        "",
        "## Per-type accuracy",
        "",
        "| label type | correct | total | accuracy |",
        "|---|---|---|---|",
    ]
    lines += [f"| {r['label_type']} | {r['correct']} | {r['total']} | "
              f"{r['accuracy']} |" for r in types]
    lines += ["", "## Top confusions (off-diagonal)", ""]
    if conf:
        lines += ["| label type | parsed as | weight |", "|---|---|---|"]
        lines += [f"| {r['label_type']} | {r['parsed_type']} | "
                  f"{r['weight']} |" for r in conf]
    else:
        lines.append("none — every node typed correctly")
    lines += ["", "## Worst documents (by 1v1 rate)", "",
              "| doc_id | nodes | 1v1 | similarity | edges kept |",
              "|---|---|---|---|---|"]
    lines += [f"| {r['doc_id']} | {r['n_label']} | {r['n_1v1']} | "
              f"{round(r['mean_edit'], 4)} | "
              f"{r['structure_right']}/{r['structure_total']} |"
              for r in worst]
    return "\n".join(lines) + "\n"


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    report = build_report(sys.argv[1], sys.argv[2])
    print(report)
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as f:
            f.write(report)
    return 0


if __name__ == "__main__":
    sys.exit(main())
