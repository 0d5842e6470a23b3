"""Regenerate fixtures/eval_expected.parquet — the pinned oracle for the
``extraction_eval`` correctness-gate query (self-evaluation metrics of the
gate documents' trees).

Run after ANY change to the pdflike parse, synthdocs, or evaluation
semantics:

    python tools/gen_eval_expected.py [max_doc_id]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "eval_expected.parquet")


OUT_DEGRADED = OUT.replace("eval_expected", "eval_degraded_expected")

COLS = ["doc_id", "n_label", "n_parsed", "n_1v1", "mean_edit",
        "structure_right", "structure_total"]


def main(max_doc_id: int = 5000) -> None:
    import pandas as pd

    from bella_domify_spark.engine.evaluate import degrade_tree, evaluate_pair
    from bella_domify_spark.parsers.pdflike.gate import gate_record

    rows, rows_deg = [], []
    for i in range(max_doc_id):
        tree = gate_record(i)["domtree_json"]
        for sink, parsed in ((rows, tree), (rows_deg, degrade_tree(tree))):
            rec = evaluate_pair(tree, parsed)
            rec.pop("confusion")
            rec["doc_id"] = i
            sink.append(rec)
    for out, data in ((OUT, rows), (OUT_DEGRADED, rows_deg)):
        df = pd.DataFrame(data)[COLS]
        df.to_parquet(out, index=False)
        print(f"wrote {len(df)} rows to {out} "
              f"({os.path.getsize(out) / 1e3:.0f} KB)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5000)
