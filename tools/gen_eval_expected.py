"""Regenerate fixtures/eval_expected.parquet, eval_degraded_expected.parquet
and eval_confusion_expected.parquet — the pinned oracles for the
``extraction_eval``, ``extraction_eval_degraded`` and
``extraction_eval_summary`` correctness-gate queries (evaluation metrics of
the gate documents' trees, plus the degraded run's per-doc confusion rows).

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

    rows, rows_deg, conf_rows = [], [], []
    for i in range(max_doc_id):
        tree = gate_record(i)["domtree_json"]
        for sink, parsed in ((rows, tree), (rows_deg, degrade_tree(tree))):
            rec = evaluate_pair(tree, parsed)
            conf = rec.pop("confusion")
            rec["doc_id"] = i
            sink.append(rec)
            if sink is rows_deg:
                conf_rows += [{"doc_id": i, **c} for c in conf]
    for out, data, cols in ((OUT, rows, COLS), (OUT_DEGRADED, rows_deg, COLS),
                            (OUT.replace("eval_expected",
                                         "eval_confusion_expected"),
                             conf_rows,
                             ["doc_id", "label_type", "parsed_type",
                              "weight"])):
        df = pd.DataFrame(data)[cols]
        df.to_parquet(out, index=False)
        print(f"wrote {len(df)} rows to {out} "
              f"({os.path.getsize(out) / 1e3:.0f} KB)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5000)
