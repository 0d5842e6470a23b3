"""Regenerate fixtures/pdflike_expected.parquet AND
fixtures/pdflike_stream_expected.parquet — the pinned oracle tables for the
``pdflike_extract`` and ``pdflike_extract_stream`` correctness-gate queries.

Run after ANY change to the pdflike parse semantics or synthdocs generator:

    python tools/gen_pdflike_expected.py [max_doc_id]

Covers doc_ids [0, 5000) by default (superset of every testdata sf dir);
the oracle SQL joins against the ``documents`` view so extra rows are
harmless.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "pdflike_expected.parquet")


def main(max_doc_id: int = 5000) -> None:
    from bella_domify_spark.parsers.pdflike.gate import (
        expected_frame,
        expected_frame_ocr,
        expected_frame_standard,
        expected_frame_stream,
    )

    for frame_fn, out in ((expected_frame, OUT),
                          (expected_frame_stream,
                           OUT.replace("pdflike_expected",
                                       "pdflike_stream_expected")),
                          (expected_frame_ocr,
                           OUT.replace("pdflike_expected",
                                       "pdflike_ocr_expected")),
                          (expected_frame_standard,
                           OUT.replace("pdflike_expected",
                                       "pdflike_standard_expected"))):
        df = frame_fn(max_doc_id)
        bad = df[df["status"] != "ok"]
        if len(bad):
            raise SystemExit(f"{len(bad)} gate payloads failed to parse: "
                             f"{bad.head(3).to_dict('records')}")
        df.to_parquet(out, index=False)
        print(f"wrote {len(df)} rows to {out} "
              f"({os.path.getsize(out) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5000)
