"""pdflike correctness-gate plumbing: Spark mapInPandas output must equal
the pure-Python expected frame, and payloads must be deterministic."""

import pandas as pd

from bella_domify_spark.parsers.pdflike.gate import (
    expected_frame,
    gate_extract,
    gate_payload,
)


def test_gate_payload_deterministic():
    assert gate_payload(7) == gate_payload(7)
    assert gate_payload(7) != gate_payload(8)
    assert gate_payload(0).startswith('{"pages"')


def test_gate_scenarios_covered():
    # the seeded generator must exercise every typesetter scenario across a
    # modest id range (headers/footers, TOC, lists, tables, two-column,
    # hyphenation, cover) — guards against a seed change collapsing coverage
    import json

    kinds = set()
    for i in range(64):
        doc = json.loads(gate_payload(i))
        texts = [s.get("text", "") for p in doc["pages"] for b in p["blocks"]
                 for l in b["lines"] for s in l["spans"]]
        if any(t == "目录" for t in texts):
            kinds.add("toc")
        if any(t.startswith("1. ") for t in texts):
            kinds.add("list")
        if any(p["shapes"] for p in doc["pages"]):
            kinds.add("table")
        if any(t.startswith("Page ") for t in texts):
            kinds.add("footer")
        if len(doc["pages"]) > 1:
            kinds.add("multipage")
    assert kinds == {"toc", "list", "table", "footer", "multipage"}


def test_gate_extract_matches_expected(spark):
    docs = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
    got = (gate_extract(docs).toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = expected_frame(40)
    assert (got["status"] == "ok").all()
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
