"""Layout-evaluation harness: pure metric semantics + Spark plumbing.

Mirrors reference evaluation/run_evaluation.py behaviors (find_mapping
greedy alignment, evaluate_layout confusion weighting, structure edges).
"""

import json

import pytest

from bella_domify_spark.engine.evaluate import (
    clean_text,
    evaluate_pair,
    evaluation_summary,
    evaluate_extractions,
    find_mapping,
    layout_confusion,
    tree_to_edges,
    tree_to_nodes,
)


def _tree(nodes):
    """Build a domtree JSON from (order, type, layout, text, children) tuples."""
    def node(spec):
        order, btype, ltype, text, children = spec
        el = {"block_type": btype, "layout_type": ltype, "page_num": [0]}
        if btype == "text":
            el["text"] = text
        elif btype == "table":
            # reference-shaped wrapper rows; the engine's bare-list rows
            # are covered by the gate-doc Spark tests
            el["rows"] = [{"cells": [{"text": t} for t in text]}]
        return {"order_num": order, "element": el,
                "child": [node(c) for c in children]}
    return json.dumps({"root": {"order_num": None, "element": None,
                                "child": [node(s) for s in nodes]}})


SIMPLE = _tree([
    ("1", "text", "Title", "Quarterly report", []),
    ("2", "text", "Text", "Revenue grew by twelve percent this year.", [
        ("2.1", "text", "Text", "Costs fell materially in the second half.", []),
    ]),
    ("3", "table", "Table", ["alpha", "beta"], []),
    ("4", "image", "Figure", None, []),
])


class TestPure:
    def test_tree_to_nodes_flatten(self):
        nodes = tree_to_nodes(SIMPLE)
        assert [n["order_num"] for n in nodes] == ["1", "2", "2.1", "3", "4"]
        assert nodes[3]["text"] == "alpha | beta"
        assert nodes[4]["text"] == "<image>"

    def test_tree_to_edges_excludes_root_children(self):
        assert tree_to_edges(SIMPLE) == {"2.1": "2"}

    def test_clean_text_dot_leader(self):
        # marker string is the reference's exact CJK token
        # (run_evaluation.py:810-812)
        assert clean_text("Intro  ....................  7") == \
            "Intro<目录体中连续点点点>7"
        assert clean_text(" a\tb\nc ") == "abc"

    def test_identical_trees_score_perfect(self):
        rec = evaluate_pair(SIMPLE, SIMPLE)
        assert rec["n_label"] == rec["n_parsed"] == 5
        assert rec["n_1v1"] == 5
        assert rec["mean_edit"] == pytest.approx(1.0)
        assert rec["structure_right"] == rec["structure_total"] == 1
        assert all(c["label_type"] == c["parsed_type"]
                   for c in rec["confusion"])

    def test_retyped_node_hits_off_diagonal(self):
        retyped = SIMPLE.replace('"layout_type": "Title"',
                                 '"layout_type": "Text"')
        rec = evaluate_pair(SIMPLE, retyped)
        off = [c for c in rec["confusion"]
               if c["label_type"] != c["parsed_type"]]
        assert off == [{"label_type": "Title", "parsed_type": "Text",
                        "weight": 1.0}]
        assert rec["n_1v1"] == 5  # text still matches 1v1

    def test_missing_node_is_p0_and_breaks_structure(self):
        pruned = json.loads(SIMPLE)
        pruned["root"]["child"][1]["child"] = []  # drop node 2.1
        rec = evaluate_pair(SIMPLE, json.dumps(pruned))
        p0 = [c for c in rec["confusion"] if c["parsed_type"] == "p_0"]
        assert p0 == [{"label_type": "Text", "parsed_type": "p_0",
                       "weight": 1.0}]
        assert rec["structure_right"] == 0 and rec["structure_total"] == 1
        # 4 matched of 5, similarity mean counts the miss as 0
        assert rec["mean_edit"] == pytest.approx(4 / 5)

    def test_containment_accumulates_1vn(self):
        # reference semantics: a label text contained in a parser text
        # keeps scanning and accumulates candidates -> 1vN, not 1v1
        label = [{"order_num": "1", "layout_type": "Text",
                  "text": "hello world", "page_num": 0}]
        parser = [{"order_num": "a", "layout_type": "Text",
                   "text": "xx hello world yy and much more trailing text",
                   "page_num": 0},
                  {"order_num": "b", "layout_type": "Text",
                   "text": "prefix hello world suffix plus extra words here",
                   "page_num": 0}]
        mapping, dists = find_mapping(parser, label)
        assert mapping["1"] == ["a", "b"]
        assert dists == [0.0]

    def test_page_mismatch_blocks_match(self):
        label = [{"order_num": "1", "layout_type": "Text",
                  "text": "same text", "page_num": 0}]
        parser = [{"order_num": "a", "layout_type": "Text",
                   "text": "same text", "page_num": 3}]
        mapping, _ = find_mapping(parser, label)
        assert mapping["1"] == []


class TestDegrade:
    def test_degrade_tree_is_deterministic_and_lossy(self):
        from bella_domify_spark.engine.evaluate import degrade_tree

        d1, d2 = degrade_tree(SIMPLE), degrade_tree(SIMPLE)
        assert d1 == d2
        doc = json.loads(d1)
        assert len(doc["root"]["child"]) == 3  # last root child dropped
        rec = evaluate_pair(SIMPLE, d1)
        assert rec["n_parsed"] < rec["n_label"]
        assert any(c["parsed_type"] == "p_0" for c in rec["confusion"])
        assert any(c["label_type"] != c["parsed_type"]
                   and c["parsed_type"] not in ("p_0", "p_N")
                   for c in rec["confusion"])  # the retyped node


class TestSpark:
    def test_self_evaluation_on_gate_docs(self, spark):
        from bella_domify_spark.parsers.pdflike.gate import gate_extract

        docs = spark.createDataFrame([(i,) for i in range(12)], ["doc_id"])
        trees = gate_extract(docs).select("doc_id", "domtree_json")
        metrics = evaluate_extractions(trees, trees).cache()
        rows = {r["doc_id"]: r for r in metrics.collect()}
        assert len(rows) == 12
        # distributed metrics must equal the pure-python evaluation
        from bella_domify_spark.parsers.pdflike.gate import gate_record
        for i in (0, 5, 11):
            exp = evaluate_pair(gate_record(i)["domtree_json"],
                                gate_record(i)["domtree_json"])
            assert rows[i]["n_label"] == exp["n_label"]
            assert rows[i]["n_1v1"] == exp["n_1v1"]
            assert rows[i]["structure_right"] == exp["structure_right"]

        summary = evaluation_summary(metrics).collect()[0]
        assert summary["layout_accuracy"] == pytest.approx(1.0)
        assert summary["structure_accuracy"] == pytest.approx(1.0)
        conf = layout_confusion(metrics).collect()
        assert all(r["label_type"] == r["parsed_type"] for r in conf)

        from bella_domify_spark.engine.evaluate import per_type_accuracy
        acc = per_type_accuracy(metrics).collect()
        assert acc and all(r["accuracy"] == pytest.approx(1.0) for r in acc)
        metrics.unpersist()

    def test_missing_parsed_doc_scores_p0(self, spark):
        # a document the parser lost entirely must count against the
        # corpus (label left join + empty-tree substitute), not vanish
        from bella_domify_spark.engine.evaluate import evaluate_extractions

        labels = spark.createDataFrame(
            [(1, SIMPLE), (2, SIMPLE)], ["doc_id", "domtree_json"])
        parsed = labels.filter("doc_id = 1")
        rows = {r["doc_id"]: r
                for r in evaluate_extractions(parsed, labels).collect()}
        assert set(rows) == {1, 2}
        assert rows[2]["n_parsed"] == 0
        assert rows[2]["n_1v1"] == 0
        assert rows[2]["mean_edit"] == pytest.approx(0.0)

    def test_flat_corpus_summary_is_null_not_crash(self, spark):
        # a corpus of flat trees has zero structure edges: the structure
        # ratio is undefined (NULL), not an ANSI DIVIDE_BY_ZERO crash
        flat = _tree([("1", "text", "Text", "hello world", [])])
        df = spark.createDataFrame([(1, flat)],
                                   "doc_id bigint, domtree_json string")
        s = evaluation_summary(evaluate_extractions(df, df)).collect()[0]
        assert s["structure_accuracy"] is None
        assert s["block_1v1_rate"] == pytest.approx(1.0)
        assert s["layout_accuracy"] == pytest.approx(1.0)

    def test_null_trees_are_survivable(self, spark):
        # error-status parse rows carry domtree_json NULL: parsed-side
        # nulls score as empty trees, label-side nulls are dropped
        from bella_domify_spark.engine.evaluate import evaluate_extractions

        labels = spark.createDataFrame(
            [(1, SIMPLE), (2, SIMPLE), (3, None)],
            "doc_id bigint, domtree_json string")
        parsed = spark.createDataFrame(
            [(1, SIMPLE), (2, None), (3, SIMPLE)],
            "doc_id bigint, domtree_json string")
        rows = {r["doc_id"]: r
                for r in evaluate_extractions(parsed, labels).collect()}
        assert set(rows) == {1, 2}
        assert rows[1]["n_1v1"] == 5
        assert rows[2]["n_parsed"] == 0

    def test_cal_accuracy_totals(self, spark):
        # corpus totals (run_evaluation.py:1301-1321): per-type rows plus
        # __blocks__/__structure__; decimal summation makes the values
        # independent of partitioning (exact-hash-gate requirement)
        from bella_domify_spark.engine.evaluate import (
            cal_accuracy,
            degrade_extractions,
        )
        from bella_domify_spark.parsers.pdflike.gate import gate_extract

        docs = spark.createDataFrame([(i,) for i in range(12)], ["doc_id"])
        trees = gate_extract(docs).select("doc_id", "domtree_json").cache()
        m = evaluate_extractions(degrade_extractions(trees), trees)
        rows = {r["label_type"]: r for r in cal_accuracy(m).collect()}
        assert "__blocks__" in rows and "__structure__" in rows
        blocks = rows["__blocks__"]
        assert 0.0 < blocks["accuracy"] < 1.0   # degraded: imperfect
        assert blocks["correct"] <= blocks["total"]
        # per-type rows: at least Text present, diagonal share ≤ 1
        assert any(t not in ("__blocks__", "__structure__") for t in rows)
        for t, r in rows.items():
            if r["accuracy"] is not None:
                assert 0.0 <= r["accuracy"] <= 1.0
        # partition-order independence: same values at 1 partition
        single = {r["label_type"]: r for r in
                  cal_accuracy(m.coalesce(1)).collect()}
        assert {t: (r["correct"], r["total"], r["accuracy"])
                for t, r in rows.items()} == \
               {t: (r["correct"], r["total"], r["accuracy"])
                for t, r in single.items()}
        trees.unpersist()

    def test_degraded_parse_is_scored_down(self, spark):
        # drop every tree's last root child on the "parsed" side
        from bella_domify_spark.parsers.pdflike.gate import gate_extract

        docs = spark.createDataFrame([(i,) for i in range(8)], ["doc_id"])
        trees = gate_extract(docs).select("doc_id", "domtree_json").cache()

        def prune(js):
            d = json.loads(js)
            d["root"]["child"] = d["root"]["child"][:-1]
            return json.dumps(d)

        import pandas as pd

        def run(batches):
            for pdf in batches:
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "domtree_json": [prune(j) for j in pdf["domtree_json"]]})

        degraded = trees.mapInPandas(run, "doc_id bigint, domtree_json string")
        summary = evaluation_summary(
            evaluate_extractions(degraded, trees)).collect()[0]
        assert summary["block_1v1_rate"] < 1.0
        assert summary["mean_edit_similarity"] < 1.0
        trees.unpersist()
