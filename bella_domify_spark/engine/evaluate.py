"""Layout-accuracy evaluation harness — the reference's
``evaluation/run_evaluation.py`` (1545 LoC, offline report script)
re-expressed as a distributed operator over (doc_id, domtree_json) tables.

Per document it reproduces the reference's three headline metrics:

- **block split** — greedy text alignment between label and parsed node
  lists (`find_mapping`, run_evaluation.py:817-886): normalized edit
  similarity ≥ 0.8 is a 1-to-1 match (both nodes retired), substring
  containment accumulates 1-to-N candidates; the mean similarity counts
  unmatched label nodes as 0.
- **layout (block-type) confusion** — `evaluate_layout`
  (run_evaluation.py:975-1021): 1v1 matches vote (label_type,
  parsed_type) with weight 1; 1vN matches vote the fraction of
  type-correct parses on the *last* scanned parser node's column (a
  reference quirk, preserved) and the remainder on `p_N`; unmatched label
  nodes land in `p_0`. Per-type and overall accuracy are the diagonal
  shares (`cal_accuracy`, run_evaluation.py:1301-1321).
- **structure accuracy** — parent→child edges preserved under the 1v1
  mapping (`cal_structure_accuracy` + `get_pc_edges_beike`,
  run_evaluation.py:1181-1214).

The driver-side loops of the reference become one Arrow-batched
``mapInPandas`` over the joined tables (each document evaluates
independently — embarrassingly parallel), and the report aggregations
(confusion matrix, totals) run JVM-side on the small per-doc metric rows.
At 100 TB the heavy columns (two tree JSONs) are scanned once, never
shuffled (the join key is doc_id; co-partitioned inputs broadcast or
sort-merge on ids only), and the metric output is a few rows per doc.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher
from typing import Iterator, List, Tuple, Union

from pyspark.sql import DataFrame, functions as F

from bella_domify_spark.functions.fastjson import loads as _json_loads

# a parsed-side tree for documents the parser produced nothing for (the
# label left-join substitutes this so total parse failures score as all-p_0
# instead of silently vanishing from the corpus metrics)
EMPTY_TREE_JSON = '{"root": {"order_num": null, "element": null, "child": []}}'

_DOTS = re.compile(r"(.)\1{9,}")


def clean_text(text: str) -> str:
    """Whitespace strip + dot-leader normalization (run_evaluation.py:805-814;
    the replacement marker is the reference's exact CJK string so
    SequenceMatcher ratios against ordinary Latin text are unchanged)."""
    text = re.sub(r"\s+", "", text or "")
    if _DOTS.search(text):
        text = re.sub(r"\.{2,}", "<目录体中连续点点点>", text)
    return text


def edit_ratio(s1: str, s2: str) -> float:
    """SequenceMatcher similarity, shorter string first — the reference
    notes its helper is asymmetric and orders operands by length
    (run_evaluation.py:299-305)."""
    if len(s1) > len(s2):
        s1, s2 = s2, s1
    return SequenceMatcher(None, s1, s2).ratio()


def tree_to_nodes(domtree: Union[str, dict]) -> List[dict]:
    """Flatten a domtree (JSON string or already-parsed dict) to evaluation
    node dicts (tree2list_beike, run_evaluation.py:308-341): text nodes
    carry their text, tables join all cell texts with ' | ', images become
    '<image>'."""
    doc = _json_loads(domtree) if isinstance(domtree, str) else domtree
    out: List[dict] = []

    def walk(node: dict) -> None:
        el = node.get("element")
        if el:
            bt = el.get("block_type")
            if bt == "text":
                text = el.get("text", "")
            elif bt == "table":
                # reference rows are {"cells": [...]} wrappers
                # (tree2list_beike); this engine serializes a row as the
                # bare cell list — accept both
                text = " | ".join(
                    c.get("text", "")
                    for r in el.get("rows", [])
                    for c in (r.get("cells", []) if isinstance(r, dict) else r))
            else:
                text = "<image>"
            pages = el.get("page_num") or [-1]
            out.append({"order_num": node.get("order_num"),
                        "layout_type": el.get("layout_type"),
                        "text": text, "page_num": pages[0]})
        for child in node.get("child", []):
            walk(child)

    walk(doc.get("root", doc))
    return out


def tree_to_edges(domtree: Union[str, dict]) -> dict:
    """child order_num → parent order_num, root's children excluded
    (get_pc_edges_beike, run_evaluation.py:1203-1214)."""
    doc = _json_loads(domtree) if isinstance(domtree, str) else domtree
    edges: dict = {}

    def walk(parent_order, nodes: List[dict]) -> None:
        for node in nodes:
            order = node.get("order_num")
            if parent_order:
                edges[order] = parent_order
            walk(order, node.get("child", []))

    root = doc.get("root", doc)
    walk(root.get("order_num"), root.get("child", []))
    return edges


def find_mapping(parser_nodes: List[dict],
                 label_nodes: List[dict]) -> Tuple[dict, List[float]]:
    """Greedy label→parser alignment (find_mapping,
    run_evaluation.py:817-886, sans logging): similarity ≥ 0.8 retires
    both nodes (1v1); containment keeps scanning and may accumulate
    several candidates (1vN).

    Deliberate deviation (README Faithfulness notes): the reference's
    containment test treats an EMPTY cleaned text as contained in every
    parser text, so a whitespace-only label node accumulates the entire
    pool as 1vN candidates; this port guards empty strings and such nodes
    score p_0 instead."""
    parser_pool = list(parser_nodes)
    mapping: dict = {}
    dists: List[float] = []
    for label_node in label_nodes:
        order = label_node["order_num"]
        if order in mapping:
            raise ValueError(f"duplicate label order_num {order!r}")
        mapping[order] = []
        ltext = clean_text(label_node["text"])
        lpage = label_node["page_num"]
        for parser_node in parser_pool:
            ptext = clean_text(parser_node["text"])
            ppage = parser_node["page_num"]
            if lpage != -1 and ppage != -1 and lpage != ppage:
                continue
            dist = round(edit_ratio(ltext, ptext), 2)
            if dist >= 0.8:
                mapping[order].append(parser_node["order_num"])
                dists.append(dist)
                parser_pool.remove(parser_node)
                break
            elif ltext and ltext in ptext:
                mapping[order].append(parser_node["order_num"])
            elif ptext and ptext in ltext:
                mapping[order].append(parser_node["order_num"])
    all_dists = dists + [0.0] * (len(label_nodes) - len(dists))
    return mapping, all_dists


def evaluate_pair(label_json: str, parsed_json: str) -> dict:
    """All three metric families for one document."""
    label_doc = _json_loads(label_json)    # parse each JSON once; nodes and
    parsed_doc = _json_loads(parsed_json)  # edges walk the same dict
    label_nodes = tree_to_nodes(label_doc)
    parser_nodes = tree_to_nodes(parsed_doc)
    by_order = {n["order_num"]: n for n in parser_nodes}
    mapping, all_dists = find_mapping(parser_nodes, label_nodes)

    # layout confusion (evaluate_layout, run_evaluation.py:975-1021)
    confusion: List[tuple] = []  # (label_type, parsed_col, weight)
    for label_node in label_nodes:
        ltype = label_node["layout_type"]
        matched = mapping[label_node["order_num"]]
        if len(matched) == 1:
            ptype = by_order[matched[0]]["layout_type"]
            confusion.append((ltype, ptype, 1.0))
        elif len(matched) > 1:
            right = sum(1 for m in matched
                        if by_order[m]["layout_type"] == ltype)
            acc = right / len(matched)
            # reference quirk: the fractional credit lands on the LAST
            # scanned parser node's type column
            last_type = by_order[matched[-1]]["layout_type"]
            confusion.append((ltype, last_type, acc))
            confusion.append((ltype, "p_N", 1.0 - acc))
        else:
            confusion.append((ltype, "p_0", 1.0))

    # structure accuracy (cal_structure_accuracy, run_evaluation.py:1181-1200)
    label_edges = tree_to_edges(label_doc)
    parser_edges = tree_to_edges(parsed_doc)
    s_right = 0
    for child, father in label_edges.items():
        cm = mapping.get(child, [])
        fm = mapping.get(father, [])
        if (len(cm) == 1 and len(fm) == 1
                and parser_edges.get(cm[0]) == fm[0]):
            s_right += 1

    n_1v1 = sum(1 for v in mapping.values() if len(v) == 1)
    return {
        "n_label": len(label_nodes),
        "n_parsed": len(parser_nodes),
        "n_1v1": n_1v1,
        # rounded HERE (python) so the Spark path and any pinned oracle
        # parquet produced by this same function are bit-identical
        "mean_edit": round(sum(all_dists) / len(all_dists), 6)
        if all_dists else 1.0,
        "structure_right": s_right,
        "structure_total": len(label_edges),
        "confusion": [{"label_type": a, "parsed_type": b, "weight": w}
                      for a, b, w in confusion],
    }


_METRIC_SCHEMA = ("doc_id bigint, n_label int, n_parsed int, n_1v1 int, "
                  "mean_edit double, structure_right int, "
                  "structure_total int, confusion array<struct<"
                  "label_type string, parsed_type string, weight double>>")


def evaluate_extractions(parsed: DataFrame, labels: DataFrame,
                         id_col: str = "doc_id",
                         json_col: str = "domtree_json") -> DataFrame:
    """Per-document evaluation metrics: label trees LEFT-join parsed trees
    on ``id_col`` and score each pair inside one Arrow stage. The label
    (ground-truth) side drives the corpus: a document the parser produced
    no tree for scores against an empty tree (all label nodes p_0,
    similarity 0) instead of silently dropping out of the averages."""
    import pandas as pd

    p = parsed.select(F.col(id_col).alias("doc_id"),
                      F.col(json_col).alias("_parsed"))
    l = labels.select(F.col(id_col).alias("doc_id"),
                      F.col(json_col).alias("_label"))
    # null trees: a failed parse (status=error rows carry domtree_json
    # NULL) scores as an empty tree via the same coalesce that covers
    # join misses; a null LABEL tree defines no ground truth — drop it
    joined = (l.filter(F.col("_label").isNotNull())
              .join(p, "doc_id", "left")
              .select("doc_id", "_label",
                      F.coalesce("_parsed", F.lit(EMPTY_TREE_JSON))
                      .alias("_parsed")))

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for doc_id, pj, lj in zip(pdf["doc_id"], pdf["_parsed"],
                                      pdf["_label"]):
                rec = evaluate_pair(lj, pj)
                rec["doc_id"] = int(doc_id)
                rows.append(rec)
            yield pd.DataFrame(rows)

    return joined.mapInPandas(run, _METRIC_SCHEMA)


def degrade_tree(domtree_json: str) -> str:
    """Deterministic parse degradation for harness validation: drop the
    last root child (→ its label nodes score p_0 and its edges break) and
    retype the first remaining Text node to Title (→ one off-diagonal
    confusion vote). Used by the ``extraction_eval_degraded`` driver gate
    so the oracle pins NON-perfect metric rows, and available to smoke-test
    the harness against any real regression corpus."""
    from bella_domify_spark.functions.fastjson import dumps as _json_dumps

    doc = _json_loads(domtree_json)
    root = doc.get("root", doc)
    root["child"] = root.get("child", [])[:-1]

    def retype_first_text(node) -> bool:
        el = node.get("element")
        if el and el.get("layout_type") == "Text":
            el["layout_type"] = "Title"
            return True
        return any(retype_first_text(c) for c in node.get("child", []))

    retype_first_text(root)
    return _json_dumps(doc)


def degrade_extractions(trees: DataFrame,
                        json_col: str = "domtree_json") -> DataFrame:
    """Apply ``degrade_tree`` to a (id, tree) DataFrame inside one Arrow
    stage (harness-validation input generator)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf = pdf.copy()
            # real parse output carries NULL trees on status=error rows —
            # pass them through (they score as empty trees downstream)
            pdf[json_col] = [degrade_tree(j) if isinstance(j, str) else None
                             for j in pdf[json_col]]
            yield pdf

    return trees.mapInPandas(run, trees.schema)


def layout_confusion(metrics: DataFrame) -> DataFrame:
    """Corpus-level confusion matrix rows: (label_type, parsed_type,
    weight) — the reference's DataFrame print, as a queryable table."""
    return (metrics.select(F.explode("confusion").alias("c"))
            .groupBy(F.col("c.label_type").alias("label_type"),
                     F.col("c.parsed_type").alias("parsed_type"))
            .agg(F.round(F.sum("c.weight"), 6).alias("weight")))


def cal_accuracy(metrics: DataFrame) -> DataFrame:
    """Corpus-level accuracy totals — the reference's ``cal_accuracy``
    report (run_evaluation.py:1301-1321) as one queryable table: one row
    per label type (confusion-matrix diagonal share) plus ``__blocks__``
    (corpus 1v1 totals) and ``__structure__`` (corpus edge totals) rows,
    all shaped (label_type, correct, total, accuracy).

    Fractional confusion weights are summed through DECIMAL(20,6), not
    DOUBLE: double summation is partition-order-dependent, and an
    exact-value-hash gate cannot tolerate last-ULP drift between runs (or
    between Spark and the DuckDB oracle). The per-element weights come
    from the same pure-Python ``evaluate_pair`` on both sides, so after
    the identical per-element decimal quantization the sums are exact and
    order-free; they surface as 6-dp doubles."""
    per_type = _per_type_diagonal(metrics)
    # ONE scan for both corpus-total rows: metrics is typically an
    # uncached parse+evaluate plan (the driver-gate queries deliberately
    # avoid cache), so every extra aggregation over it re-executes the
    # full-corpus Python parse
    extra = (metrics.agg(F.sum("n_1v1").alias("b_c"),
                         F.sum("n_label").alias("b_t"),
                         F.sum("structure_right").alias("s_c"),
                         F.sum("structure_total").alias("s_t"))
             .select(F.explode(F.array(
                 F.struct(F.lit("__blocks__").alias("label_type"),
                          F.col("b_c").cast("double").alias("correct"),
                          F.col("b_t").cast("double").alias("total")),
                 F.struct(F.lit("__structure__").alias("label_type"),
                          F.col("s_c").cast("double").alias("correct"),
                          F.col("s_t").cast("double").alias("total"))))
                     .alias("r"))
             .select("r.*"))
    return (per_type.unionByName(extra)
            .withColumn("accuracy",
                        F.round(F.try_divide("correct", "total"), 6)))


def _per_type_diagonal(metrics: DataFrame) -> DataFrame:
    """Per-label-type (correct, total) diagonal sums — the single home of
    the cal_accuracy diagonal-share semantic, shared by ``cal_accuracy``
    (driver-gated) and ``per_type_accuracy`` (eval report) so the two can
    never desynchronize. DECIMAL(20,6) summation: order-free and exact
    (see cal_accuracy)."""
    conf = metrics.select(F.explode("confusion").alias("c"))
    w = F.col("c.weight").cast("decimal(20,6)")
    zero = F.lit(0).cast("decimal(20,6)")
    return (conf.groupBy(F.col("c.label_type").alias("label_type"))
            .agg(F.sum(F.when(F.col("c.label_type")
                              == F.col("c.parsed_type"), w)
                       .otherwise(zero)).alias("c_"),
                 F.sum(w).alias("t_"))
            .select("label_type",
                    F.round(F.col("c_").cast("double"), 6).alias("correct"),
                    F.round(F.col("t_").cast("double"), 6).alias("total")))


def per_type_accuracy(metrics: DataFrame) -> DataFrame:
    """Per-label-type accuracy rows (cal_accuracy,
    run_evaluation.py:1301-1321): diagonal weight / row total. Thin view
    over ``_per_type_diagonal`` — same aggregation as the driver-gated
    ``cal_accuracy``, report-friendly 4-dp weights."""
    return (_per_type_diagonal(metrics)
            .select("label_type", F.round("correct", 4).alias("correct"),
                    F.round("total", 4).alias("total"),
                    F.round(F.try_divide("correct", "total"), 6)
                    .alias("accuracy")))


def evaluation_summary(metrics: DataFrame) -> DataFrame:
    """One-row corpus summary: block-split 1v1 rate, mean edit similarity,
    overall layout accuracy (diagonal share), structure accuracy."""
    conf = metrics.select(F.explode("confusion").alias("c"))
    diag = conf.agg(
        F.sum(F.when(F.col("c.label_type") == F.col("c.parsed_type"),
                     F.col("c.weight")).otherwise(F.lit(0.0))).alias("diag"),
        F.sum("c.weight").alias("total"))
    base = metrics.agg(
        F.sum("n_label").alias("n_label"),
        F.sum("n_1v1").alias("n_1v1"),
        F.avg("mean_edit").alias("mean_edit"),
        F.sum("structure_right").alias("s_right"),
        F.sum("structure_total").alias("s_total"))
    # try_divide: a flat-tree corpus has structure_total=0 (no edges) and
    # an empty one has n_label=0 — those ratios are genuinely undefined,
    # so emit NULL instead of throwing under ANSI mode
    return base.crossJoin(diag).select(
        F.round(F.try_divide("n_1v1", "n_label"), 6).alias("block_1v1_rate"),
        F.round("mean_edit", 6).alias("mean_edit_similarity"),
        F.round(F.try_divide("diag", "total"), 6).alias("layout_accuracy"),
        F.round(F.try_divide("s_right", "s_total"), 6)
        .alias("structure_accuracy"))
