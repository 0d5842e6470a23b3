"""Unit tests for ops/graph.py pagerank and ops/analyze.py table stats.

pagerank is pinned against a pure-Python integer power iteration on a
hand-built graph (so the oracle SQL and the Spark plan can both regress
independently of each other); analyze_table_stats against hand-counted
column facts with NULLs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SCALE = 10 ** 12


def _py_pagerank(n_nodes, edges, iters=3, scale=SCALE):
    """Reference integer PageRank: nodes 0..n-1, undirected edge list."""
    sym = edges + [(b, a) for a, b in edges]
    deg = {}
    for s, _ in sym:
        deg[s] = deg.get(s, 0) + 1
    base = ((3 * scale) // 20) // n_nodes
    r = {v: scale // n_nodes for v in range(n_nodes)}
    for _ in range(iters):
        c = {}
        for s, d in sym:
            c[d] = c.get(d, 0) + r[s] // deg[s]
        r = {v: base + (17 * c.get(v, 0)) // 20 for v in range(n_nodes)}
    return r, deg


class TestPagerank:
    def test_matches_python_reference(self, spark):
        from bella_domify_spark.ops.graph import pagerank

        # a triangle, a pendant, and two singletons
        edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
        n = 6
        want_r, want_deg = _py_pagerank(n, edges)
        nodes = spark.createDataFrame([(i,) for i in range(n)],
                                      "doc_id long")
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r["doc_id"]: r for r in pagerank(pairs, nodes).collect()}
        assert len(got) == n
        for v in range(n):
            assert got[v]["rank_e12"] == want_r[v], v
            assert got[v]["deg"] == want_deg.get(v, 0), v
        # structure sanity: the triangle hub with the pendant outranks
        # the pendant, and every connected node outranks singletons
        assert got[2]["rank_e12"] > got[3]["rank_e12"]
        assert min(got[v]["rank_e12"] for v in range(4)) > got[4]["rank_e12"]

    def test_mass_conservation_bound(self, spark):
        from bella_domify_spark.ops.graph import pagerank

        # a 4-cycle: regular graph, no truncation skew -> all ranks equal
        edges = [(0, 1), (1, 2), (2, 3), (3, 0)]
        nodes = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        ranks = {r["doc_id"]: r["rank_e12"]
                 for r in pagerank(pairs, nodes).collect()}
        assert len(set(ranks.values())) == 1


class TestAnalyzeTableStats:
    def test_hand_counted_columns(self, spark):
        from bella_domify_spark.ops.analyze import analyze_table_stats

        rows = [
            (1, "2024-01-01 00:00:00", 10, "click", 1.5, '{"a":1}'),
            (2, "2024-01-02 00:00:00", 10, "view", None, '{"a":2}'),
            (3, None, 20, "click", -0.25, None),
            (4, "2024-01-04 00:00:00", None, "buy", 2.0, '{"b":3}'),
        ]
        ev = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string,"
                  " value double, props string") \
            .select("event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
                    "user_id", "event_type", "value", "props")
        got = {r["col"]: r for r in analyze_table_stats(ev).collect()}
        assert set(got) == {"event_id", "user_id", "value_e6", "ts_us",
                            "event_type", "props"}
        assert all(r["n_rows"] == 4 for r in got.values())
        assert (got["event_id"]["n_nulls"], got["event_id"]["ndv"]) == (0, 4)
        assert (got["user_id"]["n_nulls"], got["user_id"]["ndv"]) == (1, 2)
        assert (got["value_e6"]["n_nulls"], got["value_e6"]["ndv"]) == (1, 3)
        assert got["value_e6"]["min_i"] == -250000       # floor(-0.25e6)
        assert got["value_e6"]["max_i"] == 2000000
        assert (got["ts_us"]["n_nulls"], got["ts_us"]["ndv"]) == (1, 3)
        assert got["event_type"]["min_s"] == "buy"
        assert got["event_type"]["max_s"] == "view"
        assert got["event_type"]["sum_len"] == 5 + 4 + 5 + 3
        assert got["props"]["n_nulls"] == 1
        assert got["props"]["min_i"] is None  # string col: no int extrema

    def test_single_aggregate_plan(self, spark):
        import contextlib
        import io

        from bella_domify_spark.ops.analyze import analyze_table_stats

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            analyze_table_stats(ev).explain()
        plan = buf.getvalue()
        # one scan of the parquet, expand-based distinct, no Python
        assert plan.count("FileScan parquet") == 1
        assert "BatchEvalPython" not in plan
