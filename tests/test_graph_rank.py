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


class TestEmbeddingCuration:
    def _mk(self, spark, rng, n=40, dim=6, labels=3):
        rows = [(i, [float(rng.uniform(-1, 1)) for _ in range(dim)],
                 int(rng.randrange(labels))) for i in range(n)]
        return rows, spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int")

    def test_outliers_match_bruteforce(self, spark):
        import math
        import random

        from bella_domify_spark.ops.ann import embedding_outliers

        rng = random.Random(7)
        rows, df = self._mk(spark, rng)
        # python model: float32 storage -> double -> floor-e6 quantize
        import numpy as np
        q = {i: [math.floor(float(np.float32(x)) * 1e6) for x in v]
             for i, v, _ in rows}
        lbl = {i: l for i, _, l in rows}
        def tdiv(a, b):
            # Spark `div` / DuckDB `//` truncate toward zero; Python //
            # floors — they differ on negative sums
            return -(-a // b) if a < 0 else a // b

        cents = {}
        for l in set(lbl.values()):
            ids = [i for i in lbl if lbl[i] == l]
            dim = len(q[ids[0]])
            cents[l] = [tdiv(sum(q[i][p] for i in ids), len(ids))
                        for p in range(dim)]
        d2 = {i: sum((a - b) ** 2 for a, b in zip(q[i], cents[lbl[i]]))
              for i in lbl}
        want = set()
        for l in cents:
            ids = sorted((i for i in lbl if lbl[i] == l),
                         key=lambda i: (-d2[i], i))[:5]
            want |= {(i, l, d2[i], r + 1) for r, i in enumerate(ids)}
        got = {(r["vec_id"], r["label"], r["dist2"], r["rnk"])
               for r in embedding_outliers(df).collect()}
        assert got == want

    def test_hard_negatives_are_nearest_other_label(self, spark):
        import math
        import random

        import numpy as np

        from bella_domify_spark.ops.ann import hard_negatives

        rng = random.Random(13)
        rows, df = self._mk(spark, rng, n=30)
        q = {i: [math.floor(float(np.float32(x)) * 1e6) for x in v]
             for i, v, _ in rows}
        lbl = {i: l for i, _, l in rows}
        got = {r["q_id"]: (r["neg_id"], r["dist2"])
               for r in hard_negatives(df).collect()}
        assert set(got) == set(range(8))
        for qi in range(8):
            cands = [(sum((a - b) ** 2 for a, b in zip(q[qi], q[c])), c)
                     for c in lbl if lbl[c] != lbl[qi]]
            best = min(cands)
            assert got[qi] == (best[1], best[0]), qi


class TestClassifierAuc:
    def test_auc_matches_sklearnless_bruteforce(self, spark):
        """AUC pinned against the O(n^2) pair-counting definition
        (ties = 0.5) on a small labeled corpus."""
        import random

        from bella_domify_spark.ops.classifier import classifier_auc

        rng = random.Random(9)
        words = ["alpha", "beta", "gamma", "delta", "spark", "join"]
        rows = [(i, " ".join(rng.choice(words)
                             for _ in range(rng.randint(0, 8))),
                 rng.choice(["en", "de", "zh"]))
                for i in range(60)]
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        from bella_domify_spark.ops.classifier import quality_classifier
        margins = {r["doc_id"]: r["margin"]
                   for r in quality_classifier(docs).collect()}
        y = {i: 1 if lang == "en" else 0 for i, _, lang in rows}
        pos = [margins[i] for i in y if y[i] == 1]
        neg = [margins[i] for i in y if y[i] == 0]
        u2 = sum(2 if p > n else (1 if p == n else 0)
                 for p in pos for n in neg)
        row = classifier_auc(docs).collect()[0]
        assert (row["n_pos"], row["n_neg"]) == (len(pos), len(neg))
        assert row["u2"] == u2
        import math
        assert row["auc_e9"] == math.floor(
            u2 / (2 * len(pos) * len(neg)) * 1e9)


class TestEventAnalytics:
    def test_chi2_matches_python(self, spark):
        import math

        from bella_domify_spark.ops.analyze import ab_conversion_chi2

        # hand-built: variant A 3/5 convert, variant B 1/5
        rows, eid = [], 0
        for u in range(10):
            conv = (u % 2 == 0 and u < 6) or (u % 2 == 1 and u == 1)
            for k in range(2):
                rows.append((eid, f"2024-01-0{1 + k} 00:00:00", u,
                             "purchase" if conv and k == 0 else "view"))
                eid += 1
        ev = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string") \
            .select("event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
                    "user_id", "event_type")
        r = ab_conversion_chi2(ev).collect()[0]
        a, b, c, d = (r["conv_a"], r["nonconv_a"], r["conv_b"], r["nonconv_b"])
        assert (a, b, c, d) == (3, 2, 1, 4)
        n = a + b + c + d
        want = math.floor(n * (a * d - b * c) ** 2
                          / ((a + b) * (c + d) * (a + c) * (b + d)) * 1e6)
        assert r["chi2_e6"] == want

    def test_trigrams_count_consecutive_sequences(self, spark):
        from bella_domify_spark.ops.transcript import event_trigrams

        seq = ["view", "click", "purchase", "view", "click", "purchase"]
        rows = [(i, f"2024-01-01 00:00:{i:02d}", 1, seq[i])
                for i in range(len(seq))]
        ev = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, event_type string") \
            .select("event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
                    "user_id", "event_type")
        got = {(r["e1"], r["e2"], r["e3"]): (r["cnt"], r["rnk"])
               for r in event_trigrams(ev).collect()}
        assert got[("view", "click", "purchase")] == (2, 1)
        assert sum(c for c, _ in got.values()) == 4  # n-2 windows


class TestCuped:
    def test_matches_python_recompute(self, spark):
        import math
        import random

        from bella_domify_spark.ops.analyze import cuped_adjusted

        rng = random.Random(21)
        base_min = 0
        rows, eid = [], 0
        # 12 users, correlated pre/live spend so theta is meaningful
        for u in range(12):
            level = rng.uniform(1, 50)
            for k in range(6):
                half = 0 if k < 3 else 1
                rows.append((eid, u, level + rng.uniform(0, 5),
                             base_min + (10 * half + k)))
                eid += 1
        ev = spark.createDataFrame(
            [(e, u, v, f"2024-01-01 00:{m:02d}:00") for e, u, v, m in rows],
            "event_id long, user_id long, value double, ts string") \
            .select("event_id", "user_id", "value",
                    F.col("ts").cast("timestamp_ntz").alias("ts"))
        got = {r["variant"]: r for r in cuped_adjusted(ev).collect()}

        # python model (same integer sums, same double shape)
        us = {}
        lo = min(m for _, _, _, m in rows)
        hi = max(m for _, _, _, m in rows)
        mid = (lo + hi) // 2
        for _, u, v, m in rows:
            cents = math.floor(v * 100)
            x, y = us.get(u, (0, 0))
            if m <= mid:
                x += cents
            else:
                y += cents
            us[u] = (x, y)
        n = len(us)
        sx = sum(x for x, _ in us.values())
        sy = sum(y for _, y in us.values())
        sxy = sum(x * y for x, y in us.values())
        sxx = sum(x * x for x, _ in us.values())
        theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        for variant in (0, 1):
            ids = [u for u in us if u % 2 == variant]
            nv = len(ids)
            sxv = sum(us[u][0] for u in ids)
            syv = sum(us[u][1] for u in ids)
            r = got[variant]
            assert r["n_users"] == nv
            assert (r["sum_x_cents"], r["sum_y_cents"]) == (sxv, syv)
            assert r["theta_e6"] == math.floor(theta * 1e6)
            adj = syv / nv - theta * (sxv / nv - sx / n)
            assert r["mean_adj_e6"] == math.floor(adj * 1e6)


class TestTriangles:
    def test_matches_bruteforce_on_random_graph(self, spark):
        import itertools
        import random

        from bella_domify_spark.ops.graph import triangle_stats

        rng = random.Random(17)
        n = 16
        edges = sorted({(a, b) for a in range(n) for b in range(a + 1, n)
                        if rng.random() < 0.3})
        adj = {v: set() for v in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        tri = sum(1 for a, b, c in itertools.combinations(range(n), 3)
                  if b in adj[a] and c in adj[a] and c in adj[b])
        wedges = sum(len(adj[v]) * (len(adj[v]) - 1) // 2 for v in adj)
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        r = triangle_stats(pairs).collect()[0]
        assert r["n_edges"] == len(edges)
        assert r["n_wedges"] == wedges
        assert r["n_triangles"] == tri
        import math
        assert r["global_cc_e6"] == math.floor(3 * tri / wedges * 1e6)

    def test_known_shapes(self, spark):
        from bella_domify_spark.ops.graph import triangle_stats

        # K4: 4 triangles, 12 wedges, cc = 1
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        r = triangle_stats(
            spark.createDataFrame(k4, "id_a long, id_b long")).collect()[0]
        assert (r["n_triangles"], r["n_wedges"]) == (4, 12)
        assert r["global_cc_e6"] == 1_000_000
        # star: no triangles, cc = 0
        star = [(0, i) for i in range(1, 5)]
        r = triangle_stats(
            spark.createDataFrame(star, "id_a long, id_b long")).collect()[0]
        assert (r["n_triangles"], r["global_cc_e6"]) == (0, 0)


class TestZipfSkewGraph:
    """Celebrity-node safety of the iterative layer (VERDICT r5 task 6):
    a Zipf-degree graph where one hub carries ~50% of all edges — the
    shape that breaks naive wedge enumeration (hub wedges = C(deg, 2))
    and the shape the degree-ordered orientation exists for."""

    def _skew_graph(self):
        import random

        rng = random.Random(4242)
        edges = set()
        hub_n = 150
        for i in range(1, hub_n + 1):
            edges.add((0, i))                       # hub spokes
        for i in range(1, hub_n):
            if rng.random() < 0.5:
                edges.add((i, i + 1))               # closes hub triangles
        for _ in range(60):                         # background sparse edges
            a = rng.randrange(1, 201)
            b = rng.randrange(1, 201)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        return sorted(edges), 201

    def _py_triangles(self, edges, n):
        adj = [set() for _ in range(n)]
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        tri = 0
        for a, b in edges:
            tri += sum(1 for c in (adj[a] & adj[b]) if c > max(a, b))
        wedges = sum(len(adj[v]) * (len(adj[v]) - 1) // 2 for v in range(n))
        return tri, wedges

    def test_triangle_stats_on_hub_graph(self, spark):
        from bella_domify_spark.ops.graph import triangle_stats

        edges, n = self._skew_graph()
        tri, wedges = self._py_triangles(edges, n)
        assert tri > 40  # the hub actually closes many triangles
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        row = triangle_stats(pairs).collect()[0]
        assert row["n_edges"] == len(edges)
        assert row["n_wedges"] == wedges
        assert row["n_triangles"] == tri
        assert row["global_cc_e6"] == 3 * tri * 10**6 // wedges

    def test_orientation_bounds_the_wedge_join(self, spark):
        # the scale claim at graph.py:256-263, measured: under (deg, id)
        # orientation the hub is never a wedge apex, so the join input
        # Sum(out_deg^2) collapses vs the naive Sum(deg^2)
        edges, n = self._skew_graph()
        deg = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        key = {v: (d, v) for v, d in deg.items()}
        out = {}
        for a, b in edges:
            s = a if key[a] < key[b] else b
            out[s] = out.get(s, 0) + 1
        m = len(edges)
        naive = sum(d * d for d in deg.values())
        oriented = sum(o * o for o in out.values())
        max_out = max(out.values())
        # hub (deg ~150, 50% of edges) contributes 150^2=22500 naively;
        # oriented it is the LARGEST key so its out-degree is 0. Measured
        # on this graph: naive ~24k, oriented ~1k, max out-degree ~sqrt(2m)
        assert out.get(0, 0) == 0
        assert oriented * 10 < naive, (oriented, naive)
        assert max_out <= int((2 * m) ** 0.5) + 3, (max_out, m)

    def test_pagerank_on_hub_graph(self, spark):
        from bella_domify_spark.ops.graph import pagerank

        edges, n = self._skew_graph()
        exp_r, exp_deg = _py_pagerank(n, edges)
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        nodes = spark.createDataFrame([(i,) for i in range(n)],
                                      "doc_id long")
        got = {r["doc_id"]: (r["deg"], r["rank_e12"])
               for r in pagerank(pairs, nodes).collect()}
        assert got == {v: (exp_deg.get(v, 0), exp_r[v]) for v in range(n)}
        # the hub outranks every spoke
        hub_rank = got[0][1]
        assert all(hub_rank > rk for v, (_, rk) in got.items() if v != 0)


class TestLinkPrediction:
    # square 1-2-3-4 plus hub 9 adjacent to all four corners
    _EDGES = [(1, 2), (2, 3), (3, 4), (1, 4),
              (1, 9), (2, 9), (3, 9), (4, 9)]

    def test_square_diagonals_predicted(self, spark):
        from bella_domify_spark.ops.graph import link_prediction

        pairs = spark.createDataFrame(self._EDGES, "id_a long, id_b long")
        got = {(r["id_a"], r["id_b"]): (r["n_common"], r["deg_a"],
                                        r["deg_b"], r["nb_jaccard_e9"])
               for r in link_prediction(pairs).collect()}
        # diagonals see 3 common neighbors (two corners + the hub),
        # degrees 3 each -> jaccard 3/(3+3-3) = 1.0
        assert got == {(1, 3): (3, 3, 3, 1_000_000_000),
                       (2, 4): (3, 3, 3, 1_000_000_000)}

    def test_hub_cap_drops_hub_wedges_not_hub_degrees(self, spark):
        from bella_domify_spark.ops.graph import link_prediction

        pairs = spark.createDataFrame(self._EDGES, "id_a long, id_b long")
        got = {(r["id_a"], r["id_b"]): (r["n_common"], r["nb_jaccard_e9"])
               for r in link_prediction(pairs, max_center_deg=3).collect()}
        # hub (deg 4) no longer certifies wedges: diagonals drop to 2
        # common corners; degrees still count hub edges -> 2/(3+3-2)
        assert got == {(1, 3): (2, 500_000_000),
                       (2, 4): (2, 500_000_000)}


class TestCooccurrencePairs:
    def test_shared_rare_trigrams(self, spark):
        from bella_domify_spark.ops.dedup import cooccurrence_pairs

        df = spark.createDataFrame(
            [(1, "a b c d"),            # trigrams: abc, bcd
             (2, "a b c d e"),          # abc, bcd, cde
             (3, "x y a b c")],         # xya, yab, abc (1 shared only)
            "doc_id long, text string")
        got = {(r["id_a"], r["id_b"]): r["n_common"]
               for r in cooccurrence_pairs(df, min_common=2).collect()}
        assert got == {(1, 2): 2}


class TestKCorePeel:
    def test_triangle_survives_tail_peels(self, spark):
        from bella_domify_spark.ops.graph import kcore_peel

        # triangle 1-2-3 with a tail 3-4-5: peel 1 drops 5 (deg 1),
        # peel 2 drops 4 (induced deg 1), peel 3 leaves the triangle
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)],
            "id_a long, id_b long")
        got = {r["node_id"]: r["core_deg"]
               for r in kcore_peel(pairs, k=2, rounds=3).collect()}
        assert got == {1: 2, 2: 2, 3: 2}

    def test_chain_fully_peels(self, spark):
        from bella_domify_spark.ops.graph import kcore_peel

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long")
        assert kcore_peel(pairs, k=2, rounds=3).count() == 0

    def test_matches_bruteforce_peel(self, spark):
        import random
        from bella_domify_spark.ops.graph import kcore_peel

        rng = random.Random(7)
        edges = sorted({(a, b) for _ in range(60)
                        for a, b in [sorted(rng.sample(range(16), 2))]})
        edges = [(a, b) for a, b in edges]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")

        # brute-force 3-round peel
        alive = {v for e in edges for v in e}
        deg = {}
        for _ in range(3):
            deg = {v: 0 for v in alive}
            for a, b in edges:
                if a in alive and b in alive:
                    deg[a] += 1
                    deg[b] += 1
            alive = {v for v in alive if deg[v] >= 2}
        want = {v: deg[v] for v in alive}

        got = {r["node_id"]: r["core_deg"]
               for r in kcore_peel(pairs, k=2, rounds=3).collect()}
        assert got == want


class TestNeighborhoodSizes:
    def test_path_graph_hand_counted(self, spark):
        from bella_domify_spark.ops.graph import neighborhood_sizes

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "id_a long, id_b long")
        got = {r["node_id"]: r["ball_size"]
               for r in neighborhood_sizes(pairs, radius=2).collect()}
        assert got == {1: 2, 2: 3, 3: 4, 4: 3, 5: 2}

    def test_matches_bruteforce_bfs(self, spark):
        import random
        from bella_domify_spark.ops.graph import neighborhood_sizes

        rng = random.Random(13)
        edges = sorted({(a, b) for _ in range(50)
                        for a, b in [sorted(rng.sample(range(14), 2))]})
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")

        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        want = {}
        for v, nbrs in adj.items():
            ball = set(nbrs)
            for u in nbrs:
                ball |= adj[u]
            ball.discard(v)
            want[v] = len(ball)

        got = {r["node_id"]: r["ball_size"]
               for r in neighborhood_sizes(pairs, radius=2).collect()}
        assert got == want


class TestLpaCommunities:
    def test_bridged_cliques_split(self, spark):
        from bella_domify_spark.ops.graph import lpa_communities

        # two triangles bridged by a single edge 3-4: LPA keeps them as
        # separate communities even though they are one CC
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
            "id_a long, id_b long")
        got = {r["node_id"]: r["community"]
               for r in lpa_communities(pairs, rounds=3).collect()}
        assert len(set(got.values())) >= 2
        assert got[1] == got[2] == got[3]
        assert got[4] == got[5] == got[6]
        assert got[1] != got[4]

    def test_matches_bruteforce_sync_lpa(self, spark):
        import random
        from collections import Counter
        from bella_domify_spark.ops.graph import lpa_communities

        rng = random.Random(11)
        edges = sorted({(a, b) for _ in range(60)
                        for a, b in [sorted(rng.sample(range(16), 2))]})
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")

        # brute-force 3-round synchronous modal propagation
        adj = {}
        for a, b in edges:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        lab = {v: v for v in adj}
        for _ in range(3):
            nxt = {}
            for v, nbrs in adj.items():
                c = Counter(lab[n] for n in nbrs)
                best = max(c.values())
                nxt[v] = min(l for l, n in c.items() if n == best)
            lab = nxt

        got = {r["node_id"]: r["community"]
               for r in lpa_communities(pairs, rounds=3).collect()}
        assert got == lab
