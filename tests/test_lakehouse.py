"""Unit tests for ops/lakehouse.py (CDC merge, Z-order layout) and
ops/classifier.py (hashed linear quality classifier).

Oracle equality at sf0.01/sf0.1 lives in tools/check_oracle.py; these pin
the semantics on hand-built rows plus pure-Python recomputations of the
Morton code and the classifier margin, so a regression points at the
operator rather than at the oracle SQL.
"""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F


def _rows(df, *cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


class TestMergeUpsert:
    def test_last_writer_wins_tombstones_and_inserts(self, spark):
        from bella_domify_spark.ops.lakehouse import merge_upsert

        base = spark.createDataFrame(
            [(1, "one"), (2, "two"), (3, "three")], "doc_id long, text string")
        changes = spark.createDataFrame(
            [
                (1, 10, "U", "one-v10"),
                (1, 20, "U", "one-v20"),   # later version wins
                (2, 5, "D", None),          # tombstone drops key 2
                (4, 7, "U", "four-new"),   # fresh insert
                (5, 3, "U", "five-v3"),
                (5, 9, "D", None),          # insert then delete -> absent
            ],
            "doc_id long, version long, op string, text string")
        got = _rows(merge_upsert(base, changes),
                    "doc_id", "final_version", "n_ops", "text")
        assert got == [
            (1, 20, 3, "one-v20"),
            (3, -1, 1, "three"),
            (4, 7, 1, "four-new"),
        ]

    def test_delete_then_update_resurrects(self, spark):
        from bella_domify_spark.ops.lakehouse import merge_upsert

        base = spark.createDataFrame([(1, "one")], "doc_id long, text string")
        changes = spark.createDataFrame(
            [(1, 10, "D", None), (1, 11, "U", "back")],
            "doc_id long, version long, op string, text string")
        got = _rows(merge_upsert(base, changes),
                    "doc_id", "final_version", "n_ops", "text")
        assert got == [(1, 11, 3, "back")]


def _morton(q1: int, q2: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((q1 >> i) & 1) << (2 * i + 1)
        z |= ((q2 >> i) & 1) << (2 * i)
    return z


class TestZorder:
    def test_interleave_matches_python_both_engines(self, spark):
        from bella_domify_spark.ops.lakehouse import _interleave_expr

        cases = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321),
                 (65535, 0), (0, 65535), (32768, 1)]
        df = spark.createDataFrame(cases, "q1 long, q2 long")
        got = {(r["q1"], r["q2"]): r["z"] for r in df.select(
            "q1", "q2",
            F.expr(_interleave_expr("q1", "q2", "spark")).alias("z"),
        ).collect()}
        import duckdb
        sql = _interleave_expr("q1", "q2", "duckdb")
        for q1, q2 in cases:
            want = _morton(q1, q2)
            assert got[(q1, q2)] == want, (q1, q2)
            (dk,) = duckdb.sql(
                f"SELECT {sql} FROM (SELECT {q1}::BIGINT AS q1,"
                f" {q2}::BIGINT AS q2)"
            ).fetchone()
            assert dk == want, (q1, q2)

    def test_layout_stats_and_pruning(self, spark):
        from bella_domify_spark.ops.lakehouse import zorder_layout

        # Two clusters at opposite corners of the (ts, value) plane: the
        # min/max quantiles put them in far-apart Morton buckets, and the
        # low-corner cluster must be prunable for the centre-quarter box.
        rows = []
        for i in range(50):
            rows.append((i, f"2024-01-01 00:00:{i % 60:02d}.{i:06d}",
                         0.001 * i))
        for i in range(50):
            rows.append((100 + i, f"2024-06-01 00:00:{i % 60:02d}.{i:06d}",
                         900.0 + 0.001 * i))
        ev = spark.createDataFrame(rows, "event_id long, ts string, value double") \
                  .select("event_id",
                          F.col("ts").cast("timestamp_ntz").alias("ts"),
                          "value")
        out = zorder_layout(ev).collect()
        assert sum(r["n_rows"] for r in out) == 100
        # extreme corners land in the extreme buckets
        bucket_ids = {r["bucket_id"] for r in out}
        assert 0 in bucket_ids and 1023 in bucket_ids
        for r in out:
            assert 0 <= r["min_q1"] <= r["max_q1"] <= 65535
            assert 0 <= r["min_q2"] <= r["max_q2"] <= 65535
            # both clusters hug the corners -> every bucket misses the
            # centre-quarter box and is prunable
            assert r["pruned"] == 1

    def test_null_dims_dropped(self, spark):
        from bella_domify_spark.ops.lakehouse import zorder_layout

        ev = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", None),
             (2, None, 1.0),
             (3, "2024-01-02 00:00:00", 2.0),
             (4, "2024-01-03 00:00:00", 3.0)],
            "event_id long, ts string, value double") \
            .select("event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
                    "value")
        out = zorder_layout(ev).collect()
        assert sum(r["n_rows"] for r in out) == 2


def _py_margin(text: str) -> tuple[int, int]:
    """Pure-Python recomputation of the classifier margin."""
    from bella_domify_spark.ops.classifier import _W_A, _W_B, _W_RANGE
    from bella_domify_spark.ops.hashfamily import MERSENNE_P

    ws = [w for w in text.lower().split() if w]
    feats = ws + [f"{a}_{b}" for a, b in zip(ws, ws[1:])]
    margin = 0
    for t in feats:
        x = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        margin += ((_W_A * (x % MERSENNE_P) + _W_B)
                   % MERSENNE_P) % _W_RANGE - 1000
    return len(feats), margin


class TestQualityClassifier:
    def test_margin_matches_python(self, spark):
        from bella_domify_spark.ops.classifier import quality_classifier

        texts = [
            (1, "The quick brown fox jumps over the lazy dog"),
            (2, "spark spark spark"),
            (3, "a"),
            (4, ""),
            (5, None),
            (6, "Mixed CASE   and\tmultiple   spaces here"),
        ]
        docs = spark.createDataFrame(texts, "doc_id long, text string")
        got = {r["doc_id"]: r for r in quality_classifier(docs).collect()}
        for doc_id, text in texts:
            n, margin = _py_margin(text or "")
            assert got[doc_id]["n_feats"] == n, doc_id
            assert got[doc_id]["margin"] == margin, doc_id
            assert got[doc_id]["label"] == ("keep" if margin > 0 else "drop")

    def test_zero_shuffle_plan(self, spark):
        import io, contextlib
        from bella_domify_spark.ops.classifier import quality_classifier

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            quality_classifier(docs).explain()
        plan = buf.getvalue()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan


class TestCalibrationBins:
    def test_bins_match_python_recount(self, spark):
        from bella_domify_spark.ops.classifier import (calibration_bins,
                                                       quality_classifier)

        rows = [(i, f"doc {i} body words number {i % 3}",
                 "en" if i % 2 == 0 else "fr") for i in range(12)]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, lang string")
        margins = {r["doc_id"]: r["margin"]
                   for r in quality_classifier(docs).collect()}
        import collections, math
        exp = collections.defaultdict(lambda: [0, 0, 0])
        for i, _, lang in rows:
            b = math.floor(margins[i] / 1000)
            exp[b][0] += 1
            exp[b][1] += 1 if lang == "en" else 0
            exp[b][2] += margins[i]
        got = {r["bucket"]: (r["n"], r["n_pos"], r["sum_margin"],
                             r["pos_rate_e9"])
               for r in calibration_bins(docs).collect()}
        assert set(got) == set(exp)
        for b, (n, npos, sm) in exp.items():
            assert got[b] == (n, npos, sm, math.floor(npos / n * 1e9))

    def test_zero_join_zero_python_plan(self, spark):
        import io, contextlib
        from bella_domify_spark.ops.classifier import calibration_bins

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            calibration_bins(docs).explain()
        plan = buf.getvalue()
        assert "Join" not in plan          # truth label rides passthrough
        assert "BatchEvalPython" not in plan


class TestPositionDeletes:
    def test_mor_accounting_hand_counted(self, spark):
        from bella_domify_spark.ops.lakehouse import position_deletes

        data = spark.createDataFrame(
            [(0, 0, 10), (0, 1, 20), (0, 2, 30), (1, 0, 5)],
            "file_id long, pos long, value_e3 long")
        deletes = spark.createDataFrame(
            [(0, 1), (0, 1),      # stacked delete files duplicate entries
             (2, 0)],             # dangling delete: file 2 has no data
            "file_id long, pos long")
        got = _rows(position_deletes(data, deletes),
                    "file_id", "n_rows", "n_deleted", "n_live",
                    "live_value_sum")
        assert got == [(0, 3, 1, 2, 40), (1, 1, 0, 1, 5)]


class TestIncrementalViewUpdate:
    def _direct(self, spark, base_rows, change_rows):
        """Recompute the view from the merged table via merge_upsert —
        the independent strategy the incremental path must match."""
        from bella_domify_spark.ops.lakehouse import merge_upsert

        base = spark.createDataFrame(base_rows, "doc_id long, text string")
        ch = spark.createDataFrame(
            change_rows, "doc_id long, version long, op string, text string")
        merged = merge_upsert(base, ch)
        want = _rows(
            merged.groupBy(F.expr("doc_id % 16").alias("g"))
                  .agg(F.count(F.lit(1)).alias("n_docs"),
                       F.sum(F.coalesce(F.length("text"), F.lit(0)))
                        .alias("n_chars")),
            "g", "n_docs", "n_chars")
        from bella_domify_spark.ops.lakehouse import incremental_view_update
        got = _rows(incremental_view_update(base, ch),
                    "g", "n_docs", "n_chars")
        assert got == want, (got, want)

    def test_matches_full_recompute(self, spark):
        base = [(i, "x" * (i + 1)) for i in range(40)]
        changes = [
            (1, 10, "U", "longer-text-now"),
            (1, 11, "U", "final"),         # LWW within a key
            (2, 5, "D", None),              # delete existing
            (77, 7, "U", "insert-new"),    # fresh insert
            (78, 8, "D", None),             # delete missing key: no-op
            (3, 9, "U", None),              # update to NULL text: len 0
            (99, 1, "U", "in"), (99, 2, "D", None),  # insert then delete
        ]
        self._direct(spark, base, changes)

    def test_group_emptied_drops_out(self, spark):
        # group 5 holds only doc 5; deleting it must remove the g=5 row
        base = [(5, "five"), (6, "six")]
        changes = [(5, 1, "D", None)]
        self._direct(spark, base, changes)


class TestDsirWeights:
    def test_target_docs_score_higher(self, spark):
        from bella_domify_spark.ops.dsir import dsir_weights

        # two sharply different vocabularies: en docs repeat 'alpha beta',
        # others repeat 'gamma delta' -> en docs must carry higher logw
        rows = []
        for i in range(20):
            rows.append((i, "alpha beta " * 5, "en"))
        for i in range(20, 40):
            rows.append((i, "gamma delta " * 5, "de"))
        docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = dsir_weights(docs).collect()
        t = [r["logw_e9"] for r in out if r["is_target"]]
        r = [r["logw_e9"] for r in out if not r["is_target"]]
        assert min(t) > max(r)

    def test_featureless_doc_scores_zero(self, spark):
        from bella_domify_spark.ops.dsir import dsir_weights

        docs = spark.createDataFrame(
            [(1, "some words here", "en"), (2, "", "de"), (3, None, "en")],
            "doc_id long, text string, lang string")
        got = {r["doc_id"]: r for r in dsir_weights(docs).collect()}
        assert len(got) == 3
        for d in (2, 3):
            assert got[d]["n_feats"] == 0 and got[d]["logw_e9"] == 0


class TestMergeFuzz:
    def test_merge_and_ivm_match_python_lww(self, spark):
        """Seeded random base+changelog (NULL texts, inserts, deletes,
        multi-update keys) vs a pure-Python LWW model: merge_upsert must
        equal dict-replay, incremental_view_update must equal the grouped
        recompute of that replay."""
        import random

        from bella_domify_spark.ops.lakehouse import (
            incremental_view_update, merge_upsert)

        for seed in (3, 11):
            rng = random.Random(seed)
            base_rows = [(k, "b" * rng.randint(1, 30))
                         for k in range(60) if rng.random() < 0.8]
            versions = list(range(200))
            rng.shuffle(versions)
            ch_rows = []
            for v in versions:
                k = rng.randrange(120)
                op = "D" if rng.random() < 0.25 else "U"
                text = (None if op == "D" or rng.random() < 0.1
                        else "u" * rng.randint(0, 25))
                ch_rows.append((k, v, op, text))

            # python LWW replay
            state = {k: (-1, t) for k, t in base_rows}
            n_ops = {k: 1 for k, _ in base_rows}
            win = dict(state)
            for k, v, op, text in ch_rows:
                n_ops[k] = n_ops.get(k, 0) + 1
                cur = win.get(k)
                if cur is None or v > cur[0]:
                    win[k] = (v, text if op == "U" else ("D",))
            alive = {k: (v, t) for k, (v, t) in win.items() if t != ("D",)}
            want_merge = sorted((k, v, n_ops[k], t)
                                for k, (v, t) in alive.items())
            view = {}
            for k, (v, t) in alive.items():
                g = k % 16
                n, ch = view.get(g, (0, 0))
                view[g] = (n + 1, ch + len(t or ""))
            want_view = sorted((g, n, ch) for g, (n, ch) in view.items())

            base = spark.createDataFrame(base_rows,
                                         "doc_id long, text string")
            ch = spark.createDataFrame(
                ch_rows, "doc_id long, version long, op string, text string")
            got_merge = _rows(merge_upsert(base, ch),
                              "doc_id", "final_version", "n_ops", "text")
            assert got_merge == want_merge, f"merge seed {seed}"
            got_view = _rows(incremental_view_update(base, ch),
                             "g", "n_docs", "n_chars")
            assert got_view == want_view, f"ivm seed {seed}"


class TestScd2History:
    def test_intervals_chain_and_close(self, spark):
        from bella_domify_spark.ops.lakehouse import scd2_history

        base = spark.createDataFrame([(1, "one"), (2, "two")],
                                     "doc_id long, text string")
        changes = spark.createDataFrame(
            [
                (1, 10, "U", "one-b"),
                (1, 20, "U", "one-c"),
                (2, 5, "D", None),            # delete closes, no current
                (3, 7, "U", "three"),         # insert: open interval
                (4, 1, "U", "four"),
                (4, 2, "D", None),
                (4, 3, "U", "four-back"),     # resurrect after delete
            ],
            "doc_id long, version long, op string, text string")
        got = _rows(scd2_history(base, changes),
                    "doc_id", "valid_from", "valid_to", "text", "is_current")
        assert got == [
            (1, -1, 10, "one", 0),
            (1, 10, 20, "one-b", 0),
            (1, 20, None, "one-c", 1),
            (2, -1, 5, "two", 0),
            (3, 7, None, "three", 1),
            (4, 1, 2, "four", 0),
            (4, 3, None, "four-back", 1),
        ]

    def test_current_rows_equal_merge_result(self, spark):
        """Cross-operator invariant: SCD2's open intervals ARE the merged
        snapshot (same keys, same winning text)."""
        import random

        from bella_domify_spark.ops.lakehouse import merge_upsert, scd2_history

        rng = random.Random(5)
        base_rows = [(k, f"b{k}") for k in range(30)]
        versions = list(range(80))
        rng.shuffle(versions)
        ch_rows = [(rng.randrange(60), v,
                    "D" if rng.random() < 0.3 else "U", f"u{v}")
                   for v in versions]
        base = spark.createDataFrame(base_rows, "doc_id long, text string")
        ch = spark.createDataFrame(
            ch_rows, "doc_id long, version long, op string, text string")
        cur = _rows(scd2_history(base, ch).filter("is_current = 1"),
                    "doc_id", "text")
        merged = _rows(merge_upsert(base, ch), "doc_id", "text")
        assert cur == merged


class TestEdgeCases:
    def test_merge_and_ivm_empty_changelog(self, spark):
        from bella_domify_spark.ops.lakehouse import (
            incremental_view_update, merge_upsert)

        base = spark.createDataFrame([(1, "one"), (17, "seventeen")],
                                     "doc_id long, text string")
        empty = spark.createDataFrame(
            [], "doc_id long, version long, op string, text string")
        got = _rows(merge_upsert(base, empty),
                    "doc_id", "final_version", "n_ops", "text")
        assert got == [(1, -1, 1, "one"), (17, -1, 1, "seventeen")]
        view = _rows(incremental_view_update(base, empty),
                     "g", "n_docs", "n_chars")
        assert view == [(1, 2, 3 + 9)]  # 1 and 17 share g=1

    def test_zorder_degenerate_constant_dims(self, spark):
        from bella_domify_spark.ops.lakehouse import zorder_layout

        ev = spark.createDataFrame(
            [(i, "2024-01-01 00:00:00", 5.0) for i in range(10)],
            "event_id long, ts string, value double") \
            .select("event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
                    "value")
        out = zorder_layout(ev).collect()
        # zero span on both dims: greatest(1, ...) guards the division,
        # everything quantizes to (0, 0) -> one bucket, prunable
        assert len(out) == 1
        r = out[0]
        assert (r["bucket_id"], r["n_rows"]) == (0, 10)
        assert (r["min_q1"], r["max_q1"], r["min_q2"], r["max_q2"]) == \
            (0, 0, 0, 0)
        assert r["pruned"] == 1

    def test_scd2_empty_changelog_all_current(self, spark):
        from bella_domify_spark.ops.lakehouse import scd2_history

        base = spark.createDataFrame([(1, "one")], "doc_id long, text string")
        empty = spark.createDataFrame(
            [], "doc_id long, version long, op string, text string")
        got = _rows(scd2_history(base, empty),
                    "doc_id", "valid_from", "valid_to", "text", "is_current")
        assert got == [(1, -1, None, "one", 1)]


class TestCompactFiles:
    def _pack_python(self, files, target):
        """Reference next-fit-decreasing by cumulative sum, per part."""
        out = {}
        by_part = {}
        for part, fid, size in files:
            by_part.setdefault(part, []).append((fid, size))
        for part, fs in by_part.items():
            cum = 0
            for fid, size in sorted(fs, key=lambda t: (-t[1], t[0])):
                out[(part, fid)] = cum // target
                cum += size
        return out

    def test_matches_python_packing(self, spark):
        from bella_domify_spark.ops.lakehouse import compact_files

        files = [("a", i, 100 + (i * 37) % 300) for i in range(40)] + \
                [("b", i, 50 + (i * 91) % 500) for i in range(25)]
        mf = spark.createDataFrame(
            files, "part string, file_id long, size_bytes long")
        got = {(r["part"], r["file_id"]): r["out_bucket"]
               for r in compact_files(mf, target_bytes=512).collect()}
        assert got == self._pack_python(files, 512)
        # cumulative-packing fill invariant: if any file landed past
        # bucket b, then buckets 0..b together hold >= (b+1)*target —
        # i.e. no under-filled prefix (individual buckets may dip below
        # target only by inheriting a predecessor's overshoot)
        totals = {}
        sizes = {(p, f): s for p, f, s in files}
        for (p, f), b in got.items():
            totals[(p, b)] = totals.get((p, b), 0) + sizes[(p, f)]
        parts = {p for p, _, _ in files}
        for p in parts:
            bs = sorted(b for (q, b) in totals if q == p)
            for b in bs[:-1]:
                prefix = sum(t for (q, bb), t in totals.items()
                             if q == p and bb <= b)
                assert prefix >= (b + 1) * 512, (p, b, prefix)

    def test_oversized_file_owns_bucket_and_pushes_next(self, spark):
        from bella_domify_spark.ops.lakehouse import compact_files

        mf = spark.createDataFrame(
            [("p", 1, 10_000), ("p", 2, 30), ("p", 3, 20)],
            "part string, file_id long, size_bytes long")
        got = _rows(compact_files(mf, target_bytes=100),
                    "file_id", "out_bucket")
        # file 1 (10k) packs first at cum 0 -> bucket 0; file 2 starts at
        # cum 10000 -> bucket 100; file 3 at 10030 -> bucket 100 (never
        # split, never co-located with the oversized file)
        assert got == [(1, 0), (2, 100), (3, 100)]

    def test_empty_manifest(self, spark):
        from bella_domify_spark.ops.lakehouse import compact_files

        mf = spark.createDataFrame(
            [], "part string, file_id long, size_bytes long")
        assert compact_files(mf, target_bytes=100).count() == 0


class TestVacuumCandidates:
    def test_superseded_and_aged_only(self, spark):
        from bella_domify_spark.ops.lakehouse import vacuum_candidates

        # slot (p, 1): versions 1 < 2 < 3; ts range 0..100 -> watermark 50.
        # v1 (ts 10): superseded + old -> deletable.
        # v2 (ts 80): superseded but INSIDE retention -> kept.
        # v3 (ts 100): live -> kept.
        # slot (p, 2): single version -> live -> kept even though old.
        rows = [
            (1, "p", 1, 1, "1970-01-01 00:00:10"),
            (2, "p", 1, 2, "1970-01-01 00:01:20"),
            (3, "p", 1, 3, "1970-01-01 00:01:40"),
            (4, "p", 2, 1, "1970-01-01 00:00:00"),
        ]
        df = (spark.createDataFrame(
                  rows, "file_id long, part string, slot long, "
                        "version long, ts string")
              .select("file_id", "part", "slot", "version",
                      F.col("ts").cast("timestamp_ntz").alias("ts")))
        got = _rows(vacuum_candidates(df), "file_id", "live_version")
        assert got == [(1, 3)]

    def test_empty_log(self, spark):
        from bella_domify_spark.ops.lakehouse import vacuum_candidates

        df = spark.createDataFrame(
            [], "file_id long, part string, slot long, version long, "
                "ts timestamp")
        assert vacuum_candidates(df).count() == 0


class TestTimeTravelRead:
    def test_replays_only_to_cutoff(self, spark):
        from bella_domify_spark.ops.lakehouse import time_travel_read

        base = spark.createDataFrame(
            [(1, "one"), (2, "two"), (3, "three")], "doc_id long, text string")
        # version range 0..10 -> as_of = 5: v<=5 applies, v>5 is the future
        changes = spark.createDataFrame(
            [
                (1, 0, "U", "one-v0"),
                (1, 8, "U", "one-v8-future"),   # after as_of -> invisible
                (2, 4, "D", None),               # deleted before as_of
                (2, 9, "U", "two-back-future"),  # resurrection is future
                (4, 3, "U", "four-new"),        # insert before as_of
                (5, 10, "U", "five-future"),    # insert after as_of
            ],
            "doc_id long, version long, op string, text string")
        got = _rows(time_travel_read(base, changes),
                    "doc_id", "final_version", "text", "as_of")
        assert got == [
            (1, 0, "one-v0", 5),
            (3, -1, "three", 5),
            (4, 3, "four-new", 5),
        ]


class TestPruneStats:
    def test_matches_python_planner(self, spark):
        from bella_domify_spark.ops.lakehouse import prune_stats

        # 3 files of 2 rows (rows_per_file=2): values 0..100 cluster so
        # file 0 is low, file 1 mid, file 2 high; ts splits files 0/1 vs 2
        rows = [
            (0, "1970-01-01 00:00:01", 0.0),
            (1, "1970-01-01 00:00:02", 1.0),
            (2, "1970-01-01 00:00:03", 50.0),
            (3, "1970-01-01 00:00:04", 55.0),
            (4, "1970-01-01 00:00:09", 99.0),
            (5, "1970-01-01 00:00:10", 100.0),
        ]
        df = (spark.createDataFrame(rows, "event_id long, ts string, value double")
              .select("event_id", F.col("ts").cast("timestamp_ntz").alias("ts"),
                      "value"))
        got = _rows(prune_stats(df, rows_per_file=2), "pred_id",
                    "files_total", "files_scanned", "rows_scanned",
                    "rows_matching")

        # pure-Python planner over the same footers
        import math
        e = [(eid // 2, int(ts_s * 1_000_000), math.floor(v * 1e6))
             for eid, ts_s, v in [(0, 1, 0.0), (1, 2, 1.0), (2, 3, 50.0),
                                  (3, 4, 55.0), (4, 9, 99.0), (5, 10, 100.0)]]
        emin, emax = min(r[1] for r in e), max(r[1] for r in e)
        vmin, vmax = min(r[2] for r in e), max(r[2] for r in e)
        preds = [(1, 0, vmax - (vmax - vmin) // 10, vmax),
                 (2, 0, vmin + (vmax - vmin) // 4, vmax - (vmax - vmin) // 4),
                 (3, 0, vmin, vmin + (vmax - vmin) // 100),
                 (4, 1, (emin + emax) // 2, emax)]
        files = {}
        for fid, e_us, v in e:
            files.setdefault(fid, []).append((e_us, v))
        want = []
        for pid, on_ts, lo, hi in preds:
            fs = rs = rm = 0
            for fid, rows_f in files.items():
                xs = [r[0] if on_ts else r[1] for r in rows_f]
                if max(xs) >= lo and min(xs) <= hi:
                    fs += 1
                    rs += len(rows_f)
                rm += sum(1 for x in xs if lo <= x <= hi)
            want.append((pid, len(files), fs, rs, rm))
        assert got == sorted(want)


class TestSnapshotDiff:
    def test_emits_minimal_changelog(self, spark):
        from bella_domify_spark.ops.lakehouse import snapshot_diff

        before = spark.createDataFrame(
            [(1, "same"), (2, "old"), (3, "gone"), (4, None), (5, None)],
            "doc_id long, text string")
        after = spark.createDataFrame(
            [(1, "same"), (2, "new"), (4, "filled"), (5, None), (6, "born")],
            "doc_id long, text string")
        got = _rows(snapshot_diff(before, after),
                    "doc_id", "op", "text_before", "text_after")
        # 1 unchanged, 5 null->null unchanged: absent
        assert got == [
            (2, "U", "old", "new"),
            (3, "D", "gone", None),
            (4, "U", None, "filled"),
            (6, "I", None, "born"),
        ]

    def test_replaying_diff_reproduces_after(self, spark):
        from bella_domify_spark.ops.lakehouse import (merge_upsert,
                                                      snapshot_diff)

        before = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
        after = spark.createDataFrame(
            [(1, "a"), (2, "bb"), (4, "d")], "doc_id long, text string")
        diff = snapshot_diff(before, after)
        changes = diff.select(
            "doc_id", F.lit(0).cast("long").alias("version"),
            F.when(F.col("op") == "D", "D").otherwise("U").alias("op"),
            F.col("text_after").alias("text"))
        replayed = merge_upsert(before, changes).select("doc_id", "text")
        assert (_rows(replayed, "doc_id", "text")
                == _rows(after, "doc_id", "text"))
