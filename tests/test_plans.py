"""Plan-discipline guards: the performance architecture, enforced by CI.

- No row-at-a-time Python (`BatchEvalPython`) anywhere in any query plan —
  every Python crossing must be Arrow-vectorized (ArrowEvalPython /
  MapInPandas / MapInArrow / FlatMapGroupsInPandas*).
- The extraction compute plan has exactly ONE shuffle (the salted
  repartition) and one Arrow stage.
- The documents scan under a projection prunes to the referenced columns.
"""

import contextlib
import io

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"

# queries that execute Spark jobs eagerly while building their result
# (sink roundtrip, iterative component loops) — their returned DataFrame
# is a scan of checkpointed/committed output, so a plan inspection of the
# result would not see the interesting stages anyway; their plan shape is
# covered by the module-level tests of the operators they call
EAGER = {"resumable_roundtrip", "dedup_cluster_canonical",
         "dedup_cluster_minhash", "dedup_cluster_simhash",
         "dedup_cluster_embedding", "curate_corpus"}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()  # simple mode: physical plan printed once
    return buf.getvalue()


class TestPlanDiscipline:
    def test_no_row_python_in_any_query(self, spark):
        import __spark_entry__ as entry

        checked = 0
        for name, fn in entry.queries().items():
            if name in EAGER:
                continue
            plan = _plan(fn(spark, SF))
            assert "BatchEvalPython" not in plan, name
            checked += 1
        assert checked >= 40

    def test_extraction_plan_shape(self, spark):
        from bella_domify_spark.engine.extract import extract_transcripts

        tdf = spark.createDataFrame(
            [], "conv_id string, turn_idx int, role string, text string, "
                "tool string, ts timestamp")
        plan = _plan(extract_transcripts(tdf, partitions=4))
        assert plan.count("Exchange") == 1      # the salted repartition only
        assert plan.count("ArrowEvalPython") == 1
        assert "BatchEvalPython" not in plan

    def test_scan_prunes_columns(self, spark):
        from bella_domify_spark.engine.extract import parse_udf

        d = spark.read.parquet(f"{SF}/documents.parquet")
        q = d.select("doc_id",
                     parse_udf(F.col("text")).getField("extracted_text"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q.explain("formatted")
        plan = buf.getvalue()
        assert "ReadSchema" in plan
        read_schema = [ln for ln in plan.splitlines()
                       if "ReadSchema" in ln][0]
        assert "doc_id" in read_schema and "text" in read_schema
        # the wide columns must NOT reach the scan
        for absent in ("source", "lang", "label"):
            assert absent not in read_schema, read_schema


class TestSession3PlanShapes:
    def test_chunk_docs_is_shuffle_free(self, spark):
        from bella_domify_spark.ops.textstats import chunk_docs

        d = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(chunk_docs(d))
        assert "Exchange" not in plan        # map-side projection + explode
        assert "Python" not in plan          # no UDF of any kind

    def test_pack_sequences_single_shard_shuffle(self, spark):
        from bella_domify_spark.ops.textstats import pack_sequences

        d = spark.read.parquet(f"{SF}/documents.parquet")
        plan = _plan(pack_sequences(d))
        assert plan.count("Exchange") == 1   # the shard window partition
        assert "Python" not in plan

    def test_transcript_ops_prune_events_scan(self, spark):
        import __spark_entry__ as entry

        for name in ("tool_run_stats", "role_transitions", "tool_latency"):
            qe = entry.queries()[name](spark, SF)._jdf.queryExecution()
            read = [l for l in qe.toString().splitlines()
                    if "ReadSchema" in l]
            # the events scan must carry only the 3 derivation columns —
            # no payload, no event_type/props/value
            assert read and all(
                "props" not in l and "value" not in l and "event_type" not in l
                for l in read), name


class TestSession5PlanShapes:
    def test_filter_pushdown_reaches_scan(self, spark):
        e = spark.read.parquet(f"{SF}/events.parquet")
        q = (e.filter((F.col("event_type") == "purchase")
                      & F.col("user_id").isNotNull())
             .select("event_id"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q.explain("formatted")
        plan = buf.getvalue()
        pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
        assert pushed, plan
        assert "EqualTo(event_type,purchase)" in pushed[0]
        assert "IsNotNull(user_id)" in pushed[0]

    def test_merge_upsert_map_side_combined_single_key_shuffle(self, spark):
        import __spark_entry__ as entry

        plan = _plan(entry.queries()["merge_upsert"](spark, SF))
        # LWW resolves in ONE key aggregate with a map-side partial —
        # a hot key costs a combiner cell, not a window partition
        assert "partial_max_by" in plan
        assert plan.count("hashpartitioning(doc_id") == 1
        assert "Window" not in plan
        assert "BatchEvalPython" not in plan

    def test_zorder_all_jvm_one_data_shuffle(self, spark):
        import __spark_entry__ as entry

        plan = _plan(entry.queries()["zorder_layout"](spark, SF))
        assert "Python" not in plan
        # min/max scalar agg + bucket agg + one broadcast = <= 3 exchanges
        assert plan.count("Exchange") <= 3

    def test_compact_files_single_shuffle_all_jvm(self, spark):
        import __spark_entry__ as entry

        plan = _plan(entry.queries()["compact_files"](spark, SF))
        # one hash shuffle on the partition key feeds the packing window;
        # the manifest is metadata-sized so nothing else moves
        assert plan.count("Exchange") == 1
        assert "Python" not in plan

    def test_bpe_merges_all_jvm(self, spark):
        import __spark_entry__ as entry

        plan = _plan(entry.queries()["bpe_merges"](spark, SF))
        # word-type table + 3 rounds of pair count/TakeOrdered/fold —
        # everything codegen, the fold never leaves the JVM
        assert "Python" not in plan
        assert "CartesianProduct" not in plan
