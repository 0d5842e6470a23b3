"""Structured Streaming extraction: exactly-once file sink + watermarked agg."""

import os
import shutil

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def stream_corpus(spark):
    from fixtures.gen_corpus import write_corpus

    from fixtures.gen_corpus import GEN_VERSION
    base = f"/tmp/bds_stream_corpus_v{GEN_VERSION}"
    if not os.path.exists(f"{base}/in/part-0.parquet"):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(f"{base}/in", exist_ok=True)
        write_corpus(f"{base}/gen", n_convs=10)
        df = spark.read.parquet(f"{base}/gen/transcripts.parquet")
        # split into several files so the file source triggers in batches
        df.repartition(4).write.mode("overwrite").parquet(f"{base}/in")
    return base


class TestStreamingExtraction:
    def test_stream_matches_batch(self, spark, stream_corpus, tmp_path):
        from bella_domify_spark.streaming.stream_extract import run_extract_stream

        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        run_extract_stream(spark, f"{stream_corpus}/in", out, ckpt)

        got = spark.read.parquet(out).select("conv_id", "turn_idx", "extracted_text")
        exp = (spark.read.parquet(f"{stream_corpus}/gen/transcripts_expected.parquet")
               .select("conv_id", "turn_idx", F.col("extracted_text").alias("e")))
        j = got.join(exp, ["conv_id", "turn_idx"])
        assert j.count() == exp.count()
        assert j.filter(F.col("extracted_text") != F.col("e")).count() == 0

        # exactly-once: re-running with the same checkpoint adds nothing
        run_extract_stream(spark, f"{stream_corpus}/in", out, ckpt)
        assert spark.read.parquet(out).count() == exp.count()

    def test_stream_manifest_sink_exactly_once(self, spark, stream_corpus,
                                               tmp_path):
        # foreachBatch → manifest sink: per-epoch bucket commits; a second
        # drain of the same checkpoint must add nothing (exactly-once
        # across BOTH the streaming offset log and the bucket manifests)
        from bella_domify_spark.streaming.stream_extract import (
            run_extract_stream_manifest,
        )

        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        run_extract_stream_manifest(spark, f"{stream_corpus}/in", out, ckpt,
                                    max_files_per_trigger=2)
        epochs = [d for d in os.listdir(out) if d.startswith("epoch=")]
        assert len(epochs) >= 2  # several micro-batches actually committed

        got = (spark.read.parquet(f"{out}/epoch=*/bucket-*.parquet")
               .select("conv_id", "turn_idx", "extracted_text"))
        exp = (spark.read.parquet(
            f"{stream_corpus}/gen/transcripts_expected.parquet")
            .select("conv_id", "turn_idx",
                    F.col("extracted_text").alias("e")))
        assert got.count() == exp.count()  # every row exactly once
        j = got.join(exp, ["conv_id", "turn_idx"])
        assert j.count() == exp.count()
        assert j.filter(F.col("extracted_text") != F.col("e")).count() == 0

        run_extract_stream_manifest(spark, f"{stream_corpus}/in", out, ckpt,
                                    max_files_per_trigger=2)
        assert (spark.read.parquet(f"{out}/epoch=*/bucket-*.parquet").count()
                == exp.count())

    def test_turn_rate_watermarked(self, spark, stream_corpus, tmp_path):
        from bella_domify_spark.streaming.stream_extract import (
            read_transcript_stream,
            turn_rate,
        )

        q = (turn_rate(read_transcript_stream(spark, f"{stream_corpus}/in"))
             .writeStream.format("memory").queryName("turnrate")
             .outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ckpt2"))
             .trigger(availableNow=True).start())
        q.awaitTermination()
        rows = spark.sql("select * from turnrate").collect()
        # append mode only emits windows the watermark has closed; the
        # plan executes and the query drains without error
        assert q.lastProgress is not None
        assert {"window_start", "conv_id", "n_turns"} == set(
            spark.table("turnrate").columns)

    def test_conversation_state_accumulates_across_batches(
            self, spark, stream_corpus, tmp_path):
        from bella_domify_spark.streaming.stream_extract import (
            conversation_state,
            read_transcript_stream,
        )

        # one file per micro-batch so conversations span several batches and
        # the state store must carry the running totals between them
        stream = read_transcript_stream(spark, f"{stream_corpus}/in",
                                        max_files_per_trigger=1)
        q = (conversation_state(stream)
             .writeStream.format("memory").queryName("convstate")
             .outputMode("update")
             .option("checkpointLocation", str(tmp_path / "ckpt3"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

        import pandas as pd
        got = spark.sql("select * from convstate").toPandas()
        # the LAST update per conversation equals the batch totals
        final = (got.sort_values("n_turns").groupby("conv_id").last()
                 .reset_index())
        exp = (spark.read.parquet(f"{stream_corpus}/in").toPandas()
               .assign(n=lambda d: d["text"].fillna("").str.len())
               .groupby("conv_id").agg(n_turns=("turn_idx", "size"),
                                       n_chars=("n", "sum")).reset_index())
        m = final.merge(exp, on="conv_id", suffixes=("_got", "_exp"))
        assert len(m) == len(exp)
        assert (m["n_turns_got"] == m["n_turns_exp"]).all()
        assert (m["n_chars_got"] == m["n_chars_exp"]).all()
        # conversations long enough to span batches produced >1 update row
        multi = got.groupby("conv_id").size()
        assert (multi > 1).any()


class TestStreamingDedup:
    def test_dedup_stream_drops_repeats(self, spark, tmp_path):
        import datetime as dt

        import pandas as pd

        from bella_domify_spark.streaming.stream_extract import (
            dedup_stream,
            read_transcript_stream,
        )

        base = dt.datetime(2026, 1, 1)
        rows = []
        # 3 distinct texts, each appearing 3 times across conversations
        for i in range(9):
            rows.append({"conv_id": f"c{i % 2}", "turn_idx": i,
                         "role": "user", "text": f"payload {i % 3}",
                         "tool": "", "ts": base + dt.timedelta(minutes=i)})
        pdf = pd.DataFrame(rows)
        pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
        pdf["ts"] = pdf["ts"].astype("datetime64[us]")
        src = str(tmp_path / "in")
        os.makedirs(src, exist_ok=True)
        pdf.to_parquet(f"{src}/part-0.parquet", index=False)

        out = str(tmp_path / "out")
        q = (dedup_stream(read_transcript_stream(spark, src))
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()

        got = spark.read.parquet(out)
        assert got.count() == 3                       # one per distinct text
        assert {r["text"] for r in got.collect()} == \
            {"payload 0", "payload 1", "payload 2"}
        # survivor = first occurrence by event time
        assert {r["turn_idx"] for r in got.collect()} == {0, 1, 2}


class TestStreamStreamJoin:
    def test_enrich_join_bounded_horizon(self, spark, tmp_path):
        import datetime as dt

        import pandas as pd

        from bella_domify_spark.streaming.stream_extract import (
            enrich_join_stream,
            read_transcript_stream,
        )

        base = dt.datetime(2026, 1, 1)
        turns = pd.DataFrame([
            {"conv_id": "c0", "turn_idx": i, "role": "user",
             "text": f"turn {i}", "tool": "",
             "ts": base + dt.timedelta(minutes=10 * i)}
            for i in range(4)
        ])
        turns["turn_idx"] = turns["turn_idx"].astype("int32")
        turns["ts"] = turns["ts"].astype("datetime64[us]")
        tdir = str(tmp_path / "turns")
        os.makedirs(tdir, exist_ok=True)
        turns.to_parquet(f"{tdir}/part-0.parquet", index=False)

        ann = pd.DataFrame([
            # arrives 5 min after its turn: inside the 1h horizon -> joins
            {"conv_id": "c0", "turn_idx": 0, "annotation": "ok",
             "ts": base + dt.timedelta(minutes=5)},
            # arrives 2h after its turn: outside the horizon -> dropped
            {"conv_id": "c0", "turn_idx": 1, "annotation": "late",
             "ts": base + dt.timedelta(minutes=130)},
            # arrives BEFORE its turn: outside [t_ts, +1h) -> dropped
            {"conv_id": "c0", "turn_idx": 2, "annotation": "early",
             "ts": base + dt.timedelta(minutes=15)},
            # no annotation for turn 3 -> inner join drops the turn
        ])
        ann["turn_idx"] = ann["turn_idx"].astype("int32")
        ann["ts"] = ann["ts"].astype("datetime64[us]")
        adir = str(tmp_path / "ann")
        os.makedirs(adir, exist_ok=True)
        ann.to_parquet(f"{adir}/part-0.parquet", index=False)

        ann_schema = ("conv_id string, turn_idx int, annotation string, "
                      "ts timestamp")
        a_stream = (spark.readStream.schema(ann_schema).parquet(adir))
        out = str(tmp_path / "out")
        q = (enrich_join_stream(read_transcript_stream(spark, tdir), a_stream)
             .writeStream.format("parquet")
             .option("path", out)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()

        got = spark.read.parquet(out).collect()
        assert len(got) == 1
        assert (got[0]["turn_idx"], got[0]["annotation"]) == (0, "ok")
        assert got[0]["text"] == "turn 0"
