"""Structured Streaming front-end for the extraction pipeline.

The reference consumes parse tasks from Kafka consumer groups
(/root/reference/server/workers/listeners/file_api_listener.py:7-62). The
Spark-native equivalent is a streaming DataFrame source feeding the same
Arrow parse stage, with exactly-once sink semantics via the streaming
checkpoint — in production `readStream.format("kafka")` or an Iceberg
streaming read; tested here with the file source.

Also provides a watermarked per-conversation turn-rate aggregation as the
event-time example (late data handled by the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])


def read_transcript_stream(spark: SparkSession, input_dir: str,
                           max_files_per_trigger: int = 8) -> DataFrame:
    return (spark.readStream
            .schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir))


def extract_stream(stream_df: DataFrame) -> DataFrame:
    """Same Arrow-batched parse as the batch path — the stream is
    per-record, so no shuffle is needed before the UDF."""
    from bella_domify_spark.engine.extract import apply_parse

    return apply_parse(stream_df)


def run_extract_stream(spark: SparkSession, input_dir: str, output_dir: str,
                       checkpoint_dir: str, available_now: bool = True):
    """Start (and with available_now=True, drain) the streaming extraction.
    The checkpoint gives exactly-once file-sink semantics — the streaming
    twin of the batch bucket manifests."""
    out = extract_stream(read_transcript_stream(spark, input_dir))
    writer = (out.writeStream
              .format("parquet")
              .option("path", output_dir)
              .option("checkpointLocation", checkpoint_dir)
              .outputMode("append"))
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def run_extract_stream_manifest(spark: SparkSession, input_dir: str,
                                output_dir: str, checkpoint_dir: str,
                                n_buckets: int = 32,
                                max_files_per_trigger: int = 8):
    """Streaming front-end composed with the batch manifest sink via
    ``foreachBatch``: every micro-batch commits through ``run_resumable``
    into ``<output_dir>/epoch=<id>/`` — the analogue of the reference's
    Kafka consumer loop feeding the S3 result sink
    (file_api_listener.py:7-62 → s3 providers), with BOTH layers of
    exactly-once: the streaming checkpoint replays an interrupted epoch
    with identical file-source contents, and the manifest protocol inside
    the epoch skips its already-committed buckets, so a crash anywhere
    between bucket write and offset commit cannot duplicate rows."""
    from bella_domify_spark.engine.manifest import run_resumable

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # run_resumable fuses the Arrow parse inside the sink stage, so the
        # raw batch goes straight in
        run_resumable(batch_df, f"{output_dir}/epoch={epoch_id}",
                      n_buckets=n_buckets, run_id=f"epoch-{epoch_id}")

    stream = read_transcript_stream(spark, input_dir,
                                    max_files_per_trigger=max_files_per_trigger)
    q = (stream.writeStream
         .foreachBatch(sink)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return q


def turn_rate(stream_df: DataFrame, window: str = "10 minutes",
              watermark: str = "30 minutes") -> DataFrame:
    """Windowed turns-per-conversation with late-data watermark."""
    return (stream_df
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "conv_id")
            .agg(F.count(F.lit(1)).alias("n_turns"))
            .select(F.col("w.start").alias("window_start"), "conv_id", "n_turns"))


CONV_STATE_SCHEMA = "n_turns BIGINT, n_chars BIGINT"
CONV_OUTPUT_SCHEMA = ("conv_id STRING, n_turns BIGINT, n_chars BIGINT, "
                      "batch_turns BIGINT")


def conversation_state(stream_df: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-conversation totals that survive across micro-batches through the
    streaming state store (the analogue of the reference's long-lived Kafka
    consumer accumulating a file's parse tasks). Each micro-batch emits the
    conversation's updated running totals plus how many turns this batch
    contributed — the pattern a streaming dedup/assembly stage builds on."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        n_turns, n_chars = state.get if state.exists else (0, 0)
        batch_turns = 0
        for pdf in pdfs:
            batch_turns += len(pdf)
            n_turns += len(pdf)
            n_chars += int(pdf["text"].fillna("").str.len().sum())
        state.update((n_turns, n_chars))
        yield pd.DataFrame([{"conv_id": key[0], "n_turns": n_turns,
                             "n_chars": n_chars, "batch_turns": batch_turns}])

    return (stream_df
            .groupBy("conv_id")
            .applyInPandasWithState(update,
                                    outputStructType=CONV_OUTPUT_SCHEMA,
                                    stateStructType=CONV_STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))


def dedup_stream(stream_df: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact-dedup: keep the first occurrence of each content
    fingerprint (md5 of text). ``dropDuplicatesWithinWatermark`` bounds the
    dedup state by event time — at 10^12-turn scale an unbounded distinct
    state is impossible, so duplicates are only suppressed within the
    watermark horizon (the classic trade: state size vs dedup window).
    Emits the surviving turns unchanged."""
    return (stream_df
            .withColumn("text_md5", F.md5(F.coalesce(F.col("text"), F.lit(""))))
            .withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(["text_md5"])
            .drop("text_md5"))


def enrich_join_stream(turns: DataFrame, annotations: DataFrame,
                       watermark: str = "30 minutes",
                       join_horizon: str = "1 hour") -> DataFrame:
    """Watermarked stream-stream inner join: a live turn stream enriched
    with a second live annotation stream (same conv_id/turn_idx keys, e.g.
    a moderation or OCR service emitting results asynchronously). Both
    sides carry event-time watermarks and the join predicate bounds the
    annotation's timestamp to [turn.ts, turn.ts + join_horizon], so Spark
    can evict join state — the unbounded-state trap of a naive
    stream-stream join is the whole reason this operator exists.

    At 10^12-turn scale the state store holds only the horizon's worth of
    each side per key range; the horizon is the product decision (how
    late may an annotation arrive), exactly like dedup_stream's
    watermark-bounded distinct."""
    t = (turns.withWatermark("ts", watermark)
         .select("conv_id", "turn_idx", "text", F.col("ts").alias("t_ts")))
    a = (annotations.withWatermark("ts", watermark)
         .select(F.col("conv_id").alias("a_conv_id"),
                 F.col("turn_idx").alias("a_turn_idx"),
                 F.col("annotation"),
                 F.col("ts").alias("a_ts")))
    cond = ((F.col("conv_id") == F.col("a_conv_id"))
            & (F.col("turn_idx") == F.col("a_turn_idx"))
            & (F.col("a_ts") >= F.col("t_ts"))
            & (F.col("a_ts") <= F.col("t_ts") + F.expr(
                f"INTERVAL {join_horizon}")))
    return (t.join(a, cond, "inner")
            .select("conv_id", "turn_idx", "text", "annotation",
                    F.col("t_ts").alias("ts")))
