"""Hashed linear quality classifier (fastText-style) — the model-based
document filter every LLM curation pipeline runs after the heuristic
gates (Gopher rules, language ID) and before tokenization.

Architecture is the real fastText inference path: unigram + bigram
features, each hashed into a weight table, margin = sum of feature
weights, keep/drop by sign. The WEIGHTS are a deterministic stand-in for
a trained artifact (an affine hash of the feature, seeded like
ops/hashfamily.py), because this sandbox trains nothing — the Spark-side
plumbing (feature extraction, hashing, weight lookup, margin reduction)
is the production code path and is what the oracle gate pins. Swapping in
real weights = replacing ``_W_A/_W_B`` with a broadcast map-side join
against a weights table; the plan shape is unchanged.

Scale notes (100 TB): zero shuffle — tokenize, hash, and reduce all happen
inside one whole-stage-codegen projection per row (no explode: a
billion-token document never materializes a row per token, and the margin
reduction is a per-row ``aggregate`` fold). One md5 per feature, same cost
model as the MinHash shingle path. The token array is produced behind its
own projection so the fold's lambda does not re-evaluate split() per
element (Spark re-inlines captured producers into transform/aggregate
lambdas — see CLAUDE.md).

Determinism: md5 -> 60-bit int -> affine mod 2^31-1 -> weight in
[-1000, 1000], all BIGINT; margins sum exactly in int64 (|w| <= 1000, so
overflow needs ~9e15 features in one document).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from bella_domify_spark.ops.hashfamily import MERSENNE_P, _md5_int

__all__ = ["quality_classifier", "classifier_auc", "calibration_bins",
           "classifier_weight_expr", "classifier_feats_sql"]

# Affine weight-table constants, md5-seeded like minhash_params so both
# engines regenerate them bit-for-bit.
_W_A = _md5_int("clf_a") % (MERSENNE_P - 1) + 1
_W_B = _md5_int("clf_b") % MERSENNE_P
_W_RANGE = 2001  # weights in [-1000, 1000]


def classifier_weight_expr(tok: str, engine: str) -> str:
    """Weight of one feature string ``tok``: md5 -> 60-bit x, then
    ((a*(x mod p) + b) mod p) mod 2001 - 1000. All operands nonnegative,
    so plain % agrees between Spark and DuckDB; a*(x mod p) < 2^62 keeps
    ANSI mode happy."""
    if engine == "spark":
        x = f"cast(conv(substring(md5({tok}), 1, 15), 16, 10) as bigint)"
    else:
        x = f"('0x' || substr(md5({tok}), 1, 15))::BIGINT"
    return (f"(({_W_A} * ({x} % {MERSENNE_P}) + {_W_B})"
            f" % {MERSENNE_P}) % {_W_RANGE} - 1000")


def classifier_feats_sql() -> str:
    """DuckDB CTE producing (doc_id, feats) with the same unigram+bigram
    feature list as the Spark side; caller composes it with the weight
    expression. Bigrams are joined with '_' so they cannot collide with
    unigrams containing spaces (split removes all whitespace)."""
    return r"""
        toks AS (
            -- COALESCE: a NULL text must score like an empty one on BOTH
            -- engines (NULL propagation differs: DuckDB's COALESCE-to-0
            -- after list_aggregate(NULL) vs Spark's NULL margin)
            SELECT doc_id,
                   list_filter(regexp_split_to_array(
                                   lower(COALESCE(text, '')), '\s+'),
                               x -> x <> '') AS ws
            FROM documents
        ), feats AS (
            SELECT doc_id,
                   list_concat(
                       ws,
                       list_transform(range(1, greatest(len(ws), 1)),
                                      i -> ws[i] || '_' || ws[i + 1])
                   ) AS fs
            FROM toks
        )
    """


def quality_classifier(docs: DataFrame,
                       passthrough: tuple[str, ...] = ()) -> DataFrame:
    """Score each document with the hashed linear model; label 'keep' when
    the margin is positive. Returns (doc_id, n_feats, margin, label[,
    *passthrough]) — ``passthrough`` columns ride along so consumers that
    need a truth label (calibration_bins) avoid a join back to docs."""
    toks = docs.select(
        "doc_id", *passthrough,
        F.expr(r"filter(split(lower(coalesce(text, '')), '\\s+'),"
               r" x -> x != '')")
         .alias("ws"),
    )
    feats = toks.select(
        "doc_id", *passthrough,
        F.expr("""
            concat(ws,
                   CASE WHEN size(ws) >= 2
                        THEN zip_with(slice(ws, 1, size(ws) - 1),
                                      slice(ws, 2, size(ws) - 1),
                                      (a, b) -> concat(a, '_', b))
                        ELSE array() END)
        """).alias("fs"),
    )
    w = classifier_weight_expr("t", "spark")
    scored = feats.select(
        "doc_id", *passthrough,
        F.expr("size(fs)").cast("long").alias("n_feats"),
        F.expr(f"aggregate(fs, 0L, (acc, t) -> acc + ({w}))").alias("margin"),
    )
    return scored.select(
        "doc_id", "n_feats", "margin",
        F.when(F.col("margin") > 0, F.lit("keep")).otherwise(F.lit("drop"))
         .alias("label"), *passthrough,
    )


def calibration_bins(docs: DataFrame, width: int = 1000) -> DataFrame:
    """Reliability-diagram bins for the classifier margin against the
    same deterministic truth label classifier_auc evaluates (lang='en'):
    per fixed-width margin bucket, the count, positives, exact margin
    mass, and the floor-quantized empirical positive rate. A calibrated
    score shows pos_rate rising monotonically with bucket — the check a
    curation pipeline runs before turning a margin into a keep
    THRESHOLD rather than a keep sign.

    Scale notes (100 TB): buckets are FIXED-WIDTH (floor(margin/width)),
    not quantile (ntile needs a global sort) — the whole readout is one
    map-side-combinable groupBy on a data-independent key; the truth
    label rides the scoring projection (quality_classifier passthrough),
    so there is no join at all. Output: (bucket, n, n_pos, sum_margin,
    pos_rate_e9).
    """
    scored = quality_classifier(docs, passthrough=("lang",)).select(
        "margin", (F.col("lang") == "en").cast("long").alias("y"))
    g = (scored
         .groupBy(F.floor(F.col("margin") / F.lit(int(width)))
                   .cast("long").alias("bucket"))
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("y").cast("long").alias("n_pos"),
              F.sum("margin").cast("long").alias("sum_margin")))
    return g.select(
        "bucket", "n", "n_pos", "sum_margin",
        F.floor(F.col("n_pos").cast("double") / F.col("n").cast("double")
                * 1e9).cast("long").alias("pos_rate_e9"))


def classifier_auc(docs: DataFrame) -> DataFrame:
    """Exact Mann-Whitney AUC of the classifier margin against a
    deterministic binary label (lang='en') — the evaluation every
    model-based filter needs before it gates a corpus. Tie handling is
    the standard average-rank convention, kept integer-exact by doubling:
    U2 = Σ_margins (2·pos_m·neg_below_m + pos_m·neg_m), AUC = U2 /
    (2·n_pos·n_neg). Output: one row (n_pos, n_neg, u2, auc_e9).

    Plan: the margin table reduces to a DISTINCT-margin aggregate
    (map-side combined) before any window; the prefix sum of negatives
    runs over that aggregate in a single unpartitioned window — fine
    while distinct margins ≪ corpus (hash-sum margins are near-unique,
    so at 100 TB swap in the binned AUC: quantize margins to a fixed
    grid first, the hist_event_quantiles discipline; the formula is
    unchanged). u2·1e9 stays far inside int64 up to ~10^6 docs per
    evaluation slice; beyond that the final ratio moves to DECIMAL.
    """
    from pyspark.sql import Window

    scored = quality_classifier(docs).select("doc_id", "margin")
    lab = docs.select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("y"))
    g = (scored.join(lab, "doc_id")
         .groupBy("margin")
         .agg(F.sum("y").cast("long").alias("pos"),
              F.sum(1 - F.col("y")).cast("long").alias("neg")))
    w = (Window.orderBy("margin")
         .rowsBetween(Window.unboundedPreceding, -1))
    per = g.select(
        "pos", "neg",
        F.coalesce(F.sum("neg").over(w), F.lit(0)).alias("neg_below"))
    tot = per.agg(
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        F.sum(2 * F.col("pos") * F.col("neg_below")
              + F.col("pos") * F.col("neg")).alias("u2"))
    return tot.select(
        "n_pos", "n_neg", "u2",
        F.floor(F.col("u2").cast("double")
                / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
                * 1e9).cast("long").alias("auc_e9"))


CONFORMAL_ALPHA_DEN = 10   # alpha = 1/ALPHA_DEN miscoverage budget


def conformal_threshold(docs: DataFrame,
                        alpha_den: int = CONFORMAL_ALPHA_DEN) -> DataFrame:
    """Split-conformal keep-threshold for the quality classifier: the
    margin cutoff τ that GUARANTEES ≥ (1−α) of true in-class documents
    survive the filter (α = 1/alpha_den), plus the realized coverage on
    a held-out split — distribution-free, no calibration model, just
    exchangeability. This is how a curation pipeline turns a raw margin
    into a keep threshold with a stated recall contract instead of an
    eyeballed cut (calibration_bins shows the shape; this names the
    number).

    Exact recipe: calibration = even doc_ids with lang='en', test = odd;
    τ = the k-th smallest calibration margin with k = (n_cal+1) div
    alpha_den (the conformal rank — keeping margin ≥ τ leaves at most
    k−1 of n_cal+1 exchangeable positives below the cut). Margins are
    exact BIGINTs, so every comparison is integer; coverage_e6 =
    covered·1e6 div n_test. k = 0 (tiny calibration) emits no row.

    Scale: one scoring pass (JVM aggregate over hashed features), one
    rank selection on the calibration-positive table (bounded subset;
    the length_fences caveat applies), one broadcast of (τ, n_cal).

    Output: one row (n_cal, n_test, tau_margin, n_covered,
    coverage_e6).
    """
    from pyspark.sql import Window

    scored = quality_classifier(docs, passthrough=("lang",)).select(
        "doc_id", "margin",
        (F.col("lang") == "en").cast("long").alias("y"))
    pos = scored.filter(F.col("y") == 1)
    cal = pos.filter(F.expr("doc_id % 2 = 0"))
    test = pos.filter(F.expr("doc_id % 2 = 1"))
    w = Window.orderBy("margin")
    ranked = (cal.withColumn("rn", F.row_number().over(w))
              .withColumn("n_cal", F.count(F.lit(1)).over(
                  Window.partitionBy())))
    tau = (ranked.filter(F.expr(f"rn = (n_cal + 1) div {alpha_den}"))
           .select(F.col("margin").alias("tau_margin"),
                   F.col("n_cal").cast("long").alias("n_cal")))
    return (test.crossJoin(F.broadcast(tau))
            .groupBy("n_cal", "tau_margin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_test"),
                 F.sum(F.when(F.col("margin") >= F.col("tau_margin"), 1)
                       .otherwise(0)).cast("long").alias("n_covered"))
            .select("n_cal", "n_test", "tau_margin", "n_covered",
                    F.expr("cast(n_covered as decimal(38,0)) * 1000000"
                           " div n_test").alias("coverage_e6")))


def spearman_length_quality(docs: DataFrame) -> DataFrame:
    """Exact Spearman rank correlation between document length and the
    classifier margin — "is the quality score just a length detector?"
    |ρ| near 1 means the expensive classifier is re-deriving n_chars
    and a length cut would curate the same corpus for free; the routine
    confounder check before any margin threshold ships.

    Integer recipe: both variables rank by row_number over a
    deterministic total order ((value, doc_id) — a documented
    tie-break: classic Spearman's fractional average ranks cannot be
    exact-hashed), then ρ = 1 − 6·Σd² / (n(n²−1)) computes as
    rho_e6 = (n(n²−1) − 6Σd²)·1e6 div (n(n²−1)) in DECIMAL(38,0)
    (n³ ~ 1e36 at corpus scale — inside the 38-digit budget, noted).

    Scale: one scoring pass, two global rank windows over the doc
    table (the length_fences caveat: range-partitioned two-level ranks
    at truly unbounded n), one global sum.

    Output: one row (n_docs, sum_d2, rho_e6).
    """
    from pyspark.sql import Window

    scored = quality_classifier(docs).select("doc_id", "margin")
    lens = docs.select("doc_id", F.col("n_chars").cast("long").alias("x"))
    j = scored.join(lens, "doc_id").filter(F.col("x").isNotNull())
    wl = Window.orderBy("x", "doc_id")
    wm = Window.orderBy("margin", "doc_id")
    r = (j.withColumn("rx", F.row_number().over(wl))
         .withColumn("rm", F.row_number().over(wm)))
    dec = "decimal(38,0)"
    s = r.agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum(((F.col("rx") - F.col("rm"))
                     * (F.col("rx") - F.col("rm"))).cast(dec))
               .cast(dec).alias("sum_d2"))
    return (s.filter(F.col("n") > 1)
            .select(F.col("n").alias("n_docs"),
                    F.col("sum_d2").cast("long").alias("sum_d2"),
                    F.expr("(cast(n as decimal(38,0)) * (cast(n as"
                           " decimal(38,0)) * n - 1) - 6 * sum_d2)"
                           " * 1000000"
                           " div (cast(n as decimal(38,0))"
                           " * (cast(n as decimal(38,0)) * n - 1))")
                     .alias("rho_e6")))
