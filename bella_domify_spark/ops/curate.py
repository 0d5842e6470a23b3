"""End-to-end training-data curation: the composition a 100 TB corpus
actually runs — quality gate → near-duplicate removal → deterministic
split — as one DataFrame pipeline over the building blocks in
``ops.textstats`` / ``ops.dedup`` / ``ops.graph``.

Semantics (each an independent predicate over the FULL corpus, so the
result is order-free and incremental-friendly):

- quality: keep documents with ``quality_score >= min_quality`` and at
  least ``min_words`` whitespace words;
- dedup: drop every document that is a non-canonical member of a
  Jaccard near-dup cluster (the canonical — min id — survives, even if
  its own duplicates arrived later);
- split: content-addressed train/val/test label (md5 mod 100 — stable
  under any partitioning and any future corpus growth).

Plan shape at scale: quality + split are map-side projections fused into
the scan; the only heavy shuffles belong to the near-dup pair generator
and the component loop (see ops/graph.py), both over the pair list, not
the corpus. The final assembly joins ONLY narrow id/metric columns: the
dup-set anti-join stays a shuffled SMJ by design — at web scale the
duplicate set can be a large fraction of the corpus, so forcing a
broadcast would be wrong; AQE converts it to broadcast automatically
whenever the measured dup set is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def curate_corpus(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", min_quality: float = 0.5,
                  min_words: int = 25,
                  jaccard_threshold: float = 0.2) -> DataFrame:
    """Returns the curated corpus as ``(id, n_words, quality_score,
    split)`` — one row per surviving document."""
    from bella_domify_spark.ops.dedup import duplicate_clusters
    from bella_domify_spark.ops.textstats import quality_features, train_split

    q = quality_features(docs, id_col, text_col)
    passing = (q.filter((F.col("quality_score") >= min_quality)
                        & (F.col("n_words") >= min_words))
               .select(id_col, "n_words", "quality_score"))

    clusters = duplicate_clusters(docs, id_col, text_col,
                                  threshold=jaccard_threshold)
    dupes = (clusters.filter(F.col(id_col) != F.col("canonical_id"))
             .select(id_col))

    split = train_split(docs, id_col).select(id_col, "split")
    return (passing.join(dupes, id_col, "left_anti")
            .join(split, id_col)
            .select(id_col, "n_words", "quality_score", "split"))


def split_leakage(pairs: DataFrame, splits: DataFrame,
                  id_col: str = "doc_id",
                  split_col: str = "split") -> DataFrame:
    """The leakage REPORT that motivates :func:`split_by_cluster`: count
    near-dup pairs whose endpoints landed in DIFFERENT splits under a
    given assignment, per ordered (split_a, split_b) cell with split_a
    <= split_b lexicographically (so (test,train) and (train,test)
    collapse into one row — pairs are undirected). The (train,test) and
    (train,val) cells are the contamination number an eval report must
    disclose; diagonal cells show dup mass the split kept together.

    Scale notes: two joins of the pair list against the split assignment
    keyed by doc id (the pair side is candidate-sized, see ops/dedup.py
    generators) and a map-side-combined count into a ≤ 3×3 grid.

    Output: (split_a, split_b, n_pairs).
    """
    s = splits.select(F.col(id_col).alias("_sid"),
                      F.col(split_col).alias("_sp"))
    a = s.select(F.col("_sid").alias("id_a"), F.col("_sp").alias("sp_a"))
    b = s.select(F.col("_sid").alias("id_b"), F.col("_sp").alias("sp_b"))
    return (pairs.select("id_a", "id_b")
            .join(a, "id_a").join(b, "id_b")
            .select(F.least("sp_a", "sp_b").alias("split_a"),
                    F.greatest("sp_a", "sp_b").alias("split_b"))
            .groupBy("split_a", "split_b")
            .agg(F.count(F.lit(1)).alias("n_pairs")))


def split_by_cluster(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     jaccard_threshold: float = 0.2,
                     val_pct: int = 5, test_pct: int = 5) -> DataFrame:
    """Leakage-aware train/val/test split: near-duplicate documents must
    land in the SAME split, or evaluation silently trains on its own test
    set (the classic contamination-through-duplication failure).
    Assignment hashes the near-dup cluster's canonical id instead of the
    document id — singleton docs (no near-dup) hash their own id, which
    keeps the plain ``train_split`` proportions for the non-duplicated
    bulk of the corpus.

    Returns ``(id, split_key, bucket, split)`` where split_key is the id
    whose hash decided the split (canonical_id for cluster members).

    Plan shape: the cluster side is pair-list-sized (see ops/graph.py) and
    LEFT-joins onto the corpus by id; the hash/bucket/label tail is a
    map-side projection. Like curate_corpus's anti-join, the join stays a
    shuffled SMJ by design — the duplicated fraction of a web corpus can
    be large, and AQE demotes it to broadcast when it measures small."""
    from bella_domify_spark.ops.dedup import duplicate_clusters
    from bella_domify_spark.ops.textstats import _md5_mod

    clusters = duplicate_clusters(docs, id_col, text_col,
                                  threshold=jaccard_threshold)
    key = F.coalesce(F.col("canonical_id"), F.col(id_col)).alias("split_key")
    bucket = _md5_mod(key, 100)
    split = (F.when(bucket < test_pct, F.lit("test"))
             .when(bucket < test_pct + val_pct, F.lit("val"))
             .otherwise(F.lit("train")))
    return (docs.select(id_col)
            .join(clusters.select(id_col, "canonical_id"), id_col, "left")
            .select(F.col(id_col), key,
                    bucket.cast("int").alias("bucket"), split.alias("split")))


def adaptive_quality_filter(docs: DataFrame, p: float = 0.25,
                            id_col: str = "doc_id", text_col: str = "text",
                            strata_col: str = "lang") -> DataFrame:
    """Per-stratum adaptive quality cutoff: keep a document iff its
    quality score clears its OWN language's p-quantile, instead of one
    global threshold that over-prunes low-resource strata (the fixed
    cutoff in curate_corpus is tuned for the majority language; a p25
    cutoff per stratum drops just under each stratum's worst quartile —
    the rows strictly below the floor((n-1)p)+1 order statistic, so tiny
    strata with n ≤ 1/p keep everything rather than over-pruning).

    The threshold is an exact order statistic picked by the
    event_value_quantiles rule (row floor((n-1)p)+1 of the
    (score, id)-ordered stratum — engine-agnostic, no interpolation), so
    keep/drop decisions are bit-stable. Returns every doc with its
    stratum, e4-quantized score and threshold, and the keep flag.

    Plan: ONE shuffle by stratum feeds both window row_numbers and the
    threshold aggregate; the threshold table is strata-sized and
    broadcast-joins back."""
    from bella_domify_spark.ops.textstats import quality_features

    q = (quality_features(docs, id_col, text_col)
         .select(id_col, "quality_score")
         .join(docs.select(id_col, strata_col), id_col))
    w = Window.partitionBy(strata_col).orderBy(
        F.col("quality_score").asc_nulls_last(), F.col(id_col))
    n = Window.partitionBy(strata_col)
    r = q.select(strata_col, id_col, "quality_score",
                 F.row_number().over(w).alias("rn"),
                 F.count(F.lit(1)).over(n).alias("n"))
    thr = (r.groupBy(strata_col)
           .agg(F.max(F.when(
               F.col("rn") == F.floor((F.col("n") - 1) * F.lit(p)) + 1,
               F.col("quality_score"))).alias("q_thr")))
    return (q.join(F.broadcast(thr), strata_col)
            .select(F.col(id_col), F.col(strata_col),
                    F.floor(F.col("quality_score") * 1e4).alias("score_e4"),
                    F.floor(F.col("q_thr") * 1e4).alias("thr_e4"),
                    (F.col("quality_score") >= F.col("q_thr")).alias("kept")))


K_ANON_K = 5


def k_anonymity(docs: DataFrame) -> DataFrame:
    """Privacy k-anonymity audit over the document metadata: group the
    corpus by its quasi-identifier tuple (lang, source, n_chars rounded
    to the nearest 100) and report every equivalence class with its
    size, flagging classes smaller than K_ANON_K — the release rule for
    any redistributable corpus slice (a class of 1-4 docs can
    re-identify an author/session even after PII redaction; see
    Sweeney's k-anonymity model).

    Output: (lang, source, chars_bucket, class_size, at_risk). A
    downstream pass would suppress or generalize the at_risk classes;
    this operator is the audit that finds them.

    Scale: one groupBy on a low-cardinality composite key —
    map-side-combined counts, one small shuffle, no row data moves.
    """
    bucket = (F.floor(F.col("n_chars") / 100) * 100).cast("long")
    return (docs.filter(F.col("lang").isNotNull()
                        & F.col("source").isNotNull()
                        & F.col("n_chars").isNotNull())
            .groupBy(F.col("lang"), F.col("source"),
                     bucket.alias("chars_bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
            .select("lang", "source", "chars_bucket", "class_size",
                    (F.col("class_size") < K_ANON_K).alias("at_risk")))


def k_anonymity_oracle_sql() -> str:
    """DuckDB twin of k_anonymity (same bucket rule and K)."""
    return f"""
        SELECT lang, source,
               (floor(n_chars / 100) * 100)::BIGINT AS chars_bucket,
               count(*)::BIGINT AS class_size,
               (count(*) < {K_ANON_K}) AS at_risk
        FROM documents
        WHERE lang IS NOT NULL AND source IS NOT NULL
          AND n_chars IS NOT NULL
        GROUP BY lang, source, chars_bucket
    """


L_DIVERSITY_L = 3


def l_diversity(docs: DataFrame) -> DataFrame:
    """Distinct l-diversity audit — k_anonymity's companion: a class
    can be large (k-anonymous) yet still leak if every member shares
    one sensitive value (Machanavajjhala's homogeneity attack). Here
    the quasi-identifiers are (lang, n_chars rounded to 100) and the
    sensitive attribute is ``source``: a release slice where a
    quasi-class maps to fewer than L distinct sources pins members to
    their origin crawl/session.

    Output: (lang, chars_bucket, class_size, n_sources, at_risk) with
    at_risk = n_sources < L. Scale: one map-side partial-combining
    aggregate on a low-cardinality composite key (count-distinct over
    the bounded source enum — no row data moves).
    """
    bucket = (F.floor(F.col("n_chars") / 100) * 100).cast("long")
    return (docs.filter(F.col("lang").isNotNull()
                        & F.col("source").isNotNull()
                        & F.col("n_chars").isNotNull())
            .groupBy("lang", bucket.alias("chars_bucket"))
            .agg(F.count(F.lit(1)).cast("long").alias("class_size"),
                 F.countDistinct("source").cast("long")
                  .alias("n_sources"))
            .select("lang", "chars_bucket", "class_size", "n_sources",
                    (F.col("n_sources") < L_DIVERSITY_L)
                    .alias("at_risk")))


def l_diversity_oracle_sql() -> str:
    """DuckDB twin of l_diversity (same bucket rule and L)."""
    return f"""
        SELECT lang, (floor(n_chars / 100) * 100)::BIGINT AS chars_bucket,
               count(*)::BIGINT AS class_size,
               count(DISTINCT source)::BIGINT AS n_sources,
               (count(DISTINCT source) < {L_DIVERSITY_L}) AS at_risk
        FROM documents
        WHERE lang IS NOT NULL AND source IS NOT NULL
          AND n_chars IS NOT NULL
        GROUP BY lang, chars_bucket
    """


T_CLOSENESS_E9 = 350_000_000  # variational distance 0.35


def t_closeness(docs: DataFrame) -> DataFrame:
    """t-closeness audit — the third rung of the release-privacy ladder
    after k_anonymity and l_diversity (Li, Li & Venkatasubramanian,
    ICDE'07): a quasi-class can be k-anonymous AND l-diverse yet still
    leak if its sensitive-attribute DISTRIBUTION differs sharply from
    the corpus-wide one (skewness attack). For the categorical
    sensitive attribute ``source`` the prescribed distance is the
    variational distance t = ½·Σ_s |P_class(s) − P_global(s)|.

    Exact-hash discipline: the numerator Σ_s |c_s·N − g_s·n| is an
    exact integer (DECIMAL(19,0) operands → DECIMAL(38,0) products, the
    ab_conversion_chi2 pattern; HUGEINT on the DuckDB side), and the
    only float step is one fixed-shape double divide+scale, floor-e9
    quantized.

    Scale: three map-side-combined aggregates on low-cardinality keys,
    then a crossJoin of aggregate-sized relations only (classes ×
    the bounded source enum × one total row) — no row data moves.

    Output: (lang, chars_bucket, class_size, t_e9, at_risk) with
    at_risk = t_e9 > T_CLOSENESS_E9.
    """
    bucket = (F.floor(F.col("n_chars") / 100) * 100).cast("long")
    base = (docs.filter(F.col("lang").isNotNull()
                        & F.col("source").isNotNull()
                        & F.col("n_chars").isNotNull())
            .select("lang", bucket.alias("chars_bucket"), "source"))
    tot = base.agg(F.count(F.lit(1)).cast("decimal(19,0)").alias("nn"))
    glob = (base.groupBy("source")
            .agg(F.count(F.lit(1)).cast("decimal(19,0)").alias("g")))
    cls = (base.groupBy("lang", "chars_bucket")
           .agg(F.count(F.lit(1)).cast("decimal(19,0)").alias("n")))
    cell = (base.groupBy("lang", "chars_bucket", "source")
            .agg(F.count(F.lit(1)).cast("decimal(19,0)").alias("c")))
    x = (cls.crossJoin(F.broadcast(glob)).crossJoin(F.broadcast(tot))
         .join(cell, ["lang", "chars_bucket", "source"], "left")
         .withColumn("c", F.coalesce(F.col("c"), F.lit(0)
                                     .cast("decimal(19,0)"))))
    agg = (x.groupBy("lang", "chars_bucket", "n", "nn")
           .agg(F.sum(F.abs(F.col("c") * F.col("nn")
                            - F.col("g") * F.col("n"))).alias("s")))
    t_e9 = F.floor((F.col("s").cast("double")
                    / (F.lit(2).cast("decimal(19,0)") * F.col("n")
                       * F.col("nn")).cast("double")) * F.lit(1e9))
    return agg.select(
        "lang", "chars_bucket", F.col("n").cast("long").alias("class_size"),
        t_e9.cast("long").alias("t_e9"),
        (t_e9 > T_CLOSENESS_E9).alias("at_risk"))


def t_closeness_oracle_sql() -> str:
    """DuckDB twin of t_closeness (HUGEINT numerator, same fixed-shape
    double divide and floor-e9)."""
    return f"""
        WITH tbase AS (
            SELECT lang, (floor(n_chars / 100) * 100)::BIGINT AS chars_bucket,
                   source
            FROM documents
            WHERE lang IS NOT NULL AND source IS NOT NULL
              AND n_chars IS NOT NULL
        ),
        ttot AS (SELECT count(*)::HUGEINT AS nn FROM tbase),
        tglob AS (SELECT source, count(*)::HUGEINT AS g
                  FROM tbase GROUP BY source),
        tcls AS (SELECT lang, chars_bucket, count(*)::HUGEINT AS n
                 FROM tbase GROUP BY lang, chars_bucket),
        tcell AS (SELECT lang, chars_bucket, source, count(*)::HUGEINT AS c
                  FROM tbase GROUP BY lang, chars_bucket, source),
        tx AS (
            SELECT cl.lang, cl.chars_bucket, cl.n, t.nn,
                   sum(abs(COALESCE(ce.c, 0) * t.nn - gl.g * cl.n)) AS s
            FROM tcls cl CROSS JOIN tglob gl CROSS JOIN ttot t
            LEFT JOIN tcell ce ON ce.lang = cl.lang
                 AND ce.chars_bucket = cl.chars_bucket
                 AND ce.source = gl.source
            GROUP BY cl.lang, cl.chars_bucket, cl.n, t.nn
        )
        SELECT lang, chars_bucket, n::BIGINT AS class_size,
               floor((s::DOUBLE / (2 * n * nn)::DOUBLE) * 1e9)::BIGINT
                   AS t_e9,
               (floor((s::DOUBLE / (2 * n * nn)::DOUBLE) * 1e9)
                    > {T_CLOSENESS_E9}) AS at_risk
        FROM tx
    """


APPORTION_N = 1000


def apportion_sample(docs: DataFrame, n_target: int = APPORTION_N,
                     group_col: str = "source") -> DataFrame:
    """Exact sample-quota apportionment across sources by Hamilton's
    largest-remainder method: every source gets ⌊N·nᵢ/T⌋ slots, and the
    N − Σ⌊·⌋ leftover slots go to the largest fractional remainders —
    the ONLY rounding scheme whose quotas sum to exactly N (naive
    per-source rounding over- or under-shoots, and at 10⁴ sources the
    drift is hundreds of documents). The eval-set construction step
    after source_temperature decides the proportions.

    Pure integers: qᵢ = N·nᵢ, baseᵢ = qᵢ div T, remainderᵢ = qᵢ mod T;
    remainders rank (desc, source asc) and the top (N − Σbase) sources
    take one extra. N·nᵢ ~ 1e3·1e12 — DECIMAL(38,0) products.

    Scale: one map-side-combined groupBy to |sources| rows; the
    remainder rank window runs on that bounded table.

    Output: (source, n_docs, base_quota, extra, quota); Σ quota = N by
    construction (pinned by the unit test).
    """
    per = (docs.filter(F.col(group_col).isNotNull())
           .groupBy(F.col(group_col).alias("source"))
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs")))
    tot = per.agg(F.sum("n_docs").cast("long").alias("t"))
    q = (per.crossJoin(F.broadcast(tot))
         .select("source", "n_docs",
                 F.expr(f"cast({n_target} as decimal(38,0)) * n_docs"
                        " div t").cast("long").alias("base_quota"),
                 F.expr(f"cast(cast({n_target} as decimal(38,0))"
                        " * n_docs % t as long)").alias("rem")))
    deficit = q.agg((F.lit(n_target) - F.sum("base_quota")).cast("long")
                    .alias("d"))
    w = Window.orderBy(F.desc("rem"), F.asc("source"))
    return (q.withColumn("rk", F.row_number().over(w))
            .crossJoin(F.broadcast(deficit))
            .select("source", "n_docs", "base_quota",
                    F.when(F.col("rk") <= F.col("d"), 1).otherwise(0)
                     .cast("long").alias("extra"))
            .withColumn("quota", F.col("base_quota") + F.col("extra")))


def apportion_oracle_sql(n_target: int = APPORTION_N) -> str:
    """DuckDB twin of apportion_sample (same div/mod quotas, same
    remainder ranking)."""
    return f"""
        WITH app AS (
            SELECT source, count(*)::BIGINT AS n_docs FROM documents
            WHERE source IS NOT NULL GROUP BY source
        ),
        apt AS (SELECT sum(n_docs)::BIGINT AS t FROM app),
        apq AS (
            SELECT source, n_docs,
                   ({n_target}::HUGEINT * n_docs // t)::BIGINT
                       AS base_quota,
                   ({n_target}::HUGEINT * n_docs % t)::BIGINT AS rem
            FROM app CROSS JOIN apt
        ),
        apd AS (SELECT ({n_target} - sum(base_quota))::BIGINT AS d
                FROM apq),
        apr AS (
            SELECT *, row_number() OVER (ORDER BY rem DESC, source)
                          AS rk
            FROM apq
        )
        SELECT source, n_docs, base_quota,
               CASE WHEN rk <= d THEN 1 ELSE 0 END::BIGINT AS extra,
               base_quota + CASE WHEN rk <= d THEN 1 ELSE 0 END AS quota
        FROM apr CROSS JOIN apd
    """
