"""Corpus-wide boilerplate detection: the frequency vote behind every
web-scale main-content extractor.

The reference votes headers/footers WITHIN one document (frequency of a
normalized line across pages — doc_parser/dom_parser/parsers/pdf/
page_structure.py's header/footer pass, P7 in SURVEY §2); a 100 TB
transcript corpus needs the same vote ACROSS documents: navigation
chrome, subscribe banners and copyright footers repeat verbatim in most
documents of a source, while main content is (near-)unique. A line whose
document frequency within its source clears both a relative (``
min_df_pct``) and an absolute (``min_df``) threshold is boilerplate; the
per-document readout (lines kept/dropped, surviving characters) is the
cleaning plan a strip pass replays.

Scale notes (100 TB):

* Lines dedupe per document BEFORE counting (``distinct`` on
  (doc, source, line)), so a page repeating its own nav bar cannot
  inflate the corpus vote — and the df aggregate partial-combines
  map-side on (source, line).
* The per-source document totals are a sources-sized table (broadcast);
  the flag join hash-partitions on the line key — the same shuffle
  profile as exact dedup. Production would key by a fixed-width line
  hash (md5 div 2) instead of the string; the string keeps the oracle
  readable here.
* No UDFs: split/trim/lower/explode are all codegen expressions.

Payload construction (the synthetic chrome) lives HERE, as a Spark
expression and a DuckDB expression generated from one template, so the
two engines parse identical documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["corpus_boilerplate", "boilerplate_strip",
           "boilerplate_oracle_sql", "boilerplate_strip_oracle_sql",
           "bp_payload_spark"]

# one template, two renderings — keeps the engines in lockstep
_SUBSCRIBE = "Subscribe to the newsletter"


def bp_payload_spark():
    """Synthetic multi-line web page for each document row: per-source
    chrome (always), a ~1/3-frequency banner, a lang-keyed share line at
    ~1/2 frequency (df hovers at the absolute threshold — the boundary
    case), the unique body, and a per-source footer."""
    nl = F.lit("\n")
    return F.concat(
        F.lit("About "), F.col("source"),
        nl, F.col("text"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(nl, F.lit(_SUBSCRIBE))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(nl, F.lit("Share on "), F.col("lang")))
         .otherwise(F.lit("")),
        nl, F.lit("(c) 2026 "), F.col("source"),
    )


def bp_payload_sql() -> str:
    return f"""'About ' || source
        || chr(10) || text
        || CASE WHEN doc_id % 3 = 0
                THEN chr(10) || '{_SUBSCRIBE}' ELSE '' END
        || CASE WHEN doc_id % 2 = 0
                THEN chr(10) || 'Share on ' || lang ELSE '' END
        || chr(10) || '(c) 2026 ' || source"""


def _bp_docs(docs: DataFrame) -> DataFrame:
    return (docs.filter(F.col("doc_id").isNotNull()
                        & F.col("source").isNotNull()
                        & F.col("text").isNotNull()
                        & F.col("lang").isNotNull())
                .select("doc_id", "source", bp_payload_spark().alias("_p")))


def _bp_flags(lines: DataFrame, min_df_pct: int, min_df: int) -> DataFrame:
    """(source, norm, is_bp) — the corpus frequency vote over the
    per-document-deduped line table. Shared by the plan (corpus_
    boilerplate) and the apply pass (boilerplate_strip)."""
    nd = lines.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"))
    dfs = lines.groupBy("source", "norm").agg(
        F.count(F.lit(1)).alias("df"))
    return (dfs.join(F.broadcast(nd), "source")
               .select("source", "norm",
                       ((F.col("df") * 100 >= min_df_pct * F.col("n_docs"))
                        & (F.col("df") >= min_df)).alias("is_bp")))


def corpus_boilerplate(docs: DataFrame, min_df_pct: int = 40,
                       min_df: int = 3) -> DataFrame:
    """Per-document boilerplate-strip plan from the corpus frequency
    vote. Output: (doc_id, n_lines, n_bp_lines, kept_chars) where
    kept_chars sums the normalized length of surviving lines.
    """
    d = _bp_docs(docs)
    lines = (d.select("doc_id", "source",
                      F.explode(F.split("_p", "\n")).alias("_raw"))
              .select("doc_id", "source",
                      F.lower(F.trim("_raw")).alias("norm"))
              .filter(F.col("norm") != "")
              .distinct())
    flags = _bp_flags(lines, min_df_pct, min_df)
    return (lines.join(flags, ["source", "norm"])
                 .groupBy("doc_id")
                 .agg(F.count(F.lit(1)).alias("n_lines"),
                      F.sum(F.when(F.col("is_bp"), 1).otherwise(0))
                       .cast("long").alias("n_bp_lines"),
                      F.sum(F.when(F.col("is_bp"), 0)
                             .otherwise(F.length("norm")))
                       .cast("long").alias("kept_chars")))


def boilerplate_strip(docs: DataFrame, min_df_pct: int = 40,
                      min_df: int = 3) -> DataFrame:
    """Apply the corpus vote: drop flagged lines, reassemble the
    survivors in original order. This is the actual main-content
    extraction output the plan query (corpus_boilerplate) only counts —
    the cross-document twin of the reference's within-document
    header/footer strip (doc_parser/dom_parser/parsers/pdf layout pass,
    SURVEY P7). Output: (doc_id, clean_text, n_kept).

    Scale notes (100 TB): the vote side is identical to
    corpus_boilerplate (line-key shuffle, broadcast per-source totals);
    the rebuild groups by doc_id with a collect_list bounded by the
    document's OWN line count — the same per-group memory class as
    parsing the document in the first place, and the sort is in-group
    (array_sort), not a shuffle ordering.
    """
    d = _bp_docs(docs)
    pl = (d.select("doc_id", "source",
                   F.posexplode(F.split("_p", "\n")).alias("pos", "_raw"))
           .select("doc_id", "source", "pos",
                   F.lower(F.trim("_raw")).alias("norm"))
           .filter(F.col("norm") != ""))
    lines = pl.select("doc_id", "source", "norm").distinct()
    flags = _bp_flags(lines, min_df_pct, min_df)
    kept = (pl.join(flags, ["source", "norm"])
              .filter(~F.col("is_bp")))
    return (kept.groupBy("doc_id")
                .agg(F.concat_ws(
                         "\n",
                         F.transform(
                             F.array_sort(F.collect_list(
                                 F.struct("pos", "norm"))),
                             lambda x: x["norm"])).alias("clean_text"),
                     F.count(F.lit(1)).cast("long").alias("n_kept")))


def boilerplate_oracle_sql(min_df_pct: int = 40, min_df: int = 3) -> str:
    """DuckDB twin (kept beside the Spark code so the vote rule and the
    payload cannot drift)."""
    return f"""
        WITH d AS (
            SELECT doc_id, source, {bp_payload_sql()} AS p
            FROM documents
            WHERE doc_id IS NOT NULL AND source IS NOT NULL
              AND text IS NOT NULL AND lang IS NOT NULL
        ), lines AS (
            SELECT DISTINCT doc_id, source, lower(trim(l.x)) AS norm
            FROM d, UNNEST(string_split(p, chr(10))) AS l(x)
            WHERE lower(trim(l.x)) <> ''
        ), nd AS (
            SELECT source, count(DISTINCT doc_id) AS n_docs
            FROM lines GROUP BY source
        ), dfs AS (
            SELECT source, norm, count(*) AS df
            FROM lines GROUP BY source, norm
        ), flags AS (
            SELECT source, norm,
                   (df * 100 >= {int(min_df_pct)} * n_docs
                    AND df >= {int(min_df)}) AS is_bp
            FROM dfs JOIN nd USING (source)
        )
        SELECT doc_id, count(*) AS n_lines,
               sum(CASE WHEN is_bp THEN 1 ELSE 0 END)::BIGINT
                   AS n_bp_lines,
               sum(CASE WHEN is_bp THEN 0 ELSE length(norm) END)::BIGINT
                   AS kept_chars
        FROM lines JOIN flags USING (source, norm)
        GROUP BY doc_id
    """


def boilerplate_strip_oracle_sql(min_df_pct: int = 40,
                                 min_df: int = 3) -> str:
    """DuckDB twin of boilerplate_strip: zipped parallel UNNESTs give the
    0-based line position (matching Spark's posexplode), string_agg
    ORDER BY pos rebuilds the survivor text."""
    return f"""
        WITH d AS (
            SELECT doc_id, source, {bp_payload_sql()} AS p
            FROM documents
            WHERE doc_id IS NOT NULL AND source IS NOT NULL
              AND text IS NOT NULL AND lang IS NOT NULL
        ), pl0 AS (
            SELECT doc_id, source,
                   unnest(range(len(string_split(p, chr(10))))) AS pos,
                   unnest(string_split(p, chr(10))) AS raw
            FROM d
        ), pl AS (
            SELECT doc_id, source, pos, lower(trim(raw)) AS norm
            FROM pl0 WHERE lower(trim(raw)) <> ''
        ), lines AS (
            SELECT DISTINCT doc_id, source, norm FROM pl
        ), nd AS (
            SELECT source, count(DISTINCT doc_id) AS n_docs
            FROM lines GROUP BY source
        ), dfs AS (
            SELECT source, norm, count(*) AS df
            FROM lines GROUP BY source, norm
        ), flags AS (
            SELECT source, norm,
                   (df * 100 >= {int(min_df_pct)} * n_docs
                    AND df >= {int(min_df)}) AS is_bp
            FROM dfs JOIN nd USING (source)
        )
        SELECT doc_id,
               string_agg(norm, chr(10) ORDER BY pos) AS clean_text,
               count(*)::BIGINT AS n_kept
        FROM pl JOIN flags USING (source, norm)
        WHERE NOT is_bp
        GROUP BY doc_id
    """
