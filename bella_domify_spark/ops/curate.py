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

from pyspark.sql import DataFrame, functions as F


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
