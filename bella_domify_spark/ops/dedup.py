"""Deduplication operators for large-scale corpus curation.

All of these are pure DataFrame algebra (JVM-side, whole-stage-codegen'd) —
no Python UDFs — so Catalyst handles pushdown and AQE handles skew:

- exact_dedup        — hash-groupBy on md5(text)
- shingles / jaccard — n-gram explode + self-join on shared shingles
- minhash signatures + LSH banding — deterministic xxhash64 family
- simhash            — 64-bit sign-vote over token hashes, built as 64
                       conditional aggregates (stays in codegen)

Scale notes: the shingle self-join shuffles on the shingle value; frequent
shingles explode candidate pairs, so `jaccard_pairs` caps per-shingle
fan-out (`max_shingle_freq`) — standard MinHash-LSH practice. MinHash/LSH
reduces the candidate space from O(n²) to near-linear: pairs are generated
only within LSH band buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical texts: (text_md5, n_dups, keeper_id)."""
    return (df
            .groupBy(F.md5(F.col(text_col)).alias("text_md5"))
            .agg(F.count(F.lit(1)).alias("n_dups"),
                 F.min(id_col).alias("keeper_id"))
            )


def word_shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Documents with fewer than ``n`` words yield no shingles (guard: Spark's
    ``sequence(0, size-n)`` auto-reverses when the stop is negative, which
    would feed ``slice`` invalid start indices and abort the job under ANSI).
    """
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(0), F.size(words) - n)
    shingle = F.when(
        F.size(words) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)))
    ).otherwise(F.array().cast("array<string>"))
    return (df.select(F.col(id_col).alias("id"), F.explode(shingle).alias("shingle"))
              .distinct())


def jaccard_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  n: int = 3, threshold: float = 0.8,
                  max_shingle_freq: int = 1000) -> DataFrame:
    """All document pairs with word-``n``-gram Jaccard ≥ threshold.

    explode → drop ultra-frequent shingles (stop-shingles produce quadratic
    candidates without adding signal) → self-join on shingle → count common
    shingles → Jaccard = common / (|A| + |B| - common).
    """
    sh = word_shingles(df, id_col, text_col, n).cache()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("f"))
    sh_f = sh.join(freq.filter(F.col("f") <= max_shingle_freq), "shingle")

    a = sh_f.select(F.col("id").alias("id_a"), "shingle")
    b = sh_f.select(F.col("id").alias("id_b"), "shingle")
    common = (a.join(b, "shingle")
               .filter(F.col("id_a") < F.col("id_b"))
               .groupBy("id_a", "id_b")
               .agg(F.count(F.lit(1)).alias("n_common")))
    out = (common
           .join(sizes.withColumnRenamed("id", "id_a")
                      .withColumnRenamed("n_sh", "n_a"), "id_a")
           .join(sizes.withColumnRenamed("id", "id_b")
                      .withColumnRenamed("n_sh", "n_b"), "id_b")
           .withColumn("jaccard",
                       F.col("n_common") /
                       (F.col("n_a") + F.col("n_b") - F.col("n_common")))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "jaccard"))
    return out


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       n: int = 3, num_hashes: int = 64) -> DataFrame:
    """(id, sig: array<bigint>) — sig[i] = min over shingles of
    xxhash64(i, shingle): num_hashes independent seeded hash functions.

    Implementation note: a naive ``agg(min(h0), ..., min(h63))`` generates a
    64-buffer hash aggregate whose whole-stage codegen takes ~45 s to
    compile. (A linear family a_i·x+b_i over one base hash would keep
    codegen small but barely wraps int64, so its mins are correlated and
    the Jaccard estimate collapses.) Instead each shingle computes one
    64-element hash array with a single ``transform`` of seeded xxhash64
    calls, folded by ONE aggregate: ``reduce(collect_list(hs), +inf…,
    zip_with(least))`` — small generated code, truly independent hashes,
    deterministic across runs and cluster sizes."""
    sh = word_shingles(df, id_col, text_col, n)
    hs = F.transform(F.sequence(F.lit(0), F.lit(num_hashes - 1)),
                     lambda i: F.xxhash64(i, F.col("shingle")))
    inf = F.array_repeat(F.lit(2 ** 63 - 1).cast("long"), num_hashes)
    sig = (sh.select("id", hs.alias("hs"))
             .groupBy("id").agg(F.collect_list("hs").alias("all_hs"))
             .select("id", F.reduce(
                 "all_hs", inf,
                 lambda acc, x: F.zip_with(acc, x, lambda u, v: F.least(u, v))).alias("sig")))
    return sig


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      n: int = 3, num_hashes: int = 64, bands: int = 16,
                      threshold: float = 0.7) -> DataFrame:
    """Near-duplicate pairs via MinHash + LSH banding, verified by estimated
    Jaccard (fraction of matching minhashes ≥ threshold).

    bands × rows-per-band = num_hashes; a pair becomes a candidate if any
    band's sub-signature hashes identically. The band join is an equality
    shuffle — near-linear, no O(n²) crossJoin.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes).cache()

    band_idx = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    banded = sig.select("id", "sig", band_idx).select(
        "id", "band",
        F.xxhash64(F.col("band"),
                   F.concat_ws(",", F.transform(
                       F.slice("sig", F.col("band") * rows_per_band + 1, rows_per_band),
                       lambda x: x.cast("string")))).alias("bucket"))

    a = banded.select(F.col("id").alias("id_a"), "band", "bucket")
    b = banded.select(F.col("id").alias("id_b"), "band", "bucket")
    cand = (a.join(b, ["band", "bucket"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())

    sa = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = (cand.join(sa, "id_a").join(sb, "id_b")
           .withColumn("est_jaccard",
                       F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                                  lambda x, y: x == y),
                                       lambda m: m)) / F.lit(num_hashes))
           .filter(F.col("est_jaccard") >= threshold)
           .select("id_a", "id_b", "est_jaccard"))
    return est


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 64) -> DataFrame:
    """64-bit SimHash: per token, xxhash64(token); each bit votes ±1; the
    sign of the vote sum forms the fingerprint bit. Pure aggregates —
    whole-stage codegen, no UDF."""
    def bit_lit(b: int):
        # bit 63 exceeds signed-long range as a positive literal; use the
        # two's-complement value (sign bit) — AND/OR semantics are identical
        return F.lit(-(1 << 63) if b == 63 else (1 << b)).cast("long")

    tok = (df.select(F.col(id_col).alias("id"),
                     F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"))
             .filter(F.col("tok") != "")
             .withColumn("h", F.xxhash64("tok")))
    votes = [
        F.sum(F.when(F.col("h").bitwiseAND(bit_lit(b)) != 0, 1).otherwise(-1))
         .alias(f"b{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("id").agg(*votes)
    fp = agg.select(
        "id",
        sum((F.when(F.col(f"b{b}") > 0, bit_lit(b)).otherwise(F.lit(0).cast("long"))
             for b in range(bits)),
            start=F.lit(0).cast("long")).alias("simhash"))
    return fp


def simhash_near_dups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, blocked on bit chunks.

    Pigeonhole: distance ≤ k ⇒ at least one of k+1 chunks is equal, so the
    candidate join is an equality shuffle, not a crossJoin. Larger
    max_hamming ⇒ narrower chunks ⇒ more candidates (the standard recall/
    cost trade-off)."""
    n_chunks = max_hamming + 1
    width = max(64 // n_chunks, 1)
    mask = (1 << width) - 1
    fp = simhash(df, id_col, text_col).cache()
    chunks = fp.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("chunk"),
                     F.shiftright("simhash", i * width).bitwiseAND(F.lit(mask))
                      .alias("key"))
            for i in range(n_chunks)])).alias("c")
    ).select("id", "simhash", "c.chunk", "c.key")

    a = chunks.select(F.col("id").alias("id_a"), F.col("simhash").alias("s_a"),
                      "chunk", "key")
    b = chunks.select(F.col("id").alias("id_b"), F.col("simhash").alias("s_b"),
                      "chunk", "key")
    pairs = (a.join(b, ["chunk", "key"])
              .filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b", "s_a", "s_b").distinct()
              .withColumn("hamming", F.bit_count(F.col("s_a").bitwiseXOR(F.col("s_b"))))
              .filter(F.col("hamming") <= max_hamming)
              .select("id_a", "id_b", "hamming"))
    return pairs
