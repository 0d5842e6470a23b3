"""Distributed BPE merge learning — the tokenizer-training kernel of a
training-data pipeline (Sennrich et al., ACL'16), learned over the word-
TYPE table so corpus size only touches one shuffle.

Map-reduce BPE exactly as production tokenizer trainers run it: the
corpus reduces once to (word, freq) — the only corpus-sized shuffle —
and every merge round then works on the word-type table (vocabulary-
sized): count adjacent symbol pairs weighted by word frequency, pick the
most frequent pair (ties: lexicographically smallest), and re-tokenize
every word by replacing left-to-right non-overlapping occurrences of the
winning pair.

The re-tokenization is a single ``aggregate`` fold per word, entirely
inside whole-stage codegen: the accumulator is the string
``res ⟨TAB⟩ carry`` (both separators are whitespace, which the \\s+
tokenizer guarantees never appears inside a symbol), where ``res`` is
the space-joined output and ``carry`` the one-symbol lookbehind. The
DuckDB oracle runs the identical fold via ``list_reduce`` with the
initial accumulator prepended as the first list element — the two
engines execute the same recurrence, so the merge table is bit-equal.

Each round's winner stays a 1-row DataFrame cross-joined (broadcast)
into the fold — nothing is collected to the driver; rounds are a fixed
small number so plan depth is bounded (the kmeans_assign discipline).

Scale notes (100 TB): word-type tables are ~10^7 rows regardless of
corpus size; per round = one pair-count shuffle + one TakeOrdered(1) +
one map-side fold. This is why BPE trainers scale — and the shape here
is the same one Spark-NLP and HF tokenizers' distributed counts use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["bpe_merges", "bpe_encode", "bpe_oracle_sql",
           "bpe_encode_oracle_sql"]

#: separator between fold output and carry; '\t' is whitespace, so the
#: \s+ word tokenizer guarantees no symbol contains it
_TAB = "\t"


def _fold_merge(t_col, wa, wb):
    """Spark fold: re-tokenize array ``t_col`` replacing adjacent
    (wa, wb) with wa||wb, left-to-right non-overlapping."""
    def res_of(acc):
        return F.element_at(F.split(acc, _TAB, -1), 1)

    def carry_of(acc):
        return F.element_at(F.split(acc, _TAB, -1), 2)

    def join_res(res, sym):
        return F.when(res == "", sym).otherwise(F.concat(res,
                                                         F.lit(" "), sym))

    def step(acc, s):
        res, carry = res_of(acc), carry_of(acc)
        return (F.when(carry == "", F.concat(res, F.lit(_TAB), s))
                .when((carry == wa) & (s == wb),
                      F.concat(join_res(res, F.concat(wa, wb)),
                               F.lit(_TAB)))
                .otherwise(F.concat(join_res(res, carry),
                                    F.lit(_TAB), s)))

    def finish(acc):
        res, carry = res_of(acc), carry_of(acc)
        return F.when(carry == "", res).otherwise(join_res(res, carry))

    return F.split(F.aggregate(t_col, F.lit(_TAB), step, finish),
                   " ", -1)


def bpe_merges(docs: DataFrame, n_merges: int = 3,
               text_col: str = "text", max_word_len: int = 32) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over ``docs[text_col]``.

    Output: (step, left_sym, right_sym, pair_count) — one row per merge, in
    learning order; pair_count is the corpus-weighted frequency the pair
    had when it won. Words longer than ``max_word_len`` chars are
    excluded from training (bounds the fold; the standard trainer cap).
    """
    words = (docs.select(
                 F.explode(F.split(F.lower(F.coalesce(F.col(text_col),
                                                      F.lit(""))),
                                   r"\s+")).alias("w"))
             .filter((F.col("w") != "")
                     & (F.length("w") <= max_word_len)))
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    toks = wf.select("freq", F.split("w", "", -1).alias("t"))

    winners = []
    for step in range(n_merges):
        pairs = (toks.filter(F.size("t") >= 2)
                 .select("freq",
                         F.explode(F.expr(
                             "transform(sequence(1, size(t) - 1),"
                             " i -> struct(t[i-1] AS a, t[i] AS b))"))
                         .alias("p"))
                 .select("freq", F.col("p.a").alias("a"),
                         F.col("p.b").alias("b")))
        win = (pairs.groupBy("a", "b")
               .agg(F.sum("freq").alias("pair_count"))
               .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
               .limit(1))
        winners.append(win.select(F.lit(step).alias("step"),
                                  F.col("a").alias("left_sym"),
                                  F.col("b").alias("right_sym"),
                                  F.col("pair_count").cast("long")
                                  .alias("pair_count")))
        if step < n_merges - 1:
            wj = win.select(F.col("a").alias("_wa"),
                            F.col("b").alias("_wb"))
            toks = (toks.crossJoin(F.broadcast(wj))
                    .select("freq",
                            _fold_merge(F.col("t"), F.col("_wa"),
                                        F.col("_wb")).alias("t")))

    out = winners[0]
    for w in winners[1:]:
        out = out.unionByName(w)
    return out


def bpe_encode(docs: DataFrame, n_merges: int = 3,
               text_col: str = "text", id_col: str = "doc_id",
               max_word_len: int = 32) -> DataFrame:
    """Apply the first ``n_merges`` learned merges to the corpus — the
    tokenizer-APPLY half of the BPE pair (bpe_merges learns; this
    encodes) — and report per-document token budgets, the number every
    sequence-packing and context-window decision downstream consumes.

    Same scale shape as training: merges learn AND apply on the word-
    TYPE table (vocabulary-sized — the fold never touches the corpus),
    then one word-equality join prices each document's words; at 100 TB
    the type table broadcast-converts under AQE and the only corpus-
    sized operation is the tokenize-explode + final per-doc aggregate.
    Words longer than ``max_word_len`` are outside the tokenizer (the
    trainer cap) and are excluded from all three counts.

    Output: (doc_id, n_words, n_chars, n_tokens) — whitespace words,
    their characters (= pre-merge symbol count), post-merge BPE tokens.
    """
    words = (docs.select(
                 F.col(id_col),
                 F.explode(F.split(F.lower(F.coalesce(F.col(text_col),
                                                      F.lit(""))),
                                   r"\s+")).alias("w"))
             .filter((F.col("w") != "")
                     & (F.length("w") <= max_word_len)))
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    toks = wf.select("w", "freq", F.split("w", "", -1).alias("t"))

    for _ in range(n_merges):
        pairs = (toks.filter(F.size("t") >= 2)
                 .select("freq",
                         F.explode(F.expr(
                             "transform(sequence(1, size(t) - 1),"
                             " i -> struct(t[i-1] AS a, t[i] AS b))"))
                         .alias("p"))
                 .select("freq", F.col("p.a").alias("a"),
                         F.col("p.b").alias("b")))
        win = (pairs.groupBy("a", "b")
               .agg(F.sum("freq").alias("pair_count"))
               .orderBy(F.desc("pair_count"), F.asc("a"), F.asc("b"))
               .limit(1))
        wj = win.select(F.col("a").alias("_wa"), F.col("b").alias("_wb"))
        toks = (toks.crossJoin(F.broadcast(wj))
                .select("w", "freq",
                        _fold_merge(F.col("t"), F.col("_wa"),
                                    F.col("_wb")).alias("t")))

    enc = toks.select("w", F.size("t").alias("n_syms"))
    return (words.join(enc, "w")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum(F.length("w")).cast("long").alias("n_chars"),
                 F.sum("n_syms").cast("long").alias("n_tokens")))


def _fold_sql(src_t: str) -> str:
    """The list_reduce fold shared by both oracle builders; the caller
    must expose the merge row aliased ``m`` (columns a, b).

    Identical recurrence to _fold_merge; acc = res || TAB || carry.
    DuckDB's list_reduce has no init/finish params: the init
    accumulator rides as a prepended head element, and a TAB
    SENTINEL appended at the tail flushes the final carry (TAB is
    whitespace so it can never equal a symbol or m.b) — after the
    fold, the result is everything before the first TAB."""
    return f"""string_split(split_part(list_reduce(
                 list_prepend(chr(9), list_append({src_t}, chr(9))),
                 (acc, s) -> CASE
                     WHEN split_part(acc, chr(9), 2) = ''
                     THEN split_part(acc, chr(9), 1) || chr(9) || s
                     WHEN split_part(acc, chr(9), 2) = m.a AND s = m.b
                     THEN (CASE WHEN split_part(acc, chr(9), 1) = ''
                                THEN m.a || m.b
                                ELSE split_part(acc, chr(9), 1) || ' '
                                     || m.a || m.b END) || chr(9)
                     ELSE (CASE WHEN split_part(acc, chr(9), 1) = ''
                                THEN split_part(acc, chr(9), 2)
                                ELSE split_part(acc, chr(9), 1) || ' '
                                     || split_part(acc, chr(9), 2) END)
                          || chr(9) || s
                 END), chr(9), 1), ' ')"""


def bpe_oracle_sql(n_merges: int = 3, max_word_len: int = 32) -> str:
    """DuckDB twin of bpe_merges: the same per-round CTE chain — pair
    counts from the word-type table, 1-row winner, list_reduce fold
    re-tokenization (_fold_sql) with the initial accumulator prepended
    as the list head."""
    parts = [f"""wt AS (
            SELECT w, count(*)::BIGINT AS freq FROM (
                SELECT unnest(regexp_split_to_array(lower(
                           COALESCE(text, '')), '\\s+')) AS w
                FROM documents)
            WHERE w <> '' AND length(w) <= {max_word_len}
            GROUP BY w
        ), t0 AS (
            SELECT freq, regexp_split_to_array(w, '') AS t FROM wt
        )"""]
    for r in range(n_merges):
        parts.append(f"""p{r} AS (
            SELECT t[i] AS a, t[i + 1] AS b, sum(freq)::BIGINT AS cnt
            FROM t{r}, UNNEST(range(1, len(t))) AS u(i)
            WHERE len(t) >= 2
            GROUP BY 1, 2
        ), m{r} AS (
            SELECT a, b, cnt FROM p{r}
            ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
        )""")
        if r < n_merges - 1:
            parts.append(f"""t{r + 1} AS (
            SELECT freq, {_fold_sql('t')} AS t
            FROM t{r} CROSS JOIN m{r} m
        )""")
    selects = " UNION ALL ".join(
        f"SELECT {r} AS step, a AS left_sym, b AS right_sym,"
        f" cnt AS pair_count FROM m{r}" for r in range(n_merges))
    return ("WITH " + ",\n        ".join(parts) + "\n        "
            + selects)


def bpe_encode_oracle_sql(n_merges: int = 3,
                          max_word_len: int = 32) -> str:
    """DuckDB twin of bpe_encode: the bpe_merges CTE chain carrying the
    word through every fold (ALL rounds fold, unlike training which
    skips the last), then a word-equality join prices each document."""
    parts = [f"""wt AS (
            SELECT w, count(*)::BIGINT AS freq FROM (
                SELECT unnest(regexp_split_to_array(lower(
                           COALESCE(text, '')), '\\s+')) AS w
                FROM documents)
            WHERE w <> '' AND length(w) <= {max_word_len}
            GROUP BY w
        ), t0 AS (
            SELECT w, freq, regexp_split_to_array(w, '') AS t FROM wt
        )"""]
    for r in range(n_merges):
        parts.append(f"""p{r} AS (
            SELECT t[i] AS a, t[i + 1] AS b, sum(freq)::BIGINT AS cnt
            FROM t{r}, UNNEST(range(1, len(t))) AS u(i)
            WHERE len(t) >= 2
            GROUP BY 1, 2
        ), m{r} AS (
            SELECT a, b, cnt FROM p{r}
            ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
        ), t{r + 1} AS (
            SELECT w, freq, {_fold_sql('t')} AS t
            FROM t{r} CROSS JOIN m{r} m
        )""")
    parts.append(f"""enc AS (
            SELECT w, len(t) AS n_syms FROM t{n_merges}
        ), dw AS (
            SELECT doc_id, w FROM (
                SELECT doc_id, unnest(regexp_split_to_array(lower(
                           COALESCE(text, '')), '\\s+')) AS w
                FROM documents)
            WHERE w <> '' AND length(w) <= {max_word_len}
        )""")
    return ("WITH " + ",\n        ".join(parts) + """
        SELECT doc_id, count(*) AS n_words,
               sum(length(w))::BIGINT AS n_chars,
               sum(n_syms)::BIGINT AS n_tokens
        FROM dw JOIN enc USING (w)
        GROUP BY doc_id""")
