"""Web-corpus hygiene filters: C4/FineWeb line rules, encoding sanitation,
and high-entropy secret detection.

The reference extracts main content from a single document's structure
(doc_parser/dom_parser — layout, headings, tables); a 100 TB web/transcript
corpus additionally needs the CORPUS hygiene passes every training-data
pipeline runs after extraction: the C4 line/document heuristics (Raffel et
al. 2020 — terminal-punctuation lines, lorem-ipsum / curly-brace document
kills, policy-chrome line drops), mojibake/control-character detection
(ftfy-class encoding damage), and credential scanning (long high-diversity
tokens — API keys, bearer tokens — that must not reach a training set).

All three operators are pure per-row ``pyspark.sql.functions`` expressions
— JVM codegen, NO shuffle, NO Python — so each has an exact DuckDB twin
kept in this file (one payload template rendered for both engines, the
boilerplate.py discipline). The synthetic payload injects each trigger on
a distinct doc_id residue class so every rule fires on real rows at any SF.

Scale notes (100 TB): every operator here is a map-side projection — it
scans at full input width, prunes to (doc_id, text, source) at the reader
(ReadSchema), and emits constant-width rows; the only memory is the line
array of ONE document at a time. Nothing collects, nothing shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, functions as F

__all__ = ["c4_filters", "c4_oracle_sql",
           "encoding_report", "encoding_oracle_sql",
           "secrets_detect", "secrets_oracle_sql"]

# ---------------------------------------------------------------------------
# C4 line/document filters
# ---------------------------------------------------------------------------

# pinned rule constants (C4-shaped, thresholds pinned for the oracle):
# a line survives iff it ends in terminal punctuation, has >= C4_MIN_WORDS
# whitespace words, and mentions neither 'javascript' nor 'cookie'; a
# document survives iff it has no '{', no 'lorem ipsum', and >=
# C4_MIN_KEPT surviving lines.
C4_MIN_WORDS = 4
C4_MIN_KEPT = 2
_TERMINAL = '[.!?"]$'
_JS_LINE = "Please enable JavaScript to continue."
_LOREM_LINE = "Lorem ipsum dolor sit amet."
_BRACE_LINE = "if (config) { return cached; }"
_COOKIE_LINE = "We use cookies; read our privacy policy."


def c4_payload_spark() -> Column:
    """Synthetic page per document row: a headline (kept), the body with a
    terminal period only on doc_id%3==0 (the boundary case), each C4
    trigger line on its own residue class, and an unpunctuated contact
    footer (always line-dropped)."""
    nl = F.lit("\n")
    return F.concat(
        F.lit("Top story from "), F.col("source"), F.lit(" news desk."),
        nl, F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(".")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(nl, F.lit(_JS_LINE))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(nl, F.lit(_LOREM_LINE))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(nl, F.lit(_BRACE_LINE))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(nl, F.lit(_COOKIE_LINE))).otherwise(F.lit("")),
        nl, F.lit("Contact "), F.col("source"),
    )


def c4_payload_sql() -> str:
    return f"""'Top story from ' || source || ' news desk.'
        || chr(10) || text
        || CASE WHEN doc_id % 3 = 0 THEN '.' ELSE '' END
        || CASE WHEN doc_id % 4 = 0
                THEN chr(10) || '{_JS_LINE}' ELSE '' END
        || CASE WHEN doc_id % 5 = 0
                THEN chr(10) || '{_LOREM_LINE}' ELSE '' END
        || CASE WHEN doc_id % 7 = 0
                THEN chr(10) || '{_BRACE_LINE}' ELSE '' END
        || CASE WHEN doc_id % 2 = 0
                THEN chr(10) || '{_COOKIE_LINE}' ELSE '' END
        || chr(10) || 'Contact ' || source"""


def _c4_line_keep(line: Column) -> Column:
    t = F.trim(line)
    low = F.lower(line)
    return (t.rlike(_TERMINAL)
            & (F.size(F.split(t, r"\s+")) >= C4_MIN_WORDS)
            & ~low.contains("javascript")
            & ~low.contains("cookie"))


def c4_filters(docs: DataFrame) -> DataFrame:
    """C4 line + document heuristics over the synthetic page payload.

    Line rule and document rule pinned above (C4_MIN_WORDS / C4_MIN_KEPT).
    Output: (doc_id, n_lines, n_kept_lines, kept_chars, has_lorem,
    has_brace, doc_kept); kept_chars sums trimmed lengths of surviving
    lines. Reference scope note: the reference has no corpus-hygiene
    layer at all (it parses one file at a time); this is the Spark-side
    extension SURVEY §2 lists under curation.
    """
    d = (docs.filter(F.col("doc_id").isNotNull()
                     & F.col("source").isNotNull()
                     & F.col("text").isNotNull())
             .select("doc_id", c4_payload_spark().alias("_p")))
    # lines behind their own projection (split evaluated once per row)
    lines = d.select("doc_id", "_p", F.split("_p", "\n").alias("_lines"))
    kept = lines.select(
        "doc_id", "_p", "_lines",
        F.filter("_lines", _c4_line_keep).alias("_kept"))
    low = F.lower(F.col("_p"))
    n_kept = F.size("_kept")
    has_lorem = low.contains("lorem ipsum")
    has_brace = F.col("_p").contains("{")
    return kept.select(
        "doc_id",
        F.size("_lines").alias("n_lines"),
        n_kept.alias("n_kept_lines"),
        F.aggregate("_kept", F.lit(0).cast("long"),
                    lambda acc, x: acc + F.length(F.trim(x)))
         .alias("kept_chars"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (~has_lorem & ~has_brace
         & (n_kept >= C4_MIN_KEPT)).alias("doc_kept"),
    )


def c4_oracle_sql() -> str:
    """DuckDB twin of c4_filters (payload template + rule constants
    interpolated from the same pinned definitions)."""
    return rf"""
        WITH d AS (
            SELECT doc_id, {c4_payload_sql()} AS p
            FROM documents
            WHERE doc_id IS NOT NULL AND source IS NOT NULL
              AND text IS NOT NULL
        ), l AS (
            SELECT doc_id, p, string_split(p, chr(10)) AS lines
            FROM d
        ), k AS (
            SELECT doc_id, p, lines,
                   list_filter(lines, x ->
                       regexp_matches(trim(x), '{_TERMINAL}')
                       AND len(regexp_split_to_array(trim(x), '\s+'))
                           >= {C4_MIN_WORDS}
                       AND lower(x) NOT LIKE '%javascript%'
                       AND lower(x) NOT LIKE '%cookie%') AS kept
            FROM l
        )
        SELECT doc_id,
               len(lines)::INT AS n_lines,
               len(kept)::INT AS n_kept_lines,
               COALESCE(list_sum(list_transform(kept,
                   x -> length(trim(x)))), 0)::BIGINT AS kept_chars,
               (lower(p) LIKE '%lorem ipsum%') AS has_lorem,
               (p LIKE '%{{%') AS has_brace,
               (lower(p) NOT LIKE '%lorem ipsum%'
                AND p NOT LIKE '%{{%'
                AND len(kept) >= {C4_MIN_KEPT}) AS doc_kept
        FROM k
    """


# ---------------------------------------------------------------------------
# Encoding sanitation report
# ---------------------------------------------------------------------------

# mojibake markers: 'Ã' (0xC3 read as Latin-1) and 'â€' (the smart-quote
# wreck prefix); control chars exclude \t \n \r; U+FFFD is the decoder's
# own damage flag.
_MOJI_A = "Ã"          # Ã
_MOJI_B = "â€"    # â€
_CTRL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"
_NONASCII_CLASS = r"[^\x00-\x7F]"


def enc_payload_spark() -> Column:
    """Body text with encoding damage injected on residue classes:
    %6 → UTF-8-as-Latin-1 mojibake 'cafÃ©', %8 → smart-quote wreck
    'â€™', %9 → a BEL control char, %10 → U+FFFD replacement char."""
    return F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 6 == 0,
               F.lit(" cafÃ©")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 8 == 0,
               F.lit(" donâ€™t")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 9 == 0,
               F.concat(F.lit(" bell"), F.lit("\x07"))).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 10 == 0,
               F.lit(" bad�byte")).otherwise(F.lit("")),
    )


def enc_payload_sql() -> str:
    return """text
        || CASE WHEN doc_id % 6 = 0
                THEN ' caf' || chr(195) || chr(169) ELSE '' END
        || CASE WHEN doc_id % 8 = 0
                THEN ' don' || chr(226) || chr(8364) || chr(8482) || 't'
                ELSE '' END
        || CASE WHEN doc_id % 9 = 0
                THEN ' bell' || chr(7) ELSE '' END
        || CASE WHEN doc_id % 10 = 0
                THEN ' bad' || chr(65533) || 'byte' ELSE '' END"""


def _count_marker(col: Column, marker: str) -> Column:
    return ((F.length(col) - F.length(F.replace(col, F.lit(marker))))
            / len(marker)).cast("long")


def encoding_report(docs: DataFrame) -> DataFrame:
    """Per-document encoding-damage report: non-ASCII count, mojibake
    marker count ('Ã' + 'â€'), control-char count (excl. tab/newline/CR),
    U+FFFD count, and the char count after stripping ctrl+FFFD
    (clean_chars — what a sanitizer pass would keep). flagged = any
    mojibake / control / replacement evidence.

    Output: (doc_id, n_chars, n_nonascii, n_mojibake, n_ctrl, n_repl,
    clean_chars, flagged). Both engines count CHARACTERS (codepoints),
    not bytes.
    """
    d = (docs.filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
             .select("doc_id", enc_payload_spark().alias("_p")))
    p = F.col("_p")
    n_chars = F.length(p)
    n_nonascii = n_chars - F.length(F.regexp_replace(p, _NONASCII_CLASS, ""))
    n_moji = _count_marker(p, _MOJI_A) + _count_marker(p, _MOJI_B)
    n_ctrl = n_chars - F.length(F.regexp_replace(p, _CTRL_CLASS, ""))
    n_repl = _count_marker(p, "�")
    clean = F.length(F.regexp_replace(
        p, _CTRL_CLASS[:-1] + "�]", ""))
    return d.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_nonascii.cast("long").alias("n_nonascii"),
        n_moji.alias("n_mojibake"),
        n_ctrl.cast("long").alias("n_ctrl"),
        n_repl.alias("n_repl"),
        clean.cast("long").alias("clean_chars"),
        ((n_moji > 0) | (n_ctrl > 0) | (n_repl > 0)).alias("flagged"),
    )


def encoding_oracle_sql() -> str:
    """DuckDB twin of encoding_report. DuckDB's length() is codepoints
    over UTF-8 VARCHARs, matching Spark; the regex classes are shared
    RE2/Java syntax."""
    return rf"""
        WITH d AS (
            SELECT doc_id, {enc_payload_sql()} AS p
            FROM documents
            WHERE doc_id IS NOT NULL AND text IS NOT NULL
        )
        SELECT doc_id,
               length(p)::BIGINT AS n_chars,
               (length(p) - length(regexp_replace(p,
                    '{_NONASCII_CLASS}', '', 'g')))::BIGINT AS n_nonascii,
               ((length(p) - length(replace(p, chr(195), '')))
                + (length(p) - length(replace(p, chr(226) || chr(8364), '')))
                  / 2)::BIGINT AS n_mojibake,
               (length(p) - length(regexp_replace(p,
                    '{_CTRL_CLASS}', '', 'g')))::BIGINT AS n_ctrl,
               (length(p) - length(replace(p, chr(65533), '')))::BIGINT
                   AS n_repl,
               length(regexp_replace(p,
                    '{_CTRL_CLASS[:-1]}' || chr(65533) || ']', '', 'g')
                   )::BIGINT AS clean_chars,
               ((length(p) - length(replace(p, chr(195), ''))
                 + (length(p) - length(replace(p, chr(226) || chr(8364), '')))
                   / 2) > 0
                OR (length(p) - length(regexp_replace(p,
                        '{_CTRL_CLASS}', '', 'g'))) > 0
                OR (length(p) - length(replace(p, chr(65533), ''))) > 0)
                   AS flagged
        FROM d
    """


# ---------------------------------------------------------------------------
# Secret / credential detection
# ---------------------------------------------------------------------------

# pinned rule: a candidate is any run of >= SECRET_MIN_LEN word chars; it
# is flagged iff it has >= SECRET_MIN_DISTINCT distinct characters AND at
# least one digit (the cheap entropy proxy — hex keys pass, repeated-char
# and plain-word runs fail).
SECRET_MIN_LEN = 20
SECRET_MIN_DISTINCT = 12
_CAND_REGEX = r"[A-Za-z0-9_]{%d,}" % SECRET_MIN_LEN


def secrets_payload_spark() -> Column:
    """Body text plus planted candidates: %5 → 'sk_'+md5(doc_id) (a
    35-char high-diversity hex key), %11 → 'tok_'+28×'a' (long but
    low-diversity — must NOT flag)."""
    return F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit(" sk_"),
                        F.md5(F.col("doc_id").cast("string"))))
         .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0,
               F.concat(F.lit(" tok_"), F.repeat(F.lit("a"), 28)))
         .otherwise(F.lit("")),
    )


def secrets_payload_sql() -> str:
    return """text
        || CASE WHEN doc_id % 5 = 0
                THEN ' sk_' || md5(doc_id::VARCHAR) ELSE '' END
        || CASE WHEN doc_id % 11 = 0
                THEN ' tok_' || repeat('a', 28) ELSE '' END"""


def secrets_detect(docs: DataFrame) -> DataFrame:
    """Credential scan: extract long word-char runs, score each by the
    distinct-character entropy proxy, flag high-diversity digit-bearing
    tokens. Output one row per candidate: (doc_id, token, tok_len,
    n_distinct, has_digit, is_secret).

    Scale: regexp_extract_all + explode is a map-side flatMap (no
    shuffle); candidate density is ~0 on prose, so the exploded stream
    is far smaller than the input.
    """
    d = (docs.filter(F.col("doc_id").isNotNull() & F.col("text").isNotNull())
             .select("doc_id", secrets_payload_spark().alias("_p")))
    cand = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all("_p", F.lit(_CAND_REGEX), 0))
         .alias("token"))
    tok = F.col("token")
    n_distinct = F.size(F.array_distinct(F.split(tok, "")))
    has_digit = tok.rlike("[0-9]")
    return cand.select(
        "doc_id", "token",
        F.length(tok).cast("int").alias("tok_len"),
        n_distinct.cast("int").alias("n_distinct"),
        has_digit.alias("has_digit"),
        ((n_distinct >= SECRET_MIN_DISTINCT) & has_digit)
            .alias("is_secret"),
    )


def secrets_oracle_sql() -> str:
    """DuckDB twin of secrets_detect (string_split(t,'') and Spark's
    split(t,'') both yield the codepoint list — verified, no trailing
    empty element on either engine)."""
    return rf"""
        WITH d AS (
            SELECT doc_id, {secrets_payload_sql()} AS p
            FROM documents
            WHERE doc_id IS NOT NULL AND text IS NOT NULL
        ), cand AS (
            SELECT doc_id, t.token
            FROM d, UNNEST(regexp_extract_all(p, '{_CAND_REGEX}'))
                     AS t(token)
        )
        SELECT doc_id, token,
               length(token)::INT AS tok_len,
               len(list_distinct(string_split(token, '')))::INT
                   AS n_distinct,
               regexp_matches(token, '[0-9]') AS has_digit,
               (len(list_distinct(string_split(token, '')))
                    >= {SECRET_MIN_DISTINCT}
                AND regexp_matches(token, '[0-9]')) AS is_secret
        FROM cand
    """
