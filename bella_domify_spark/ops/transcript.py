"""Agent-transcript analytics over the (conv_id, turn_idx, role, tool, ts)
shape — the input_hint's native columns that the extraction queries leave
untouched.

The reference has no analogue (it parses payloads one file at a time); these
are the corpus-level questions a transcript warehouse answers BEFORE payload
parsing: which tools run, in what bursts, with what latency, and how the
conversation alternates between roles. All three operators are pure
DataFrame window/agg compositions — no UDFs, whole-stage-codegen end to end.

Scale notes (10^12 turns): every operator shuffles once by ``conv_id`` (the
window partition key) and then reduces; the reduced side is tiny (per-conv
rows, per-tool rows, or a ≤R² role matrix). Conversation length, not corpus
size, bounds a window partition, and the same Zipf-skew bound measured for
the extraction shuffle (FIXTURES.md) applies: the hottest conversation is
the floor. ``tool_run_stats`` adds one extra *local* aggregation
(conv_id, grp) that reuses the window's hash partitioning, so no second
shuffle materializes.

Latency outputs are exact integer microseconds (sum/max over BIGINT) — no
double accumulation, so the driver's exact-hash gate holds at every scale
factor (see ADVICE round-4 on rounded doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["tool_run_stats", "role_transitions", "tool_latency",
           "tool_latency_tail", "truncate_conversations",
           "event_trigrams", "turn_revision_stats"]


def _turn_window(conv_col: str, idx_col: str) -> Window:
    return Window.partitionBy(conv_col).orderBy(idx_col)


def tool_run_stats(t: DataFrame, conv_col: str = "conv_id",
                   idx_col: str = "turn_idx",
                   role_col: str = "role") -> DataFrame:
    """Gaps-and-islands over tool turns: per conversation, how many turns
    ran a tool, in how many consecutive runs (islands), and the longest
    run. The island id is the classic two-row_number difference — constant
    within a maximal run of tool turns, distinct across runs — computed
    with two windows over the SAME (conv) partitioning, so one shuffle.

    Conversations with zero tool turns emit no row (the filter precedes the
    aggregation on both the Spark and oracle sides)."""
    w_all = _turn_window(conv_col, idx_col)
    w_tool = Window.partitionBy(conv_col, role_col).orderBy(idx_col)
    grp = (F.row_number().over(w_all) - F.row_number().over(w_tool))
    runs = (t.withColumn("_grp", grp)
             .filter(F.col(role_col) == "tool")
             .groupBy(conv_col, "_grp")
             .agg(F.count(F.lit(1)).alias("_run_len")))
    return (runs.groupBy(conv_col)
            .agg(F.sum("_run_len").alias("n_tool_turns"),
                 F.count(F.lit(1)).alias("n_runs"),
                 F.max("_run_len").alias("longest_run")))


def role_transitions(t: DataFrame, conv_col: str = "conv_id",
                     idx_col: str = "turn_idx",
                     role_col: str = "role") -> DataFrame:
    """Corpus-wide (role → next role) transition counts: ``lead`` within
    each conversation's turn order, then a global count per ordered pair.
    The result is at most R² rows for R distinct roles — the second
    aggregation is map-side-combined down to almost nothing before its
    shuffle."""
    w = _turn_window(conv_col, idx_col)
    return (t.select(F.col(role_col).alias("role_from"),
                     F.lead(role_col).over(w).alias("role_to"))
            .filter(F.col("role_to").isNotNull())
            .groupBy("role_from", "role_to")
            .agg(F.count(F.lit(1)).alias("n")))


def tool_latency(t: DataFrame, conv_col: str = "conv_id",
                 idx_col: str = "turn_idx", role_col: str = "role",
                 tool_col: str = "tool", ts_col: str = "ts") -> DataFrame:
    """Per-tool invocation latency: for every tool turn, the gap to the
    conversation's previous turn (any role), aggregated per tool name as
    exact integer microseconds (n / sum / max — no double math anywhere,
    so cross-engine hashes match exactly; callers derive means). A tool
    turn at turn 0 has no predecessor and is excluded (NULL lag)."""
    w = _turn_window(conv_col, idx_col)
    # ts may be TIMESTAMP_NTZ: route through timestamp under the session's
    # UTC zone for epoch micros comparable with DuckDB's epoch_us()
    epoch_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = epoch_us - F.lag(epoch_us).over(w)
    return (t.withColumn("_gap_us", gap)
            .filter((F.col(role_col) == "tool") & F.col("_gap_us").isNotNull())
            .groupBy(F.col(tool_col).alias("tool"))
            .agg(F.count(F.lit(1)).alias("n_calls"),
                 F.sum("_gap_us").alias("sum_gap_us"),
                 F.max("_gap_us").alias("max_gap_us")))


def truncate_conversations(t: DataFrame, head: int = 4, tail: int = 2,
                           conv_col: str = "conv_id",
                           idx_col: str = "turn_idx",
                           role_col: str = "role") -> DataFrame:
    """Context-window fitting for long conversations: keep the first
    ``head`` and last ``tail`` turns of each conversation and label which
    segment kept each turn ('head' wins when a short conversation's
    segments overlap). The standard long-transcript truncation before
    packing into fixed training windows.

    Two row_numbers over the same conversation-keyed shuffle (asc and
    desc by turn); everything else is a map-side filter — dropped middle
    turns never leave the stage."""
    w_a = Window.partitionBy(conv_col).orderBy(F.col(idx_col).asc())
    w_d = Window.partitionBy(conv_col).orderBy(F.col(idx_col).desc())
    seg = (F.when(F.row_number().over(w_a) <= head, "head")
            .when(F.row_number().over(w_d) <= tail, "tail"))
    return (t.select(conv_col, idx_col, role_col, seg.alias("segment"))
            .filter(F.col("segment").isNotNull()))


def event_trigrams(events, k: int = 20):
    """Frequent 3-event sequences per user stream (PrefixSpan-lite at
    n=3) — funnel discovery: the top-``k`` (e1, e2, e3) consecutive
    event-type sequences across all users, ranked by count with a full
    lexicographic tie-break so the cut is deterministic.

    One shuffle keyed by user for the two leads (consecutive within a
    user's time-ordered stream), one map-side-combined count into the
    ≤|vocab|³ sequence table, then a TakeOrdered top-k — no global sort
    materializes. NULL users carry no stream; NULL timestamps are
    filtered (Spark sorts NULLs first ascending, DuckDB last — untimed
    events have no place in a *consecutive-sequence* mine, so both
    engines drop them, matching the sibling event-time queries); ties at
    the k boundary are resolved by sequence order, never by partitioning.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = (events.filter(F.col("user_id").isNotNull()
                       & F.col("ts").isNotNull())
         .select(F.col("event_type").alias("e1"),
                 F.lead("event_type", 1).over(w).alias("e2"),
                 F.lead("event_type", 2).over(w).alias("e3"))
         .filter(F.col("e2").isNotNull() & F.col("e3").isNotNull()))
    counts = s.groupBy("e1", "e2", "e3").agg(F.count(F.lit(1)).alias("cnt"))
    rw = Window.orderBy(F.desc("cnt"), "e1", "e2", "e3")
    return (counts.withColumn("rnk", F.row_number().over(rw))
            .filter(F.col("rnk") <= k)
            .select("e1", "e2", "e3", "cnt", "rnk"))


def turn_revision_stats(events: DataFrame,
                        threshold_e6: int = 500_000) -> DataFrame:
    """Self-revision detection over consecutive turns of a user stream:
    for each adjacent pair of a user's time-ordered events, the token-set
    Jaccard of their payloads — high similarity between consecutive turns
    is the signature of retried/regenerated turns, the rows a training
    pipeline collapses before packing. Integer-exact:
    ``jaccard_e6 = |A∩B|·1e6 div |A∪B|`` over DISTINCT lowercase
    alphanumeric tokens; a pair counts as a revision at
    jaccard_e6 ≥ ``threshold_e6``.

    Scale notes: one shuffle keyed by user (the lag window), token sets
    built map-side as array columns (array_intersect/array_union inside
    codegen — the DuckDB oracle instead UNNESTs and self-joins tokens, a
    deliberately different physical strategy for the same set algebra),
    then one map-side-combined per-conversation aggregate. Empty-token
    pairs score 0 (union = 0 guard).

    Output: (conv_id, n_pairs, n_revisions, sum_jaccard_e6), one row per
    user with ≥2 timed events.
    """
    e = events.filter(F.col("user_id").isNotNull()
                      & F.col("ts").isNotNull())
    toks = F.array_distinct(F.expr(
        r"filter(split(lower(coalesce(props, '')), '[^a-z0-9]+'),"
        r" x -> x != '')"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = e.select("user_id", "ts", "event_id", toks.alias("cur"))
    t = t.withColumn("prev", F.lag("cur").over(w)).filter(
        F.col("prev").isNotNull())
    inter = F.size(F.array_intersect("cur", "prev"))
    union = F.size("cur") + F.size("prev") - inter
    j = (t.select("user_id", inter.alias("i"), union.alias("u"))
         .select("user_id",
                 F.when(F.col("u") > 0,
                        F.expr("i * 1000000L div u")).otherwise(F.lit(0))
                 .cast("long").alias("j_e6")))
    return (j.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_pairs"),
                 F.sum(F.when(F.col("j_e6") >= threshold_e6, 1)
                       .otherwise(0)).cast("long").alias("n_revisions"),
                 F.sum("j_e6").cast("long").alias("sum_jaccard_e6"))
            .select(F.concat(F.lit("conv"),
                             F.col("user_id").cast("string"))
                    .alias("conv_id"),
                    "n_pairs", "n_revisions", "sum_jaccard_e6"))


CONTEXT_BUDGET_TOKENS = 256


def context_budget(events: DataFrame,
                   budget: int = CONTEXT_BUDGET_TOKENS) -> DataFrame:
    """Context-window packing readout: treat each user's time-ordered
    event stream as a conversation, cost each turn at
    ``length(props) div 4 + 1`` tokens (the chars/4 estimate every
    serving stack uses for budgeting), and find how much of the stream
    fits a ``budget``-token context — the turn where cumulative cost
    first exceeds the budget is the truncation point a packer would cut
    at. The per-conversation readout (kept turns/tokens vs total) is what
    decides max_seq_len and truncation strategy before a training run.

    Integer-exact: costs and cumulative sums are BIGINTs; a turn is kept
    iff its cumulative cost ≤ budget (prefix semantics — later turns
    never displace earlier ones).

    Scale: one shuffle keyed by user for the (ts, event_id)-ordered
    running-sum window, then a map-side-combined per-user aggregate;
    state per key is one counter.

    Output: (user_id, n_turns, total_tokens, kept_turns, kept_tokens,
    truncated).
    """
    e = events.filter(F.col("user_id").isNotNull()
                      & F.col("ts").isNotNull())
    cost = (F.expr("length(coalesce(props, '')) div 4") + 1).cast("long")
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("ts").asc(), F.col("event_id").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = (e.select("user_id", "ts", "event_id", cost.alias("_c"))
            .withColumn("_cum", F.sum("_c").over(w)))
    fits = F.col("_cum") <= budget
    return (cum.groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_turns"),
                 F.sum("_c").cast("long").alias("total_tokens"),
                 F.sum(fits.cast("long")).cast("long").alias("kept_turns"),
                 F.sum(F.when(fits, F.col("_c")).otherwise(0))
                  .cast("long").alias("kept_tokens"))
            .withColumn("truncated",
                        F.col("kept_turns") < F.col("n_turns")))


def context_budget_oracle_sql(budget: int = CONTEXT_BUDGET_TOKENS) -> str:
    """DuckDB twin of context_budget (same cost rule, same tie order)."""
    return f"""
        WITH c AS (
            SELECT user_id, event_id,
                   (length(COALESCE(props, '')) // 4 + 1)::BIGINT AS c,
                   sum(length(COALESCE(props, '')) // 4 + 1) OVER (
                       PARTITION BY user_id
                       ORDER BY ts ASC, event_id ASC
                       ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        )
        SELECT user_id,
               count(*)::BIGINT AS n_turns,
               sum(c)::BIGINT AS total_tokens,
               sum((cum <= {int(budget)})::INT)::BIGINT AS kept_turns,
               sum(CASE WHEN cum <= {int(budget)} THEN c ELSE 0 END)
                   ::BIGINT AS kept_tokens,
               (sum((cum <= {int(budget)})::INT) < count(*)) AS truncated
        FROM c
        GROUP BY user_id
    """


def tool_latency_tail(t: DataFrame, conv_col: str = "conv_id",
                      idx_col: str = "turn_idx", role_col: str = "role",
                      tool_col: str = "tool",
                      ts_col: str = "ts") -> DataFrame:
    """Tail latency per tool — the SLO numbers tool_latency's n/sum/max
    can't give: p50/p95/p99 of the gap between a tool turn and its
    conversation's previous turn. Production tool budgets are set on
    p95/p99, not means; a tool whose p99 is 50× its p50 needs a timeout
    policy, not more capacity.

    Exact order statistics by rank selection (value at rank ⌈q·n⌉,
    computed as (q_num·n + q_den − 1) div q_den) — ties never change
    the reported value, and every lag is an exact integer µs.

    Scale: the gap window partitions by conversation, the rank window
    by tool — both bounded partitions, no global sort.

    Output: (tool, n_calls, p50_us, p95_us, p99_us).
    """
    w = _turn_window(conv_col, idx_col)
    epoch_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = epoch_us - F.lag(epoch_us).over(w)
    g = (t.withColumn("_gap_us", gap)
         .filter((F.col(role_col) == "tool")
                 & F.col("_gap_us").isNotNull())
         .select(F.col(tool_col).alias("tool"), "_gap_us"))
    wt = Window.partitionBy("tool")
    ranked = (g.withColumn("n", F.count(F.lit(1)).over(wt))
               .withColumn("rn", F.row_number().over(
                   wt.orderBy("_gap_us"))))
    return (ranked.groupBy("tool")
            .agg(F.max("n").cast("long").alias("n_calls"),
                 F.min(F.when(F.expr("rn = (n + 1) div 2"),
                              F.col("_gap_us"))).alias("p50_us"),
                 F.min(F.when(F.expr("rn = (95 * n + 99) div 100"),
                              F.col("_gap_us"))).alias("p95_us"),
                 F.min(F.when(F.expr("rn = (99 * n + 99) div 100"),
                              F.col("_gap_us"))).alias("p99_us")))
