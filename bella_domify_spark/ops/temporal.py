"""Temporal join operators: as-of join and bounded range join.

Spark has no native ASOF JOIN (DuckDB, pandas ``merge_asof`` and kdb do).
The scalable distributed realization is **union-and-carry-forward**: tag
probe and reference rows, union them, sort each key's rows by time inside
one window, and carry the most recent reference row forward with
``last(..., ignorenulls=True)`` — ONE shuffle on the key, zero join
explosion, skew bounded by the busiest key (exactly the profile of a
sort-merge join without the merge). A naive ``left.join(right, key).filter
(r.ts <= l.ts)`` + row_number would materialize |probe|x|reference| rows
per key first; at 100 TB that is the difference between a plan that runs
and one that doesn't.

The range join turns the time inequality into a bucket-equality join:
reference rows explode into the (at most 3) fixed-width buckets their
±window can reach, probes join on their single bucket, and an exact filter
trims the false candidates. Each (probe, reference) pair meets at most
once because the probe's bucket value is unique. Bucket width = the window
size keeps the explosion factor at 3; at higher event densities narrow the
buckets (cost: more exploded rows, benefit: fewer false candidates).

These operators back the `asof_view_attribution` and `range_error_context`
queries (events table). No analogue exists in the reference (it is a
document pipeline); they extend §2.6's relational checklist the same way
ops/dedup.py extends the corpus stack.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window, functions as F


def _us(col: Column) -> Column:
    """Exact integer microseconds since epoch. The events ts column is
    TIMESTAMP_NTZ; route through timestamp (session tz = UTC) for
    unix_micros — same as the session_gap epoch idiom."""
    return F.unix_micros(col.cast("timestamp"))


def _ibucket(col: Column, width_us: int) -> Column:
    """Integer time bucket, exact at any width. ``floor(us / w)`` via
    double division misbuckets once the quotient's half-ulp exceeds
    ``1/w`` (a microsecond adjacent to a boundary rounds across it — at
    day-wide buckets that is real); ``(us - us % w) / w`` divides an exact
    multiple, which is error-free, and truncated ``%`` keeps the mapping
    monotone for pre-epoch timestamps too."""
    u = _us(col)
    return ((u - u % F.lit(width_us)) / F.lit(width_us)).cast("long")


def asof_join(probe: DataFrame, reference: DataFrame, key: str, ts: str,
              carry: List[str], suffix: str = "_ref",
              ref_order: Optional[str] = None) -> DataFrame:
    """For every probe row, attach the reference row with the greatest
    ``ts`` <= the probe's ``ts`` for the same ``key`` (DuckDB
    ``ASOF LEFT JOIN`` semantics: ties match, probes with no earlier
    reference keep NULLs).

    ``carry`` names the reference columns to attach (emitted as
    ``<name><suffix>``). The carried columns travel as ONE struct so a
    legitimately-NULL carried value can never fall through to an older
    reference row.

    When the reference side can hold duplicate ``(key, ts)`` rows, pass
    ``ref_order`` (a reference column, typically the unique id): among
    tied reference rows the LARGEST ``ref_order`` wins, deterministically.
    Without it, a (key, ts)-duplicated reference makes the winner
    shuffle-layout-dependent — unacceptable upstream of an exact-hash
    gate.

    NULL-key rows: the window groups NULL keys together, so a NULL-key
    probe would match NULL-key references — SQL equality-join semantics
    (DuckDB ASOF ON key =) would NOT. Callers with nullable keys must
    filter them first; the events contract here is non-null."""
    probe_cols = probe.columns
    # reference rows sort BEFORE probe rows at equal ts => ts-tie matches
    carried = F.struct(*[F.col(c).alias(c) for c in carry])
    tb_type = (reference.schema[ref_order].dataType if ref_order else None)
    r = reference.select(
        F.col(key), F.col(ts).alias("_ts"),
        F.lit(0).alias("_p"), carried.alias("_carry"),
        *([F.col(ref_order).alias("_tb")] if ref_order else []),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"_l_{c}")
          for c in probe_cols])
    l = probe.select(
        F.col(key), F.col(ts).alias("_ts"),
        F.lit(1).alias("_p"), F.lit(None).cast(r.schema["_carry"].dataType)
        .alias("_carry"),
        *([F.lit(None).cast(tb_type).alias("_tb")] if ref_order else []),
        *[F.col(c).alias(f"_l_{c}") for c in probe_cols])
    order = ["_ts", "_p"] + (["_tb"] if ref_order else [])
    w = (Window.partitionBy(key).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u = (r.unionByName(l)
         .withColumn("_m", F.last("_carry", ignorenulls=True).over(w))
         .filter(F.col("_p") == 1))
    return u.select(
        *[F.col(f"_l_{c}").alias(c) for c in probe_cols],
        *[F.col("_m").getField(c).alias(f"{c}{suffix}") for c in carry])


def asof_join_salted(probe: DataFrame, reference: DataFrame, key: str,
                     ts: str, carry: List[str], suffix: str = "_ref",
                     ref_order: Optional[str] = None,
                     bucket_us: int = 86_400_000_000) -> DataFrame:
    """Skew-resistant ``asof_join``: identical semantics, but each key's
    timeline is range-split into fixed-width time buckets so a hot key's
    window work spreads over (hot-key rows / bucket) tasks instead of one.
    This is the "two-level carry-forward" documented in docs/PLANS.md §8 as
    the required scale path once any single key approaches ~10^8 rows.

    Level 1: the tagged union carries the latest reference struct forward
    inside each ``(key, bucket)`` window — a probe whose bucket holds an
    earlier-or-tied reference is already resolved.

    Level 2: per-(key, bucket) reference *tails* (latest reference struct
    of the bucket) are a partial-combining aggregate; Catalyst prunes that
    branch down to a narrow (key, ts, carry) rescan — no window recompute,
    no wide columns — and map-side combine shrinks its shuffle to
    #(key, bucket) rows. A tiny window over the tails frame carries each
    bucket's tail into all later buckets (strictly earlier:
    ``rowsBetween(unboundedPreceding, -1)``), and the join back hits the
    probe side on its existing (key, bucket) partitioning, so the big side
    never reshuffles (verified via explain: only the tiny tails frame
    exchanges).

    Correctness contract matches ``asof_join`` exactly (ts-tie matches,
    ``ref_order`` tie-break, non-null key/ts); equivalence is pinned by
    ``test_asof_salted_matches_plain`` across hot-key and random corpora.
    ``bucket_us`` trades straggler size (rows per bucket) against the size
    of the level-2 tails frame; the default (1 day) keeps the tails frame
    ~O(keys × days)."""
    probe_cols = probe.columns
    carried = F.struct(*[F.col(c).alias(c) for c in carry])
    tb_type = (reference.schema[ref_order].dataType if ref_order else None)
    r = reference.select(
        F.col(key), F.col(ts).alias("_ts"),
        F.lit(0).alias("_p"), carried.alias("_carry"),
        *([F.col(ref_order).alias("_tb")] if ref_order else []),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"_l_{c}")
          for c in probe_cols])
    l = probe.select(
        F.col(key), F.col(ts).alias("_ts"),
        F.lit(1).alias("_p"), F.lit(None).cast(r.schema["_carry"].dataType)
        .alias("_carry"),
        *([F.lit(None).cast(tb_type).alias("_tb")] if ref_order else []),
        *[F.col(c).alias(f"_l_{c}") for c in probe_cols])
    u = r.unionByName(l).withColumn("_b", _ibucket(F.col("_ts"), bucket_us))
    order = ["_ts", "_p"] + (["_tb"] if ref_order else [])
    w1 = (Window.partitionBy(key, "_b").orderBy(*order)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    u1 = u.withColumn("_m1", F.last("_carry", ignorenulls=True).over(w1))
    # level 2: bucket tails. max() of (ts[, tb], carry) structs picks the
    # latest reference (ref_order breaks ts ties); probe-only buckets stay
    # in the frame with a NULL tail so the carry window sees every bucket.
    tail_fields = [F.col("_ts")] + \
        ([F.col("_tb")] if ref_order else []) + [F.col("_carry")]
    tails = (u1.groupBy(key, "_b")
             .agg(F.max(F.when(F.col("_p") == 0, F.struct(*tail_fields)))
                  .alias("_tail")))
    w2 = (Window.partitionBy(key).orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1))
    prev = tails.select(
        key, "_b",
        F.last("_tail", ignorenulls=True).over(w2)
        .getField("_carry").alias("_pcarry"))
    out = (u1.filter(F.col("_p") == 1)
           .join(prev, [key, "_b"], "left")
           .withColumn("_m", F.coalesce(F.col("_m1"), F.col("_pcarry"))))
    return out.select(
        *[F.col(f"_l_{c}").alias(c) for c in probe_cols],
        *[F.col("_m").getField(c).alias(f"{c}{suffix}") for c in carry])


def range_join(probe: DataFrame, reference: DataFrame, key: str, ts: str,
               window_us: int, carry: List[str],
               suffix: str = "_ref") -> DataFrame:
    """All (probe, reference) pairs with the same ``key`` and
    ``|probe.ts - reference.ts| <= window_us`` (microseconds), one output
    row per pair. Bucketed equality join: reference explodes into the <=3
    buckets its window reaches; probes join on their single bucket; an
    exact filter trims false candidates — no cartesian, no inequality
    join."""
    probe_cols = probe.columns

    def bucket(c):
        return _ibucket(c, window_us)

    p = probe.select(*probe_cols, _us(F.col(ts)).alias("_pus"),
                     bucket(F.col(ts)).alias("_b"))
    r = reference.select(
        _us(F.col(ts)).alias("_rus"), F.col(key).alias("_rkey"),
        *[F.col(c).alias(f"{c}{suffix}") for c in carry],
        F.explode(F.array(bucket(F.col(ts)) - 1, bucket(F.col(ts)),
                          bucket(F.col(ts)) + 1)).alias("_b"))
    joined = (p.join(r, (p[key] == r["_rkey"]) & (p["_b"] == r["_b"]))
              .filter(F.abs(F.col("_pus") - F.col("_rus")) <= window_us))
    return joined.select(*[p[c] for c in probe_cols],
                         *[F.col(f"{c}{suffix}") for c in carry])


def sessionize(events: DataFrame, key: str = "user_id", ts: str = "ts",
               order_col: str = "event_id",
               gap_sec: float = 1800.0) -> DataFrame:
    """Gap-based sessionization: a new session starts when the same key's
    inter-event gap STRICTLY exceeds ``gap_sec``. One window over
    (key, ts) — a cumulative sum of new-session flags; single shuffle, no
    state loop, no iteration."""
    w = Window.partitionBy(key).orderBy(ts, order_col)
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    epoch = F.col(ts).cast("timestamp").cast("double")
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_sec), 1).otherwise(0)
    return events.select(
        key, order_col,
        F.sum(new_sess).over(cum).cast("int").alias("session_idx"))


def asof_view_attribution(events: DataFrame,
                          salted_bucket_us: Optional[int] = None) \
        -> DataFrame:
    """Attribute every click to the most recent preceding view by the same
    user (the canonical as-of use). Lag is emitted in exact integer
    microseconds — value-hash-safe across engines. ``salted_bucket_us``
    routes through the skew-resistant two-level ``asof_join_salted`` —
    same rows, hot keys spread over (rows / bucket) tasks."""
    clicks = events.filter(F.col("event_type") == "click")
    views = events.filter(F.col("event_type") == "view")
    kw = dict(key="user_id", ts="ts", carry=["event_id", "ts"],
              suffix="_view", ref_order="event_id")
    if salted_bucket_us is not None:
        j = asof_join_salted(clicks, views, bucket_us=salted_bucket_us,
                             **kw)
    else:
        j = asof_join(clicks, views, **kw)
    return j.select(
        "event_id", "user_id",
        F.col("event_id_view").alias("view_event_id"),
        (_us(F.col("ts")) - _us(F.col("ts_view"))).alias("lag_us"))


def funnel_stages(events: DataFrame,
                  stages: List[str] = ("signup", "click", "purchase")) \
        -> DataFrame:
    """Sequential funnel: per user, the furthest stage reached where each
    stage's event must come STRICTLY after the user's first qualifying
    event of the previous stage (first-touch semantics). Emits the stage
    index plus each stage's first-qualifying time in exact integer
    microseconds — all-integer logic, exact-hash-safe.

    Plan: one tiny aggregate per stage (keyed by user, partial-combining)
    chained by broadcast-joinable per-user frames; no window over the raw
    event stream, no ordering shuffle of the corpus."""
    users = events.select("user_id").distinct()
    out = users
    prev_t: Optional[str] = None
    for i, stage in enumerate(stages, start=1):
        ev = events.filter(F.col("event_type") == stage) \
            .select("user_id", _us(F.col("ts")).alias("_t"))
        if prev_t is not None:
            ev = (ev.join(out.select("user_id", prev_t), "user_id")
                  .filter(F.col("_t") > F.col(prev_t))
                  .select("user_id", "_t"))
        firsts = ev.groupBy("user_id").agg(F.min("_t").alias(f"t{i}_us"))
        out = out.join(firsts, "user_id", "left")
        prev_t = f"t{i}_us"
    stage_idx = F.lit(0)
    for i in range(1, len(stages) + 1):
        stage_idx = F.when(F.col(f"t{i}_us").isNotNull(), i) \
            .otherwise(stage_idx)
    return out.select("user_id", stage_idx.cast("int").alias("stage"),
                      *[f"t{i}_us" for i in range(1, len(stages) + 1)])


def range_error_context(events: DataFrame,
                        window_us: int = 3_600_000_000) -> DataFrame:
    """For each error event: how many same-user events happened within
    ±1 h, and their total value. Each value rounds once to DECIMAL(18,2)
    (the column's natural scale) and the sum is carried as integer CENTS
    (BIGINT), so the aggregate is partition-order-free and never
    round-trips a double — exact-hash-safe (a raw decimal output would
    stringify '51.40' in Spark but float-ify to '51.4' through DuckDB's
    pandas conversion)."""
    errors = events.filter(F.col("event_type") == "error")
    pairs = (range_join(errors, events, key="user_id", ts="ts",
                        window_us=window_us, carry=["event_id", "value"])
             .filter(F.col("event_id") != F.col("event_id_ref")))
    return (pairs.groupBy("event_id", "user_id")
            .agg(F.count("*").alias("n_ctx"),
                 F.sum((F.col("value_ref").cast("decimal(18,2)") * 100)
                       .cast("long")).alias("sum_value_cents")))


def retention_cohorts(events: DataFrame, key: str = "user_id",
                      ts: str = "ts",
                      week_us: int = 7 * 86_400 * 10 ** 6) -> DataFrame:
    """Cohort retention matrix — the warehouse staple: users cohorted by
    first-activity week, counted in each later week they return.
    Returns (cohort_week, week_offset, n_active); offset 0 is the cohort
    size. Weeks are integer epoch-µs buckets (`div week_us`), so the
    result is exact-hash-stable across engines (no date/tz functions).

    Scale notes: one shuffle keyed by user (the min-week aggregate and
    the (user, week) distinct both combine map-side and share the key),
    then a user-keyed join and a map-side-combined count into the tiny
    (cohorts × offsets) matrix. Since each user carries exactly one
    cohort week, the final count is a plain count(*), not a
    count-distinct — no Expand, no second dedup shuffle. NULL users /
    timestamps carry no identity and are dropped on both engines.
    """
    e = (events.filter(F.col(key).isNotNull() & F.col(ts).isNotNull())
               .select(F.col(key).alias("u"),
                       F.expr(f"unix_micros(cast({ts} as timestamp))"
                              f" div {week_us}").alias("w")))
    act = e.distinct()
    first = act.groupBy("u").agg(F.min("w").alias("cw"))
    return (act.join(first, "u")
               .groupBy(F.col("cw").alias("cohort_week"),
                        (F.col("w") - F.col("cw")).alias("week_offset"))
               .agg(F.count(F.lit(1)).alias("n_active")))


def late_data_stats(events: DataFrame,
                    delay_us: int = 600_000_000) -> DataFrame:
    """Watermark late-data accounting — the batch twin of Structured
    Streaming's ``withWatermark("ts", "10 minutes")`` drop ledger: replay
    each user's stream in ARRIVAL order (event_id — the ingest sequence)
    and flag every event whose event-time lags the stream's running
    max-event-time watermark by more than ``delay_us``. These are exactly
    the rows a streaming windowed aggregate would silently drop; sizing
    the delay is a data-quality decision that needs this readout first.

    Per-key watermarks (the window partitions by user) mirror
    ``applyInPandasWithState`` per-group state; a global watermark is the
    min over keys, so per-key lateness upper-bounds engine drops.

    Plan: one hash shuffle on user_id feeds a running-max window (row
    frame, no sort spill beyond a user's events — the same skew profile
    as sessionize), then a map-side-combining aggregate on event_type.
    All integer microseconds.

    Output: (event_type, n_events, n_late, max_lateness_us).
    """
    e = (events.filter(F.col("ts").isNotNull() & F.col("user_id").isNotNull()
                       & F.col("event_id").isNotNull())
               .select("event_id", "user_id", "event_type",
                       _us(F.col("ts")).alias("ts_us")))
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    d = e.select("event_type", "ts_us", F.max("ts_us").over(w).alias("wm"))
    late = F.col("wm") - F.lit(delay_us) > F.col("ts_us")
    lateness = F.col("wm") - F.lit(delay_us) - F.col("ts_us")
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("n_late"),
        F.coalesce(F.max(F.when(late, lateness)), F.lit(0)).cast("long")
         .alias("max_lateness_us"))


def concurrency_stats(events: DataFrame, key: str = "user_id",
                      ts: str = "ts", order_col: str = "event_id",
                      gap_sec: float = 1800.0,
                      hour_us: int = 3_600_000_000) -> DataFrame:
    """Per-hour peak session concurrency — the capacity-planning readout:
    how many gap-based sessions (see :func:`sessionize`) were open at once,
    maxed within each hour bucket. A session is the closed interval
    [first event, last event]; at a shared instant, starts count before
    ends (a session that begins exactly as another ends overlaps it).

    Scale notes (100 TB): the classic sweep-line needs a GLOBAL running
    sum — a single-task sort at scale. This is the two-level distributed
    prefix sum instead: endpoint deltas collapse per-instant (map-side
    combining group-by), the in-hour prefix runs under a window
    PARTITIONED BY hour (balanced shuffle), and the cross-hour carry is a
    window over the per-hour NET totals — an aggregate-sized frame (one
    row per hour; ~10^6 rows per century) broadcast back. The peak at an
    instant is ``carry-in + prefix-before + starts-here``, which is
    order-free within the instant, so no intra-tie ordering can perturb
    the hash. Hours with no endpoints carry constant concurrency and emit
    no row (documented contract; the oracle agrees by construction).

    Output: (hour_us, max_concurrent, n_starts, n_ends).
    """
    e = events.filter(F.col(key).isNotNull() & F.col(ts).isNotNull())
    sess_w = Window.partitionBy(key).orderBy(ts, order_col)
    cum = sess_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us_col = _us(F.col(ts)) - F.lag(_us(F.col(ts))).over(sess_w)
    new_sess = F.when(gap_us_col.isNull()
                      | (gap_us_col > int(gap_sec * 1e6)), 1).otherwise(0)
    sess = (e.select(F.col(key).alias("u"), _us(F.col(ts)).alias("us"),
                     F.sum(new_sess).over(cum).alias("sess"))
             .groupBy("u", "sess")
             .agg(F.min("us").alias("start_us"), F.max("us").alias("end_us")))
    ep = (sess.select(F.col("start_us").alias("us"), F.lit(1).alias("delta"),
                      F.lit(1).alias("st"))
          .unionAll(sess.select("end_us", F.lit(-1), F.lit(0))))
    per_us = (ep.groupBy("us")
                .agg(F.sum("delta").alias("net"), F.sum("st").alias("starts"),
                     F.count(F.lit(1)).alias("n_pts"))
                .withColumn("hour_us", F.col("us") - F.col("us") % hour_us))
    in_hour = Window.partitionBy("hour_us").orderBy("us") \
                    .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scanned = per_us.select(
        "hour_us", "starts", "n_pts",
        (F.sum("net").over(in_hour) - F.col("net") + F.col("starts"))
        .alias("peak_at"), "net")
    hour_net = per_us.groupBy("hour_us").agg(F.sum("net").alias("net_h"))
    carry_w = Window.orderBy("hour_us") \
                    .rowsBetween(Window.unboundedPreceding, -1)
    offsets = hour_net.select(
        "hour_us",
        F.coalesce(F.sum("net_h").over(carry_w), F.lit(0)).alias("carry"))
    return (scanned.join(F.broadcast(offsets), "hour_us")
            .groupBy("hour_us")
            .agg(F.max(F.col("carry") + F.col("peak_at")).cast("long")
                  .alias("max_concurrent"),
                 F.sum("starts").cast("long").alias("n_starts"),
                 F.sum(F.col("n_pts") - F.col("starts")).cast("long")
                  .alias("n_ends")))


def concurrency_oracle_sql(gap_sec: float = 1800.0,
                           hour_us: int = 3_600_000_000) -> str:
    """DuckDB twin of concurrency_stats (kept beside the Spark code so the
    starts-before-ends tie rule cannot drift). The oracle may use the
    global running sum Spark must avoid — same algebra, smaller engine."""
    gap_us = int(gap_sec * 1e6)
    return f"""
        WITH g AS (
            SELECT user_id AS u, epoch_us(ts) AS us,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ), s AS (
            SELECT u, us,
                   sum(CASE WHEN gap_us IS NULL OR gap_us > {gap_us}
                            THEN 1 ELSE 0 END) OVER (
                       PARTITION BY u ORDER BY us
                       ROWS UNBOUNDED PRECEDING) AS sess
            FROM g
        ), iv AS (
            SELECT u, sess, min(us) AS start_us, max(us) AS end_us
            FROM s GROUP BY u, sess
        ), ep AS (
            SELECT start_us AS us, 1 AS delta, 1 AS st FROM iv
            UNION ALL
            SELECT end_us, -1, 0 FROM iv
        ), pu AS (
            SELECT us, sum(delta) AS net, sum(st) AS starts,
                   count(*) AS n_pts
            FROM ep GROUP BY us
        ), c AS (
            SELECT us, net, starts, n_pts,
                   sum(net) OVER (ORDER BY us
                                  ROWS UNBOUNDED PRECEDING) AS cum
            FROM pu
        )
        SELECT (us - us % {int(hour_us)}) AS hour_us,
               max(cum - net + starts)::BIGINT AS max_concurrent,
               sum(starts)::BIGINT AS n_starts,
               sum(n_pts - starts)::BIGINT AS n_ends
        FROM c GROUP BY 1
    """


def late_oracle_sql(delay_us: int = 600_000_000) -> str:
    """DuckDB twin of late_data_stats (kept beside the Spark code so the
    watermark rule cannot drift)."""
    return f"""
        WITH e AS (
            SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
              AND event_id IS NOT NULL
        ), w AS (
            SELECT event_type, ts_us,
                   max(ts_us) OVER (PARTITION BY user_id ORDER BY event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING) AS wm
            FROM e
        )
        SELECT event_type, count(*) AS n_events,
               sum(CASE WHEN wm - {int(delay_us)} > ts_us
                        THEN 1 ELSE 0 END)::BIGINT AS n_late,
               COALESCE(max(CASE WHEN wm - {int(delay_us)} > ts_us
                                 THEN wm - {int(delay_us)} - ts_us END),
                        0)::BIGINT AS max_lateness_us
        FROM w GROUP BY event_type
    """


def interarrival_stats(events: DataFrame) -> DataFrame:
    """Per-event-type inter-arrival statistics over each user's event
    stream — the burstiness readout next to session_gap's raw gaps:
    does a type arrive on a steady clock (std ≪ mean: heartbeats,
    crons) or in bursts (std ≫ mean: retry storms, human sessions)?
    Each gap is the microseconds since the SAME user's previous event
    (any type) and is attributed to the later event's type.

    Integer-exact path: epoch-microsecond gaps sum in DECIMAL(38,0)
    (Σgap ~ users × span ≈ 1e22 µs at 100 TB — past int64, and Σgap²
    reaches ~1e35, still inside DECIMAL(38,0)); mean_gap_us is exact
    integer division (``div``), std_gap_us = floor(√(n·Σg² − (Σg)²)/n)
    — the variance numerator is exact, the one double conversion is
    correctly rounded from the same integer on both engines.

    Scale: the lag window partitions by user_id (corpus-cardinality
    key — no skew pileup), then ONE map-side-combined aggregate
    collapses to the enum-sized type table.

    Output: (event_type, n_gaps, mean_gap_us, std_gap_us, max_gap_us),
    types whose events never follow a previous same-user event drop.
    """
    base = (events.filter(F.col("ts").isNotNull()
                          & F.col("user_id").isNotNull()
                          & F.col("event_type").isNotNull())
            .select("user_id", "event_id", "event_type",
                    F.unix_micros(F.col("ts").cast("timestamp"))
                     .alias("ts_us")))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    g = (base.withColumn("gap_us",
                         F.col("ts_us") - F.lag("ts_us").over(w))
         .filter(F.col("gap_us").isNotNull()))
    dec = "decimal(38,0)"
    gd = F.col("gap_us").cast(dec)
    a = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum(gd).cast(dec).alias("sg"),
        F.sum(gd * gd).cast(dec).alias("sq"),
        F.max("gap_us").cast("long").alias("max_gap_us"))
    var_num = (F.col("n_gaps").cast(dec) * F.col("sq")
               - F.col("sg") * F.col("sg"))
    return a.select(
        "event_type", "n_gaps",
        F.expr("sg div n_gaps").alias("mean_gap_us"),
        F.floor(F.sqrt(var_num.cast("double")) / F.col("n_gaps"))
         .cast("long").alias("std_gap_us"),
        "max_gap_us")


def interarrival_oracle_sql() -> str:
    """DuckDB twin of interarrival_stats (HUGEINT plays DECIMAL(38,0);
    // is exact integer division on the non-negative sums)."""
    return """
        WITH base AS (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
              AND event_type IS NOT NULL
        ), g AS (
            SELECT event_type,
                   ts_us - lag(ts_us) OVER (PARTITION BY user_id
                                            ORDER BY ts_us, event_id)
                       AS gap_us
            FROM base
        ), a AS (
            SELECT event_type, count(*)::BIGINT AS n_gaps,
                   sum(gap_us::HUGEINT) AS sg,
                   sum(gap_us::HUGEINT * gap_us::HUGEINT) AS sq,
                   max(gap_us)::BIGINT AS max_gap_us
            FROM g WHERE gap_us IS NOT NULL
            GROUP BY event_type
        )
        SELECT event_type, n_gaps,
               (sg // n_gaps)::BIGINT AS mean_gap_us,
               floor(sqrt((n_gaps::HUGEINT * sq - sg * sg)::DOUBLE)
                     / n_gaps)::BIGINT AS std_gap_us,
               max_gap_us
        FROM a
    """


def transition_entropy(events: DataFrame) -> DataFrame:
    """Markov transition entropy of user event journeys — per source
    state, the Shannon entropy of "what happens next": H(next | prev) =
    −Σ p ln p over the corpus-wide (prev → next) transition table built
    from each user's time-ordered event stream. Low-entropy states are
    funnels (one dominant continuation); high-entropy states are
    browse/chaos points. The behavioral-analytics companion to
    funnel_stages' fixed-order view.

    Integer recipe: each transition type's surprisal quantizes once as
    floor(−ln(c_pn/c_p)·1e9); the state entropy is then the exact
    weighted sum Σ c_pn·s_e9 div c_p in DECIMAL(38,0) (the
    bigram_surprisal quantize-then-integer-sum discipline — no float
    summation order exists).

    Ordering determinism: each user's stream orders by (ts, event_id) —
    the event_id tie-break makes lag() identical on both engines.

    Scale: one per-user window (partitioned shuffle, no global sort)
    produces the transition stream; it aggregates map-side to the
    (prev, next) table (≤ |event_type|² rows) and everything after is
    aggregate-sized.

    Output: (prev_type, c_p, n_next, h_e9).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (events.filter(F.col("ts").isNotNull()
                         & F.col("user_id").isNotNull()
                         & F.col("event_type").isNotNull())
           .select("user_id", "ts", "event_id", "event_type")
           .withColumn("prev_type", F.lag("event_type").over(w))
           .filter(F.col("prev_type").isNotNull()))
    pn = (seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
          .agg(F.count(F.lit(1)).cast("long").alias("c_pn")))
    p = pn.groupBy("prev_type").agg(F.sum("c_pn").cast("long")
                                    .alias("c_p"),
                                    F.count(F.lit(1)).cast("long")
                                    .alias("n_next"))
    terms = (pn.join(p, "prev_type")
             .select("prev_type", "c_p", "n_next",
                     F.col("c_pn").cast("decimal(38,0)").alias("c_pn_d"),
                     F.floor(-F.log(F.col("c_pn").cast("double")
                                    / F.col("c_p").cast("double"))
                             * 1e9).cast("long").alias("s_e9")))
    return (terms.groupBy("prev_type", "c_p", "n_next")
            .agg(F.sum(F.col("c_pn_d")
                       * F.col("s_e9").cast("decimal(38,0)"))
                 .alias("num"))
            .select("prev_type", "c_p", "n_next",
                    F.expr("num div c_p").alias("h_e9")))


def transition_entropy_oracle_sql() -> str:
    """DuckDB twin of transition_entropy (same (ts, event_id) lag
    ordering, same floor-e9 surprisal-then-integer-sum)."""
    return """
        WITH teq AS (
            SELECT user_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                       AS prev_type
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
                  AND event_type IS NOT NULL
        ), tepn AS (
            SELECT prev_type, event_type AS next_type,
                   count(*)::BIGINT AS c_pn
            FROM teq WHERE prev_type IS NOT NULL
            GROUP BY prev_type, next_type
        ), tep AS (
            SELECT prev_type, sum(c_pn)::BIGINT AS c_p,
                   count(*)::BIGINT AS n_next
            FROM tepn GROUP BY prev_type
        )
        SELECT prev_type, c_p, n_next,
               (sum(c_pn::HUGEINT *
                    floor(-ln(c_pn::DOUBLE / c_p::DOUBLE)
                          * 1e9)::BIGINT)
                // c_p)::BIGINT AS h_e9
        FROM tepn JOIN tep USING (prev_type)
        GROUP BY prev_type, c_p, n_next
    """


def weekday_profile(events: DataFrame) -> DataFrame:
    """Day-of-week seasonality profile per event type, with a χ²
    uniformity statistic — the "is this metric weekly-periodic?"
    readout that decides whether anomaly baselines (anomaly_mad,
    cusum_changepoint) must be day-of-week-conditioned. chi2 ≫ the
    12.592 (α=0.05, 6 df) line means a flat baseline will page every
    weekend.

    Engine-neutral weekday: dow = (epoch_days + 4) mod 7 (1970-01-01
    was a Thursday, so 0=Sunday..6=Saturday) — pure integer on both
    engines, no locale-dependent dayofweek() anywhere. χ² against the
    uniform expectation T/7 stays integer: Σ(7c − T)²·1e6 div (7·T)
    in DECIMAL(38,0), repeated per type on each row (the gini_e9
    convention).

    Scale: one map-side-combined (type, dow) aggregate (≤ 7·|types|
    rows); everything after is aggregate-sized.

    Output: (event_type, dow, c, share_e6, chi2_e6).
    """
    per = (events.filter(F.col("ts").isNotNull()
                         & F.col("event_type").isNotNull())
           .groupBy("event_type",
                    F.pmod(F.datediff(F.to_date("ts"),
                                      F.lit("1970-01-01")) + 4, F.lit(7))
                    .cast("long").alias("dow"))
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    tot = per.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("t"))
    # absent weekday cells (c = 0) still contribute (0 - T/7)² terms:
    # num = Σ_present (7c - T)² + (7 - k)·T² with k = present cells
    chi = (per.join(tot, "event_type")
           .groupBy("event_type", "t")
           .agg(F.sum(F.expr(
               "cast(7 * c - t as decimal(38,0))"
               " * cast(7 * c - t as decimal(38,0))")).alias("num_p"),
                F.count(F.lit(1)).alias("k")))
    return (per.join(chi.select("event_type",
                                F.expr("(num_p + (7 - k) * cast(t as"
                                       " decimal(38,0)) * t) * 1000000"
                                       " div (7 * cast(t as"
                                       " decimal(38,0)))").alias("chi2_e6"),
                                F.col("t")), "event_type")
            .select("event_type", "dow", "c",
                    F.expr("cast(c as decimal(38,0)) * 1000000 div t")
                     .alias("share_e6"),
                    "chi2_e6"))


def weekday_oracle_sql() -> str:
    """DuckDB twin of weekday_profile (same (epoch_days+4) mod 7 grid,
    HUGEINT χ², // division)."""
    return """
        WITH wdp AS (
            SELECT event_type,
                   ((ts::DATE - DATE '1970-01-01') + 4) % 7 AS dow,
                   count(*)::BIGINT AS c
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
            GROUP BY event_type, dow
        ), wdt AS (
            SELECT event_type, sum(c)::BIGINT AS t FROM wdp
            GROUP BY event_type
        ), wdc AS (
            SELECT p.event_type,
                   ((sum((7 * c - t)::HUGEINT * (7 * c - t))
                     + (7 - count(*)) * max(t)::HUGEINT * max(t))
                    * 1000000 // (7 * max(t)::HUGEINT))::BIGINT
                       AS chi2_e6
            FROM wdp p JOIN wdt USING (event_type)
            GROUP BY p.event_type
        )
        SELECT p.event_type, p.dow::BIGINT AS dow, p.c,
               (c::HUGEINT * 1000000 // t)::BIGINT AS share_e6,
               chi2_e6
        FROM wdp p JOIN wdt USING (event_type)
        JOIN wdc USING (event_type)
    """


def conversion_lag(events: DataFrame, from_type: str = "view",
                   to_type: str = "purchase") -> DataFrame:
    """First-touch conversion latency: per user, the time from the
    FIRST ``from_type`` event to the first ``to_type`` event at or
    after it, summarized as conversion rate + lower-median and p90
    lag — the funnel-velocity number next to funnel_stages' pure
    counts (how MANY convert vs how FAST they do).

    Exact integers: lags are epoch-µs differences; the median is the
    lower median (rank (n+1) div 2) and p90 the rank ⌈9n/10⌉ order
    statistic — rank selection on the converted-user table, so ties
    never change the reported value. conv_rate_e6 = converted·1e6 div
    exposed in DECIMAL(38,0).

    Scale: two map-side-combined per-user aggregates + one join; the
    quantile window orders the CONVERTED-USER table (the same honest
    single-pass form as length_fences — a truly unbounded user
    population would two-level the rank selection).

    Output: one row (n_exposed, n_converted, conv_rate_e6, med_lag_us,
    p90_lag_us).
    """
    base = events.filter(F.col("ts").isNotNull()
                         & F.col("user_id").isNotNull())
    u = F.unix_micros(F.col("ts").cast("timestamp"))
    v = (base.filter(F.col("event_type") == from_type)
         .groupBy("user_id").agg(F.min(u).alias("v_us")))
    p = (base.filter(F.col("event_type") == to_type)
         .select("user_id", u.alias("p_us")))
    lag = (v.join(p, "user_id")
           .filter(F.col("p_us") >= F.col("v_us"))
           .groupBy("user_id", "v_us")
           .agg(F.min("p_us").alias("p_us"))
           .select((F.col("p_us") - F.col("v_us")).alias("lag_us")))
    n_exp = v.agg(F.count(F.lit(1)).cast("long").alias("n_exposed"))
    w = Window.orderBy("lag_us")
    ranked = (lag.withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count(F.lit(1)).over(
                  Window.partitionBy())))
    q = (ranked.groupBy("n")
         .agg(F.min(F.when(F.expr("rn = (n + 1) div 2"),
                           F.col("lag_us"))).alias("med_lag_us"),
              F.min(F.when(F.expr("rn = (9 * n + 9) div 10"),
                           F.col("lag_us"))).alias("p90_lag_us")))
    return (n_exp.crossJoin(F.broadcast(q))
            .select("n_exposed",
                    F.col("n").cast("long").alias("n_converted"),
                    F.expr("cast(n as decimal(38,0)) * 1000000"
                           " div n_exposed").alias("conv_rate_e6"),
                    "med_lag_us", "p90_lag_us"))


def conversion_lag_oracle_sql(from_type: str = "view",
                              to_type: str = "purchase") -> str:
    """DuckDB twin of conversion_lag (same first-touch min-join, same
    rank-selected quantiles)."""
    return f"""
        WITH clv AS (
            SELECT user_id, min(epoch_us(ts)) AS v_us FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
                  AND event_type = '{from_type}'
            GROUP BY user_id
        ), clp AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
            FROM events e JOIN clv USING (user_id)
            WHERE e.ts IS NOT NULL AND e.event_type = '{to_type}'
                  AND epoch_us(e.ts) >= v_us
            GROUP BY e.user_id
        ), cll AS (
            SELECT p_us - v_us AS lag_us FROM clv JOIN clp USING (user_id)
        ), clr AS (
            SELECT lag_us, row_number() OVER (ORDER BY lag_us) AS rn,
                   count(*) OVER ()::BIGINT AS n
            FROM cll
        ), clq AS (
            SELECT n,
                   min(CASE WHEN rn = (n + 1) // 2 THEN lag_us END)
                       AS med_lag_us,
                   min(CASE WHEN rn = (9 * n + 9) // 10 THEN lag_us END)
                       AS p90_lag_us
            FROM clr GROUP BY n
        ), cle AS (SELECT count(*)::BIGINT AS n_exposed FROM clv)
        SELECT n_exposed, n AS n_converted,
               (n::HUGEINT * 1000000 // n_exposed)::BIGINT
                   AS conv_rate_e6,
               med_lag_us, p90_lag_us
        FROM cle CROSS JOIN clq
    """


SURVIVAL_CENSOR_DAYS = 1


def survival_curve(events: DataFrame,
                   censor_days: int = SURVIVAL_CENSOR_DAYS) -> DataFrame:
    """Discrete Kaplan-Meier survival of user activity spans — "how
    long does a user stay active?" with the censoring done RIGHT:
    users still active near the corpus edge (last event within
    ``censor_days`` of the corpus max) are censored, not counted as
    churned — the error every naive tenure histogram makes. Spans
    measure in HOURS (this corpus's users live ~a month with
    hour-scale differences; day resolution would collapse the curve).

    Exact integer recipe: spans in whole hours; at each event time t,
    n_risk = N − (users whose span ended before t), d = uncensored
    spans equal to t; the hazard is d·1e9 div n_risk and survival is
    reported in LOG space — ln_surv_e9 = Σ floor-e9 ln((n−d)/n) over
    event times ≤ t (the bigram_surprisal quantize-then-integer-sum
    discipline; a probability PRODUCT would need exp, which is not
    correctly rounded anywhere).

    Scale: one per-user span aggregate; every window runs on the
    distinct-span-day table (calendar-bounded), not on users.

    Output: (t_hours, n_risk, d, c, haz_e9, ln_surv_e9), one row per
    span value with ≥ 1 uncensored event.
    """
    u = F.unix_micros(F.col("ts").cast("timestamp"))
    per = (events.filter(F.col("ts").isNotNull()
                         & F.col("user_id").isNotNull())
           .groupBy("user_id")
           .agg(F.min(u).alias("first_us"), F.max(u).alias("last_us")))
    mx = per.agg(F.max("last_us").alias("mx"))
    day_us = 86_400_000_000
    hour_us = 3_600_000_000
    spans = (per.crossJoin(F.broadcast(mx))
             .select(F.expr(f"(last_us - first_us) div {hour_us}")
                     .alias("t"),
                     (F.col("mx") - F.col("last_us")
                      < F.lit(censor_days * day_us)).cast("int")
                     .alias("cen")))
    g = (spans.groupBy("t")
         .agg(F.sum(F.expr("1 - cen")).cast("long").alias("d"),
              F.sum("cen").cast("long").alias("c")))
    n_tot = g.agg(F.sum(F.col("d") + F.col("c")).cast("long").alias("n"))
    w = Window.orderBy("t")
    risk = (g.crossJoin(F.broadcast(n_tot))
            .withColumn("ended_before",
                        F.coalesce(F.sum(F.col("d") + F.col("c")).over(
                            w.rowsBetween(Window.unboundedPreceding, -1)),
                            F.lit(0)))
            .withColumn("n_risk", F.col("n") - F.col("ended_before")))
    ev = (risk.filter(F.col("d") > 0)
          .withColumn("lnterm",
                      F.floor(F.log((F.col("n_risk") - F.col("d"))
                                    .cast("double")
                                    / F.col("n_risk").cast("double"))
                              * 1e9).cast("long")))
    we = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return (ev.withColumn("ln_surv_e9", F.sum("lnterm").over(we))
            .select(F.col("t").alias("t_hours"),
                    F.col("n_risk").cast("long").alias("n_risk"),
                    "d", "c",
                    F.expr("cast(d as decimal(38,0)) * 1000000000"
                           " div n_risk").alias("haz_e9"),
                    "ln_surv_e9"))


def survival_oracle_sql(censor_days: int = SURVIVAL_CENSOR_DAYS) -> str:
    """DuckDB twin of survival_curve (same spans, censor rule, risk
    sets, and floor-e9 ln((n−d)/n) integer cumsum)."""
    day_us = 86_400_000_000
    hour_us = 3_600_000_000
    return f"""
        WITH svp AS (
            SELECT user_id, min(epoch_us(ts)) AS first_us,
                   max(epoch_us(ts)) AS last_us
            FROM events
            WHERE ts IS NOT NULL AND user_id IS NOT NULL
            GROUP BY user_id
        ),
        svm AS (SELECT max(last_us) AS mx FROM svp),
        svs AS (
            SELECT (last_us - first_us) // {hour_us} AS t,
                   CASE WHEN mx - last_us < {censor_days * day_us}
                        THEN 1 ELSE 0 END AS cen
            FROM svp CROSS JOIN svm
        ),
        svg AS (
            SELECT t, sum(1 - cen)::BIGINT AS d, sum(cen)::BIGINT AS c
            FROM svs GROUP BY t
        ),
        svn AS (SELECT sum(d + c)::BIGINT AS n FROM svg),
        svr AS (
            SELECT t, d, c,
                   n - coalesce(sum(d + c) OVER (
                       ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS n_risk
            FROM svg CROSS JOIN svn
        ),
        sve AS (
            SELECT t, d, c, n_risk,
                   floor(ln((n_risk - d)::DOUBLE / n_risk::DOUBLE)
                         * 1e9)::BIGINT AS lnterm
            FROM svr WHERE d > 0
        )
        SELECT t AS t_hours, n_risk::BIGINT AS n_risk, d, c,
               (d::HUGEINT * 1000000000 // n_risk)::BIGINT AS haz_e9,
               (sum(lnterm) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING))
                   ::BIGINT AS ln_surv_e9
        FROM sve
    """
