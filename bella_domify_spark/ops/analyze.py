"""ANALYZE TABLE — per-column optimizer statistics in one scan.

The stats a cost-based optimizer keys on (Spark's
``ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS``, DuckDB/duckdb's
``ANALYZE``): row count, null count, exact NDV, min/max, and total string
length, for every column of the events table. Numeric and timestamp
extrema land on an integer grid (value via floor-e6, ts via epoch
microseconds) and string extrema stay lexicographic, so the output is a
narrow typed table the driver can exact-hash.

Scale notes (100 TB): ONE scan — all per-column aggregates sit in a
single Aggregate node; the multiple exact count-distincts plan through
Spark's Expand (one row per distinct-column per input row, combined
map-side), which is the textbook exact-NDV plan. At petabyte scale you'd
swap NDV to HLL (ops/sketches.py approx_distinct_hll is the drop-in); the
exact form is kept here because the oracle gate demands bit-equality and
the Expand cost is linear. The final 6-row reshape is a stack() over the
single aggregated row — no second pass.
"""

from __future__ import annotations

import math as _math

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["analyze_table_stats", "psi_drift", "ab_conversion_chi2",
           "cuped_adjusted", "skew_report"]


def analyze_table_stats(events: DataFrame) -> DataFrame:
    """Per-column stats for the events table: (col, n_rows, n_nulls, ndv,
    min_i, max_i, min_s, max_s, sum_len). Integer columns fill min_i/max_i
    (value on the e6 grid, ts in epoch µs); string columns fill
    min_s/max_s/sum_len; the other slots are NULL."""
    e = events.select(
        "event_id", "user_id",
        F.floor(F.col("value") * 1e6).cast("long").alias("value_e6"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        "event_type", "props",
    )
    num_cols = ["event_id", "user_id", "value_e6", "ts_us"]
    str_cols = ["event_type", "props"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in num_cols + str_cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long")
             .alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__ndv"),
        ]
    for c in num_cols:
        aggs += [F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max")]
    for c in str_cols:
        aggs += [F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max"),
                 F.sum(F.length(c)).cast("long").alias(f"{c}__len")]
    a = e.agg(*aggs)
    stack_args = []
    for c in num_cols:
        stack_args.append(
            f"'{c}', {c}__nulls, {c}__ndv, {c}__min, {c}__max, "
            f"CAST(NULL AS STRING), CAST(NULL AS STRING), "
            f"CAST(NULL AS BIGINT)")
    for c in str_cols:
        stack_args.append(
            f"'{c}', {c}__nulls, {c}__ndv, CAST(NULL AS BIGINT), "
            f"CAST(NULL AS BIGINT), {c}__min, {c}__max, {c}__len")
    n = len(stack_args)
    return a.selectExpr(
        "n_rows",
        f"stack({n}, {', '.join(stack_args)}) AS "
        f"(col, n_nulls, ndv, min_i, max_i, min_s, max_s, sum_len)",
    ).select("col", "n_rows", "n_nulls", "ndv",
             "min_i", "max_i", "min_s", "max_s", "sum_len")


def analyze_oracle_sql() -> str:
    """DuckDB twin: one aggregated CTE + a 6-row UNION ALL reshape."""
    num = {
        "event_id": "event_id",
        "user_id": "user_id",
        "value_e6": "floor(value * 1e6)::BIGINT",
        "ts_us": "epoch_us(ts)",
    }
    strc = {"event_type": "event_type", "props": "props"}
    parts = ["count(*) AS n_rows"]
    for name, expr in {**num, **strc}.items():
        parts.append(f"sum(CASE WHEN {expr} IS NULL THEN 1 ELSE 0 END)"
                     f"::BIGINT AS {name}__nulls")
        parts.append(f"count(DISTINCT {expr}) AS {name}__ndv")
    for name, expr in num.items():
        parts.append(f"min({expr}) AS {name}__min")
        parts.append(f"max({expr}) AS {name}__max")
    for name, expr in strc.items():
        parts.append(f"min({expr}) AS {name}__min")
        parts.append(f"max({expr}) AS {name}__max")
        parts.append(f"sum(length({expr}))::BIGINT AS {name}__len")
    rows = []
    for name in num:
        rows.append(
            f"SELECT '{name}' AS col, n_rows, {name}__nulls AS n_nulls, "
            f"{name}__ndv AS ndv, {name}__min AS min_i, "
            f"{name}__max AS max_i, NULL::VARCHAR AS min_s, "
            f"NULL::VARCHAR AS max_s, NULL::BIGINT AS sum_len FROM a")
    for name in strc:
        rows.append(
            f"SELECT '{name}', n_rows, {name}__nulls, {name}__ndv, "
            f"NULL::BIGINT, NULL::BIGINT, {name}__min, {name}__max, "
            f"{name}__len FROM a")
    return (f"WITH a AS (SELECT {', '.join(parts)} FROM events)\n"
            + "\nUNION ALL\n".join(rows))


def psi_drift(events: DataFrame) -> DataFrame:
    """Population-Stability-Index drift monitor: the event_type
    distribution of the first time-half of the corpus against the second
    half — the standard production check that a feature's distribution
    has not shifted between a reference window and a live window.

    Midpoint = integer mean of min/max epoch-µs (broadcast scalars); both
    halves' counts add-one smooth over the union vocabulary, and each
    type's PSI term (p - q) * ln(p / q) quantizes floor-e9 to BIGINT —
    the established cross-engine-stable ln idiom (bigram_surprisal).
    Output: (event_type, c_ref, c_live, psi_e9); sum(psi_e9) > 0.2e9 is
    the conventional "significant drift" line.

    Scale notes: one scan, one map-side-combined (half, type) aggregate
    (≤ 2×|vocab| rows), the rest is aggregate-sized arithmetic — no
    per-row work after the count table.
    """
    e = events.filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
    t = e.select(
        F.unix_micros(F.col("ts").cast("timestamp")).alias("u"),
        "event_type",
    )
    mm = t.agg(F.min("u").alias("lo"), F.max("u").alias("hi"))
    halves = (t.crossJoin(F.broadcast(mm))
               .select("event_type",
                       (F.col("u") <= F.expr("(lo + hi) div 2"))
                       .alias("is_ref")))
    counts = halves.groupBy("event_type").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("c_live"),
    )
    totals = counts.agg(F.sum("c_ref").alias("n_ref"),
                        F.sum("c_live").alias("n_live"),
                        F.count(F.lit(1)).alias("v"))
    return (counts.crossJoin(F.broadcast(totals))
            .select("event_type",
                    F.col("c_ref").cast("long").alias("c_ref"),
                    F.col("c_live").cast("long").alias("c_live"),
                    F.floor(
                        ((F.col("c_ref") + 1).cast("double")
                         / (F.col("n_ref") + F.col("v"))
                         - (F.col("c_live") + 1).cast("double")
                         / (F.col("n_live") + F.col("v")))
                        * F.log(((F.col("c_ref") + 1).cast("double")
                                 * (F.col("n_live") + F.col("v")))
                                / ((F.col("c_live") + 1).cast("double")
                                   * (F.col("n_ref") + F.col("v"))))
                        * 1e9).cast("long").alias("psi_e9")))


def ab_conversion_chi2(events: DataFrame) -> DataFrame:
    """Experiment readout: a hash-assigned two-variant A/B split of users
    (variant = user_id % 2 — the deterministic stand-in for a production
    bucketing hash) with 'purchase' as the conversion event, scored by the
    2×2 chi-square statistic computed entirely in integers until the final
    ratio: chi2 = n·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d)).

    Output: one row (conv_a, nonconv_a, conv_b, nonconv_b, chi2_e6).
    Integer headroom: the numerator n·(ad−bc)² and the denominator run in
    DECIMAL(38,0) (HUGEINT on the DuckDB side — same 1e38 range), exact
    up to ~10^7 users per cell; int64 would have thrown (ANSI mode) past
    ~10^4. The final division is double (both engines convert the same
    exact integer, correctly rounded), floor-e6 quantized.

    Scale notes: one scan → per-user conversion flag (map-side-combined
    max aggregate keyed by user) → four counters in one tiny aggregate.
    Nothing user-count-sized leaves the first aggregation.
    """
    per_user = (events.filter(F.col("user_id").isNotNull())
                .groupBy("user_id")
                .agg(F.max(F.when(F.col("event_type") == "purchase", 1)
                           .otherwise(0)).alias("conv")))
    cells = per_user.agg(
        F.sum(F.when((F.expr("user_id % 2") == 0) & (F.col("conv") == 1), 1)
              .otherwise(0)).cast("long").alias("conv_a"),
        F.sum(F.when((F.expr("user_id % 2") == 0) & (F.col("conv") == 0), 1)
              .otherwise(0)).cast("long").alias("nonconv_a"),
        F.sum(F.when((F.expr("user_id % 2") == 1) & (F.col("conv") == 1), 1)
              .otherwise(0)).cast("long").alias("conv_b"),
        F.sum(F.when((F.expr("user_id % 2") == 1) & (F.col("conv") == 0), 1)
              .otherwise(0)).cast("long").alias("nonconv_b"),
    )
    # DECIMAL(19,0) operands so products land in DECIMAL(38,0) (Spark
    # caps p1+p2+1 at 38 with scale preserved) — exact to ~1e7 users/cell
    a, b, c, d = (F.col(x).cast("decimal(19,0)") for x in
                  ("conv_a", "nonconv_a", "conv_b", "nonconv_b"))
    n = a + b + c + d
    num = n * (a * d - b * c) * (a * d - b * c)
    den = (a + b) * (c + d) * (a + c) * (b + d)
    return cells.select(
        "conv_a", "nonconv_a", "conv_b", "nonconv_b",
        F.when(den > 0,
               F.floor(num.cast("double") / den.cast("double") * 1e6))
         .otherwise(F.lit(0)).cast("long").alias("chi2_e6"))


def srm_check(events: DataFrame) -> DataFrame:
    """Sample-ratio-mismatch guardrail — the readout every experiment
    platform runs BEFORE the effect test: per event_type exposure slice,
    did the hash assignment (variant = user_id % 2, the chi2/CUPED rule)
    actually deliver the designed 50/50 split? A skewed split means the
    assignment or logging is broken and ab_conversion_chi2's answer is
    garbage; SRM is the canary. Goodness-of-fit chi² against equal
    expected counts collapses to (a−b)²/(a+b), kept integer until the
    final ratio (DECIMAL(19,0) operands → DECIMAL(38,0) square, the
    ab_conversion_chi2 headroom rule). Flag fires at the 1-df p=0.05
    critical value 3.841459 compared in quantized integers, so both
    engines flip on the same row.

    Scale notes: one scan → distinct (event_type, user) — a map-side
    combining dedup on the natural key — then a tiny per-type aggregate.
    Nothing user-count-sized survives the first shuffle.

    Output: (event_type, n_a, n_b, chi2_e6, srm_flag).
    """
    per = (events.filter(F.col("user_id").isNotNull())
           .select("event_type", "user_id").distinct())
    cells = per.groupBy("event_type").agg(
        F.sum(F.when(F.expr("user_id % 2") == 0, 1).otherwise(0))
         .cast("long").alias("n_a"),
        F.sum(F.when(F.expr("user_id % 2") == 1, 1).otherwise(0))
         .cast("long").alias("n_b"))
    a = F.col("n_a").cast("decimal(19,0)")
    b = F.col("n_b").cast("decimal(19,0)")
    chi2_e6 = (F.when(a + b > 0,
                      F.floor(((a - b) * (a - b)).cast("double")
                              / (a + b).cast("double") * 1e6))
               .otherwise(F.lit(0)).cast("long"))
    return (cells.select("event_type", "n_a", "n_b",
                         chi2_e6.alias("chi2_e6"))
            .select("event_type", "n_a", "n_b", "chi2_e6",
                    F.when(F.col("chi2_e6") >= 3_841_459, 1).otherwise(0)
                     .cast("int").alias("srm_flag")))


def srm_oracle_sql() -> str:
    """DuckDB twin of srm_check (beside the Spark code so the variant
    rule and the 3.841459 critical value cannot drift)."""
    return """
        WITH per AS (
            SELECT DISTINCT event_type, user_id FROM events
            WHERE user_id IS NOT NULL
        ), c AS (
            SELECT event_type,
                   sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS n_a,
                   sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS n_b
            FROM per GROUP BY event_type
        ), s AS (
            SELECT event_type, n_a, n_b,
                   CASE WHEN n_a + n_b > 0 THEN
                       floor(((n_a - n_b)::HUGEINT * (n_a - n_b))::DOUBLE
                             / (n_a + n_b)::DOUBLE * 1e6)::BIGINT
                   ELSE 0 END AS chi2_e6
            FROM c
        )
        SELECT event_type, n_a, n_b, chi2_e6,
               CASE WHEN chi2_e6 >= 3841459 THEN 1 ELSE 0 END::INT
                   AS srm_flag
        FROM s
    """


#: demo expectation suite over the events table — (rule, spark_pred,
#: duckdb_pred). Predicates are per-row booleans; NULL counts as a
#: violation (COALESCE(pred, FALSE) on both engines). In production the
#: suite is user-supplied; this fixed set mixes clean rules with two
#: that real rows violate, so the readout is not trivially zero.
DEFAULT_EXPECTATIONS = [
    ("user_id_not_null", "user_id IS NOT NULL", "user_id IS NOT NULL"),
    ("ts_not_null", "ts IS NOT NULL", "ts IS NOT NULL"),
    ("known_event_type",
     "event_type IN ('click','error','purchase','signup','view')",
     "event_type IN ('click','error','purchase','signup','view')"),
    ("value_le_95", "value IS NULL OR value <= 95.0",
     "value IS NULL OR value <= 95.0"),
    ("props_k_lt_90",
     "CAST(get_json_object(props, '$.k') AS BIGINT) < 90",
     "CAST(json_extract_string(props, '$.k') AS BIGINT) < 90"),
]


def expectations_report(events: DataFrame, rules=None) -> DataFrame:
    """Delta-expectations / dbt-test style constraint audit: per rule,
    how many rows violate it and the smallest offending event_id (the
    reproducible example a data steward opens first). A NULL predicate
    is a violation — constraints assert knowledge, and NULL is the
    absence of it.

    Scale notes (100 TB): ONE scan, ONE wide conditional aggregate — two
    buffers per rule (violation count + min example id), all map-side
    combining (the CLAUDE.md wide-aggregate result: 60+ conditional
    buffers beat per-rule passes ~4×). The per-rule rows come from
    ``stack`` over the single aggregate row — driver-tiny.

    Output: (rule, n_checked, n_violations, min_bad_event_id) —
    min_bad_event_id = -1 when the rule is clean.
    """
    rules = DEFAULT_EXPECTATIONS if rules is None else rules
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, (_, sexpr, _d) in enumerate(rules):
        ok = F.coalesce(F.expr(sexpr), F.lit(False))
        aggs.append(F.sum(F.when(ok, 0).otherwise(1)).cast("long")
                    .alias(f"v{i}"))
        aggs.append(F.coalesce(F.min(F.when(~ok, F.col("event_id"))),
                               F.lit(-1)).alias(f"m{i}"))
    row = events.agg(*aggs)
    stack = ", ".join(f"'{nm}', v{i}, m{i}"
                      for i, (nm, _s, _d) in enumerate(rules))
    return (row.select(
        F.col("n").alias("n_checked"),
        F.expr(f"stack({len(rules)}, {stack}) AS "
               f"(rule, n_violations, min_bad_event_id)"))
        .select("rule", "n_checked", "n_violations", "min_bad_event_id"))


def expectations_oracle_sql(rules=None) -> str:
    """DuckDB twin of expectations_report (one aggregate row, unioned
    out per rule — the NULL-is-violation rule pinned beside the Spark
    code)."""
    rules = DEFAULT_EXPECTATIONS if rules is None else rules
    cols = ["count(*) AS n"]
    for i, (_, _s, dexpr) in enumerate(rules):
        cols.append(f"""sum(CASE WHEN COALESCE({dexpr}, FALSE)
                         THEN 0 ELSE 1 END)::BIGINT AS v{i}""")
        cols.append(f"""COALESCE(min(CASE WHEN NOT COALESCE({dexpr}, FALSE)
                         THEN event_id END), -1) AS m{i}""")
    sel = ",\n            ".join(cols)
    unions = "\n            UNION ALL ".join(
        f"SELECT '{nm}' AS rule, n AS n_checked, v{i} AS n_violations, "
        f"m{i} AS min_bad_event_id FROM agg"
        for i, (nm, _s, _d) in enumerate(rules))
    return f"""
        WITH agg AS (
            SELECT {sel}
            FROM events
        )
        {unions}
    """


def anomaly_mad(events: DataFrame, hour_us: int = 3_600_000_000,
                k_e2: int = 300) -> DataFrame:
    """Robust volume-anomaly flags — the monitoring readout: hourly event
    counts per event_type, scored against the type's median and MAD
    (median absolute deviation), flagged when |cnt − med| > k·MAD with
    k = ``k_e2``/100 (default 3.0 — the classic Hampel rule). Median and
    MAD resist the very outliers being hunted, unlike mean/stddev.

    Exactness: LOWER median (the value at row (n+1) div 2 ordered
    ascending) — a multiset element, never an interpolated float — so
    med, MAD and the flag inequality (100·dev > k_e2·MAD) are all
    integers; no engine can round differently. Degenerate MAD = 0 (over
    half the hours identical) flags every deviating hour — the standard
    Hampel behavior, intentionally kept.

    Scale notes: the raw scan reduces immediately to the
    (event_type × hour) count grid — aggregate-sized (10⁴ types ×
    10⁶ hours/century worst case) — and every window/join after runs on
    that grid keyed by event_type. One corpus-sized map-side-combining
    shuffle total.

    Output: (event_type, hour_us, cnt, med, mad, is_anomaly).
    """
    e = events.filter(F.col("ts").isNotNull())
    u = F.unix_micros(F.col("ts").cast("timestamp"))
    hc = (e.select("event_type", (u - u % hour_us).alias("hour_us"))
          .groupBy("event_type", "hour_us")
          .agg(F.count(F.lit(1)).alias("cnt")))

    def _lower_median(df: DataFrame, val: str, out: str) -> DataFrame:
        w = Window.partitionBy("event_type").orderBy(val, "hour_us")
        n = Window.partitionBy("event_type")
        return (df.select("event_type", F.col(val),
                          F.row_number().over(w).alias("rn"),
                          F.count(F.lit(1)).over(n).alias("n"))
                .filter(F.col("rn") == F.expr("(n + 1) div 2"))
                .select("event_type", F.col(val).alias(out)))

    med = _lower_median(hc, "cnt", "med")
    d = (hc.join(F.broadcast(med), "event_type")
         .withColumn("dev", F.abs(F.col("cnt") - F.col("med"))))
    mad = _lower_median(d.select("event_type", "hour_us",
                                 F.col("dev").alias("cnt")), "cnt", "mad")
    return (d.join(F.broadcast(mad), "event_type")
            .select("event_type", "hour_us", "cnt", "med", "mad",
                    F.when(100 * F.col("dev") > k_e2 * F.col("mad"), 1)
                     .otherwise(0).cast("int").alias("is_anomaly")))


def anomaly_oracle_sql(hour_us: int = 3_600_000_000,
                       k_e2: int = 300) -> str:
    """DuckDB twin of anomaly_mad (lower-median + Hampel rule pinned
    beside the Spark code)."""
    return f"""
        WITH hc AS (
            SELECT event_type,
                   epoch_us(ts) - epoch_us(ts) % {int(hour_us)} AS hour_us,
                   count(*) AS cnt
            FROM events WHERE ts IS NOT NULL
            GROUP BY 1, 2
        ), m AS (
            SELECT event_type, cnt AS med FROM (
                SELECT event_type, cnt,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY cnt, hour_us) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM hc)
            WHERE rn = (n + 1) // 2
        ), d AS (
            SELECT hc.event_type, hc.hour_us, hc.cnt, m.med,
                   abs(hc.cnt - m.med) AS dev
            FROM hc JOIN m USING (event_type)
        ), md AS (
            SELECT event_type, dev AS mad FROM (
                SELECT event_type, dev,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY dev, hour_us) AS rn,
                       count(*) OVER (PARTITION BY event_type) AS n
                FROM d)
            WHERE rn = (n + 1) // 2
        )
        SELECT d.event_type, d.hour_us, d.cnt, d.med, md.mad,
               CASE WHEN 100 * d.dev > {int(k_e2)} * md.mad
                    THEN 1 ELSE 0 END::INT AS is_anomaly
        FROM d JOIN md USING (event_type)
    """


def cuped_adjusted(events: DataFrame) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al., WSDM'13):
    per-user pre-period spend (first time-half, cents) is the covariate
    X for the live-period metric Y (second half); θ = cov(X,Y)/var(X)
    pooled over users, and each variant reports its raw and
    CUPED-adjusted mean: ȳ_v − θ·(x̄_v − x̄).

    Determinism: X, Y and all pooled sums (Σx, Σy, Σxy, Σx²) are exact
    BIGINTs (cents keep Σxy < 2^53, so the doubles they become are
    exactly representable); the θ/mean block is then a fixed-shape IEEE
    double expression — identical operand order on both engines means
    identical bits, and floor-e6 quantization pins the outputs. int64
    headroom: Σxy safe to ~10^6 users × 10^3 events at cents scale;
    beyond that the sums move to DECIMAL(38,0).

    Plan: one scan → per-user (x, y) via one map-side-combined aggregate
    keyed by user → two aggregate-sized reductions (pooled scalars,
    per-variant sums) joined by a broadcast cross join. Nothing
    user-count-sized leaves the first aggregation.
    """
    e = events.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull()
                      & F.col("value").isNotNull())
    t = e.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("u"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    mm = t.agg(F.min("u").alias("lo"), F.max("u").alias("hi"))
    per_user = (t.crossJoin(F.broadcast(mm))
                .groupBy("user_id")
                .agg(F.sum(F.when(F.expr("u <= (lo + hi) div 2"),
                                  F.col("cents")).otherwise(0))
                      .alias("x"),
                     F.sum(F.when(F.expr("u > (lo + hi) div 2"),
                                  F.col("cents")).otherwise(0))
                      .alias("y")))
    pooled = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"))
    variants = (per_user.groupBy(F.expr("user_id % 2").alias("variant"))
                .agg(F.count(F.lit(1)).alias("n_v"),
                     F.sum("x").alias("sx_v"), F.sum("y").alias("sy_v")))
    j = variants.crossJoin(F.broadcast(pooled))
    nd = F.col("n").cast("double")
    cov = nd * F.col("sxy").cast("double") \
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    var = nd * F.col("sxx").cast("double") \
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    theta = cov / var
    mean_y = F.col("sy_v").cast("double") / F.col("n_v").cast("double")
    mean_x = F.col("sx_v").cast("double") / F.col("n_v").cast("double")
    gmean_x = F.col("sx").cast("double") / nd
    return j.select(
        "variant",
        F.col("n_v").alias("n_users"),
        F.col("sx_v").alias("sum_x_cents"),
        F.col("sy_v").alias("sum_y_cents"),
        F.floor(theta * 1e6).cast("long").alias("theta_e6"),
        F.floor(mean_y * 1e6).cast("long").alias("mean_y_e6"),
        F.floor((mean_y - theta * (mean_x - gmean_x)) * 1e6).cast("long")
         .alias("mean_adj_e6"))


def skew_report(df: DataFrame, key_col: str, n_top: int = 10) -> DataFrame:
    """Shuffle-key skew diagnostics — the planning operator behind every
    "salt the hot key" decision in this repo (ops/temporal.py salted
    asof, manifest.with_bucket): per-key row counts, the ``n_top``
    heaviest keys, each key's corpus share, and the salt factor a
    mean-sized partitioning would need (cnt · n_keys div n_rows —
    "this key is N× the mean, split it N ways").

    Scale notes (100 TB): ONE map-side-combined count keyed by the
    candidate shuffle key (the exact aggregation the skewed job itself
    would run, so the diagnostic costs what one AQE stage costs); the
    count table is key-cardinality-sized, the totals reduce to one row
    and broadcast back, and the global top-N window materializes as
    TakeOrdered work after the rank filter — nothing key-sized is
    collected. All integer.

    Output: (rank, key, cnt, share_e6, salt_factor), heaviest first,
    ties by smallest key.
    """
    from pyspark.sql import Window

    counts = (df.filter(F.col(key_col).isNotNull())
              .groupBy(F.col(key_col).alias("key"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    totals = counts.agg(F.count(F.lit(1)).alias("n_keys"),
                        F.sum("cnt").alias("n_rows"))
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return (counts.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= n_top)
            .crossJoin(F.broadcast(totals))
            .select("rank", "key", "cnt",
                    F.expr("cnt * 1000000L div n_rows").alias("share_e6"),
                    F.expr("cnt * n_keys div n_rows").cast("long")
                     .alias("salt_factor")))


def quantile_effects(events: DataFrame, n_buckets: int = 10) -> DataFrame:
    """Quantile treatment effects — the distributional companion to the
    mean readouts (ab_conversion_chi2, cuped_adjusted): split users into
    pooled metric deciles and report the per-decile variant gap, exposing
    effects that concentrate in the tails (a heavy-user regression with a
    flat mean, a floor effect in the bottom decile) that a single mean
    cancels out.

    Metric = per-user floor-e6 value sum; variant = user_id % 2 (the
    chi2 assignment rule). Deciles come from ``ntile`` over the POOLED
    (metric, user_id) total order — fully tie-broken, so both engines
    cut identical buckets. The ntile window is a global sort of the
    per-USER aggregate (users-sized, not events-sized); at 100 TB the
    swap-in is percentile_approx boundary tables, exactly like
    analyze_table_stats' exact-NDV caveat — noted, not hidden.

    All integer: means are truncating integer divisions (``div`` ≡
    DuckDB ``//`` on these operands — the kmeans_assign precedent).

    Output: (bucket 1..n, n_a, n_b, mean_a_e6, mean_b_e6, qte_e6) where
    qte_e6 = mean_b − mean_a (0 when a side is empty).
    """
    from pyspark.sql import Window

    pu = (events.filter(F.col("user_id").isNotNull()
                        & F.col("value").isNotNull())
                .groupBy("user_id")
                .agg(F.sum(F.floor(F.col("value") * 1e6).cast("long"))
                      .alias("m_e6")))
    w = Window.orderBy("m_e6", "user_id")
    d = pu.select(F.expr("user_id % 2").alias("variant"), "m_e6",
                  F.ntile(n_buckets).over(w).cast("long").alias("bucket"))
    agg = d.groupBy("bucket").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("long")
         .alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("long")
         .alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("m_e6")).otherwise(0))
         .cast("long").alias("_sa"),
        F.sum(F.when(F.col("variant") == 1, F.col("m_e6")).otherwise(0))
         .cast("long").alias("_sb"))
    mean_a = F.when(F.col("n_a") > 0, F.expr("_sa div n_a")) \
              .otherwise(F.lit(0)).cast("long")
    mean_b = F.when(F.col("n_b") > 0, F.expr("_sb div n_b")) \
              .otherwise(F.lit(0)).cast("long")
    return (agg.select("bucket", "n_a", "n_b",
                       mean_a.alias("mean_a_e6"),
                       mean_b.alias("mean_b_e6"))
               .select("bucket", "n_a", "n_b", "mean_a_e6", "mean_b_e6",
                       F.when((F.col("n_a") > 0) & (F.col("n_b") > 0),
                              F.col("mean_b_e6") - F.col("mean_a_e6"))
                        .otherwise(F.lit(0)).cast("long")
                        .alias("qte_e6")))


def qte_oracle_sql(n_buckets: int = 10) -> str:
    """DuckDB twin of quantile_effects (kept beside the Spark code)."""
    return f"""
        WITH pu AS (
            SELECT user_id,
                   sum(floor(value * 1e6)::BIGINT)::BIGINT AS m_e6
            FROM events
            WHERE user_id IS NOT NULL AND value IS NOT NULL
            GROUP BY user_id
        ), d AS (
            SELECT user_id % 2 AS variant, m_e6,
                   ntile({int(n_buckets)})
                       OVER (ORDER BY m_e6, user_id) AS bucket
            FROM pu
        ), agg AS (
            SELECT bucket,
                   sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS n_a,
                   sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END)::BIGINT
                       AS n_b,
                   sum(CASE WHEN variant = 0 THEN m_e6 ELSE 0 END)::BIGINT
                       AS sa,
                   sum(CASE WHEN variant = 1 THEN m_e6 ELSE 0 END)::BIGINT
                       AS sb
            FROM d GROUP BY bucket
        ), m AS (
            SELECT bucket, n_a, n_b,
                   (CASE WHEN n_a > 0 THEN sa // n_a ELSE 0 END)::BIGINT
                       AS mean_a_e6,
                   (CASE WHEN n_b > 0 THEN sb // n_b ELSE 0 END)::BIGINT
                       AS mean_b_e6
            FROM agg
        )
        SELECT bucket::BIGINT AS bucket, n_a, n_b, mean_a_e6, mean_b_e6,
               (CASE WHEN n_a > 0 AND n_b > 0
                     THEN mean_b_e6 - mean_a_e6 ELSE 0 END)::BIGINT
                   AS qte_e6
        FROM m
    """


def rater_kappa(docs: DataFrame) -> DataFrame:
    """Cohen's kappa between the two quality raters the pipeline already
    runs: rater A = the Gopher heuristic gate (textstats.gopher_quality
    ``keep``), rater B = the hashed linear classifier
    (classifier.quality_classifier ``label == 'keep'``). Chance-corrected
    agreement is the standard readout before trusting a learned filter to
    replace (or be distilled from) a heuristic one — raw agreement is
    inflated whenever both raters mostly say "drop".

    κ = (pₒ − pₑ)/(1 − pₑ) computed in exact integer form first:
    num = N·(n11+n00) − (a1·b1 + a0·b0), den = N² − (a1·b1 + a0·b0),
    with DECIMAL(19,0) operands (the chi2 pattern — products stay exact
    to ~1e7 docs per cell at 100 TB), then one double-divide-then-floor.

    Output: one row (n11, n10, n01, n00, po_e9, kappa_e9);
    kappa_e9 NULL when a rater is constant (den = 0). NULL-text docs are
    excluded on both engines (the raters disagree on NULL semantics).

    Scale: two full-corpus projections joined on doc_id then collapsed
    to a single row — the join shuffles once on doc_id; the aggregate is
    four conditional counters, map-side combined.
    """
    from bella_domify_spark.ops.classifier import quality_classifier
    from bella_domify_spark.ops.textstats import gopher_quality

    base = docs.filter(F.col("doc_id").isNotNull()
                       & F.col("text").isNotNull())
    a = gopher_quality(base).select("doc_id", F.col("keep").alias("ra"))
    b = (quality_classifier(base)
         .select("doc_id", (F.col("label") == "keep").alias("rb")))
    j = a.join(b, "doc_id")
    ra, rb = F.col("ra"), F.col("rb")
    cells = j.agg(
        F.sum((ra & rb).cast("long")).alias("n11"),
        F.sum((ra & ~rb).cast("long")).alias("n10"),
        F.sum((~ra & rb).cast("long")).alias("n01"),
        F.sum((~ra & ~rb).cast("long")).alias("n00"))
    n11, n10, n01, n00 = (F.col(x).cast("decimal(19,0)") for x in
                          ("n11", "n10", "n01", "n00"))
    n = n11 + n10 + n01 + n00
    chance = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    num = n * (n11 + n00) - chance
    den = n * n - chance
    return cells.select(
        "n11", "n10", "n01", "n00",
        F.floor((n11 + n00).cast("double") / n.cast("double") * 1e9)
         .cast("long").alias("po_e9"),
        F.when(den > 0,
               F.floor(num.cast("double") / den.cast("double") * 1e9))
         .cast("long").alias("kappa_e9"))


def rater_kappa_oracle_sql() -> str:
    """DuckDB twin of rater_kappa: the Gopher keep rule inlined (same
    constants as textstats.gopher_quality) + the shared classifier
    feature/weight SQL; HUGEINT plays DECIMAL(38,0)."""
    from bella_domify_spark.ops.classifier import (classifier_feats_sql,
                                                   classifier_weight_expr)
    w = classifier_weight_expr("t", "duckdb")
    return rf"""
        WITH base AS (
            SELECT doc_id, text FROM documents
            WHERE doc_id IS NOT NULL AND text IS NOT NULL
        ), gw AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(text), '\s+'),
                               x -> x <> '') AS ws
            FROM base
        ), ga AS (
            SELECT doc_id, len(ws) AS n_words,
                   CASE WHEN len(ws) > 0 THEN
                       list_sum(list_transform(ws, x -> length(x)))
                           ::DOUBLE / len(ws) END AS mwl,
                   len(list_intersect(list_distinct(ws),
                       ['the','be','to','of','and','that','have',
                        'with','a'])) AS stop_hits
            FROM gw
        ), ra AS (
            SELECT doc_id,
                   ((n_words >= 50 AND n_words <= 100000)
                    AND (CASE WHEN n_words > 0
                              THEN (mwl >= 3.0 AND mwl <= 10.0)
                              ELSE FALSE END)
                    AND stop_hits >= 2) AS ra
            FROM ga
        ), toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(
                                   lower(COALESCE(text, '')), '\s+'),
                               x -> x <> '') AS ws
            FROM base
        ), feats AS (
            SELECT doc_id,
                   list_concat(
                       ws,
                       list_transform(range(1, greatest(len(ws), 1)),
                                      i -> ws[i] || '_' || ws[i + 1])
                   ) AS fs
            FROM toks
        ), rb AS (
            SELECT doc_id,
                   COALESCE(list_aggregate(
                       list_transform(fs, t -> ({w})), 'sum'), 0) > 0 AS rb
            FROM feats
        ), cells AS (
            SELECT sum((ra AND rb)::INT)::HUGEINT AS n11,
                   sum((ra AND NOT rb)::INT)::HUGEINT AS n10,
                   sum((NOT ra AND rb)::INT)::HUGEINT AS n01,
                   sum((NOT ra AND NOT rb)::INT)::HUGEINT AS n00
            FROM ra JOIN rb USING (doc_id)
        )
        SELECT n11::BIGINT AS n11, n10::BIGINT AS n10,
               n01::BIGINT AS n01, n00::BIGINT AS n00,
               floor((n11 + n00)::DOUBLE
                     / (n11 + n10 + n01 + n00)::DOUBLE * 1e9)::BIGINT
                   AS po_e9,
               CASE WHEN ((n11 + n10 + n01 + n00)
                          * (n11 + n10 + n01 + n00)
                          - ((n11 + n10) * (n11 + n01)
                             + (n01 + n00) * (n10 + n00))) > 0
                    THEN floor(((n11 + n10 + n01 + n00) * (n11 + n00)
                                - ((n11 + n10) * (n11 + n01)
                                   + (n01 + n00) * (n10 + n00)))::DOUBLE
                               / ((n11 + n10 + n01 + n00)
                                  * (n11 + n10 + n01 + n00)
                                  - ((n11 + n10) * (n11 + n01)
                                     + (n01 + n00) * (n10 + n00)))::DOUBLE
                               * 1e9)::BIGINT
               END AS kappa_e9
        FROM cells
    """


def gini_concentration(docs: DataFrame,
                       group_col: str = "source",
                       weight_col: str = "n_chars") -> DataFrame:
    """Source-concentration readout: the Lorenz curve and Gini
    coefficient of corpus mass (chars) across sources — the one-number
    answer to "is this corpus a few giant crawls wearing twenty hats?".
    A mix with gini ≈ 0 spreads mass evenly; ≈ 1 means one source owns
    the tokens and deduplication/mixing decisions are really decisions
    about that source.

    Exact integer algebra throughout: per-source weights are BIGINT
    sums; sources sort ascending by (weight, name) with rank i = 1..n;
    gini = (2·Σ i·wᵢ − (n+1)·W) / (n·W) with DECIMAL(38,0) products
    (the chi2 pattern — Σ i·wᵢ reaches ~1e17 at 100 TB, past int64 once
    scaled e9), floor-e9 quantized once at the end. The Lorenz share
    cumᵢ/W is floor-e9 per row.

    Scale: ONE map-side-combined groupBy collapses the corpus to
    n_sources rows; every window below runs on that key-sized table
    (single partition by construction — documented, deliberate: source
    cardinality is bounded by the ingest config, not the corpus).

    Output: (rnk, source, w_chars, cum_chars, lorenz_e9, gini_e9),
    gini_e9 repeated on every row.
    """
    w = (docs.filter(F.col(group_col).isNotNull()
                     & F.col(weight_col).isNotNull())
         .groupBy(F.col(group_col).alias("source"))
         .agg(F.sum(weight_col).cast("long").alias("w_chars")))
    ow = Window.orderBy(F.asc("w_chars"), F.asc("source"))
    ranked = (w.withColumn("rnk", F.row_number().over(ow))
               .withColumn("cum_chars",
                           F.sum("w_chars").over(
                               ow.rowsBetween(Window.unboundedPreceding,
                                              0))))
    dec = "decimal(38,0)"
    tot = ranked.agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("w_chars").cast(dec).alias("tw"),
        F.sum(F.col("rnk").cast(dec)
              * F.col("w_chars").cast(dec)).alias("iw"))
    g = tot.select(
        F.floor(((F.lit(2).cast(dec) * F.col("iw")
                  - (F.col("n") + 1) * F.col("tw")).cast("double"))
                / (F.col("n") * F.col("tw")).cast("double") * 1e9)
         .cast("long").alias("gini_e9"))
    return (ranked.crossJoin(F.broadcast(g))
            .crossJoin(F.broadcast(tot.select(F.col("tw").cast("long")
                                              .alias("_tw"))))
            .select("rnk", "source", "w_chars", "cum_chars",
                    F.floor(F.col("cum_chars").cast("double")
                            / F.col("_tw").cast("double") * 1e9)
                     .cast("long").alias("lorenz_e9"),
                    "gini_e9"))


def gini_oracle_sql() -> str:
    """DuckDB twin of gini_concentration (HUGEINT plays DECIMAL(38,0))."""
    return """
        WITH w AS (
            SELECT source, sum(n_chars)::BIGINT AS w_chars
            FROM documents
            WHERE source IS NOT NULL AND n_chars IS NOT NULL
            GROUP BY source
        ), ranked AS (
            SELECT source, w_chars,
                   row_number() OVER (ORDER BY w_chars, source) AS rnk,
                   sum(w_chars) OVER (ORDER BY w_chars, source
                                      ROWS UNBOUNDED PRECEDING)::BIGINT
                       AS cum_chars
            FROM w
        ), tot AS (
            SELECT count(*)::HUGEINT AS n, sum(w_chars)::HUGEINT AS tw,
                   sum(rnk::HUGEINT * w_chars::HUGEINT)::HUGEINT AS iw
            FROM ranked
        )
        SELECT rnk, source, w_chars, cum_chars,
               floor(cum_chars::DOUBLE / tw::DOUBLE * 1e9)::BIGINT
                   AS lorenz_e9,
               floor((2 * iw - (n + 1) * tw)::DOUBLE
                     / (n * tw)::DOUBLE * 1e9)::BIGINT AS gini_e9
        FROM ranked CROSS JOIN tot
    """


def mann_kendall(events: DataFrame) -> DataFrame:
    """Mann-Kendall trend test over each event type's daily volume — the
    non-parametric "is this metric drifting?" monitor (no distribution
    assumed, robust to outliers; the standard choice for event-rate
    trend alarms next to anomaly_mad's point alerts).

    Per event_type with daily counts c₁..cₙ (day-ordered):
    S = Σᵢ<ⱼ sign(cⱼ − cᵢ), and the tie-corrected variance at ×18
    scale: var18 = n(n−1)(2n+5) − Σₜ t(t−1)(2t+5) over tie groups of
    size t — both exact BIGINTs (n is calendar-bounded, no overflow),
    so the driver hashes the test statistic itself rather than a
    quantized z-score.

    Scale: the corpus collapses to (type, day) counts in ONE
    map-side-combined aggregate; the O(d²) sign join runs per type on
    at most ~3.65k rows per decade of data — bounded by the calendar,
    not the corpus — and the tie table is smaller still.

    Output: (event_type, n_days, s_stat, var18); types with < 2 days
    drop (no pairs to sign).
    """
    days = (events.filter(F.col("ts").isNotNull()
                          & F.col("event_type").isNotNull())
            .groupBy("event_type", F.to_date("ts").alias("day"))
            .agg(F.count(F.lit(1)).cast("long").alias("c")))
    a = days.select("event_type", F.col("day").alias("da"),
                    F.col("c").alias("ca"))
    b = days.select("event_type", F.col("day").alias("db"),
                    F.col("c").alias("cb"))
    s = (a.join(b, "event_type").filter(F.col("da") < F.col("db"))
         .groupBy("event_type")
         .agg(F.sum(F.when(F.col("cb") > F.col("ca"), 1)
                    .when(F.col("cb") < F.col("ca"), -1)
                    .otherwise(0)).cast("long").alias("s_stat")))
    n = (days.groupBy("event_type")
         .agg(F.count(F.lit(1)).cast("long").alias("n_days")))
    t = (days.groupBy("event_type", "c")
         .agg(F.count(F.lit(1)).cast("long").alias("t"))
         .groupBy("event_type")
         .agg(F.sum(F.expr("t * (t - 1) * (2 * t + 5)")).alias("_ties")))
    nd = F.col("n_days")
    return (n.join(s, "event_type").join(t, "event_type")
            .filter(nd >= 2)
            .select("event_type", "n_days", "s_stat",
                    (nd * (nd - 1) * (2 * nd + 5) - F.col("_ties"))
                    .cast("long").alias("var18")))


def mann_kendall_oracle_sql() -> str:
    """DuckDB twin of mann_kendall (same sign join, same tie algebra)."""
    return """
        WITH days AS (
            SELECT event_type, date_trunc('day', ts) AS day,
                   count(*)::BIGINT AS c
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
            GROUP BY event_type, day
        ), s AS (
            SELECT a.event_type,
                   sum(CASE WHEN b.c > a.c THEN 1
                            WHEN b.c < a.c THEN -1 ELSE 0 END)::BIGINT
                       AS s_stat
            FROM days a JOIN days b
              ON a.event_type = b.event_type AND a.day < b.day
            GROUP BY a.event_type
        ), n AS (
            SELECT event_type, count(*)::BIGINT AS n_days
            FROM days GROUP BY event_type
        ), t AS (
            SELECT event_type,
                   sum(t * (t - 1) * (2 * t + 5))::BIGINT AS ties
            FROM (SELECT event_type, c, count(*)::BIGINT AS t
                  FROM days GROUP BY event_type, c)
            GROUP BY event_type
        )
        SELECT n.event_type, n.n_days, s.s_stat,
               (n_days * (n_days - 1) * (2 * n_days + 5) - t.ties)::BIGINT
                   AS var18
        FROM n JOIN s USING (event_type) JOIN t USING (event_type)
        WHERE n.n_days >= 2
    """


def cusum_changepoint(events: DataFrame) -> DataFrame:
    """CUSUM changepoint locator over each event type's daily volume —
    the "WHEN did this metric shift?" companion to mann_kendall's "is
    it drifting?": the day k maximizing |Σᵢ≤ₖ (n·cᵢ − W)| (the
    mean-centered cumulative sum at ×n scale, so it stays integer) is
    the classic single-changepoint estimate.

    With per-type daily counts c₁..cₙ (day-ordered, W = Σc): cusumₖ =
    n·cumₖ − k·W, computed in DECIMAL(38,0) (exact far past the int64
    cliff — n·cumₖ ~ 3.6e3 × corpus) and emitted as BIGINT (throws
    ANSI-style past ~9e18, i.e. ~2.5e15 events/day·decade — headroom
    documented, not silently wrapped). Ties on |cusum| break to the
    earliest day; cusumₙ = 0 by construction so a flat series reports
    its first day with statistic 0.

    Scale: corpus collapses to (type, day) in ONE map-side-combined
    aggregate; all windows run per type on calendar-bounded partitions
    (≤ ~3.65k rows per decade).

    Output: (event_type, n_days, cp_day, max_abs_cusum) with cp_day as
    epoch days (exact integer on both engines).
    """
    days = (events.filter(F.col("ts").isNotNull()
                          & F.col("event_type").isNotNull())
            .groupBy("event_type",
                     F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
                      .cast("long").alias("day"))
            .agg(F.count(F.lit(1)).cast("long").alias("c")))
    dec = "decimal(38,0)"
    wt = Window.partitionBy("event_type")
    wo = wt.orderBy("day")
    cum = (days
           .withColumn("n_days", F.count(F.lit(1)).over(wt))
           .withColumn("w_tot", F.sum("c").over(wt))
           .withColumn("k", F.row_number().over(wo))
           .withColumn("cum", F.sum("c").over(
               wo.rowsBetween(Window.unboundedPreceding, 0))))
    cusum = (F.col("n_days").cast(dec) * F.col("cum").cast(dec)
             - F.col("k").cast(dec) * F.col("w_tot").cast(dec))
    scored = cum.withColumn("acs", F.abs(cusum))
    pick = Window.partitionBy("event_type").orderBy(F.desc("acs"),
                                                    F.asc("day"))
    return (scored.withColumn("pr", F.row_number().over(pick))
            .filter(F.col("pr") == 1)
            .select("event_type",
                    F.col("n_days").cast("long").alias("n_days"),
                    F.col("day").alias("cp_day"),
                    F.col("acs").cast("long").alias("max_abs_cusum")))


def cusum_oracle_sql() -> str:
    """DuckDB twin of cusum_changepoint (same ×n integer CUSUM, same
    earliest-day tie break; HUGEINT plays DECIMAL(38,0))."""
    return """
        WITH days AS (
            SELECT event_type,
                   (ts::DATE - DATE '1970-01-01')::BIGINT AS day,
                   count(*)::BIGINT AS c
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
            GROUP BY event_type, day
        ), cum AS (
            SELECT event_type, day,
                   count(*) OVER (PARTITION BY event_type)::BIGINT
                       AS n_days,
                   sum(c) OVER (PARTITION BY event_type)::BIGINT AS w_tot,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY day) AS k,
                   sum(c) OVER (PARTITION BY event_type ORDER BY day
                                ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
            FROM days
        ), scored AS (
            SELECT event_type, day, n_days,
                   abs(n_days::HUGEINT * cum::HUGEINT
                       - k::HUGEINT * w_tot::HUGEINT) AS acs,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY abs(n_days::HUGEINT * cum
                                                   - k::HUGEINT * w_tot)
                                               DESC, day) AS pr
            FROM cum
        )
        SELECT event_type, n_days, day AS cp_day,
               acs::BIGINT AS max_abs_cusum
        FROM scored WHERE pr = 1
    """


def ks_drift(events: DataFrame) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test on the event ``value``
    distribution, first time-half vs second — the distribution-shaped
    companion to psi_drift's categorical monitor: PSI sees a shifted
    event-type mix, KS sees a shifted value CDF (same split convention:
    midpoint of the epoch-µs range, ts IS NOT NULL).

    Exact integer algebra end to end: values land on the e6 grid
    (floor(value·1e6)), per-grid-point ref/live counts cumulate into the
    two empirical CDF numerators, and the KS statistic is
    D_e6 = max |cumref·n_live − cumlive·n_ref| ·1e6 div (n_ref·n_live)
    in DECIMAL(38,0) (cum·n reaches ~1e24 at corpus scale — far past
    int64). Ties on the max break to the smallest grid value. The
    classical α=0.05 rejection line c(α)·sqrt((n+m)/nm) with c = 1.358
    quantizes through the correctly-rounded /-sqrt-· chain (IEEE 754
    specifies each step, so both engines agree bitwise).

    Scale: one scan to the (v_e6 → c_ref, c_live) grid via a map-side
    combined aggregate; the cumulative window then runs on the grid, not
    the corpus (|grid| ≤ distinct e6 values — for a genuinely continuous
    value at petabyte scale, coarsen the grid: D only needs resolution
    comparable to the critical value, so an e2 grid loses nothing at any
    plausible n; the statistic on a coarsened grid is a lower bound that
    crosses the same threshold).

    Output: one row (n_ref, n_live, d_e6, at_v_e6, crit_e6); drift is
    significant at 5% when d_e6 > crit_e6.
    """
    e = events.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
    t = e.select(F.unix_micros(F.col("ts").cast("timestamp")).alias("u"),
                 F.floor(F.col("value") * 1e6).cast("long").alias("v_e6"))
    mm = t.agg(F.min("u").alias("lo"), F.max("u").alias("hi"))
    g = (t.crossJoin(F.broadcast(mm))
         .groupBy("v_e6")
         .agg(F.sum(F.when(F.col("u") <= F.expr("(lo + hi) div 2"), 1)
                    .otherwise(0)).cast("long").alias("cr"),
              F.sum(F.when(F.col("u") <= F.expr("(lo + hi) div 2"), 0)
                    .otherwise(1)).cast("long").alias("cl")))
    tot = g.agg(F.sum("cr").cast("long").alias("nr"),
                F.sum("cl").cast("long").alias("nl"))
    w = Window.orderBy("v_e6").rowsBetween(Window.unboundedPreceding, 0)
    d = (g.withColumn("ccr", F.sum("cr").over(w))
          .withColumn("ccl", F.sum("cl").over(w))
          .crossJoin(F.broadcast(tot))
          .select("v_e6", "nr", "nl",
                  F.expr("abs(cast(ccr as decimal(38,0)) * nl"
                         " - cast(ccl as decimal(38,0)) * nr) * 1000000"
                         " div (cast(nr as decimal(38,0)) * nl)")
                   .alias("d_e6")))
    md = d.agg(F.max("d_e6").alias("d_max"))
    return (d.crossJoin(F.broadcast(md))
            .filter(F.col("d_e6") == F.col("d_max"))
            .groupBy("nr", "nl", "d_max")
            .agg(F.min("v_e6").alias("at_v_e6"))
            .select(F.col("nr").alias("n_ref"), F.col("nl").alias("n_live"),
                    F.col("d_max").cast("long").alias("d_e6"), "at_v_e6",
                    F.floor(F.lit(1.358)
                            * F.sqrt((F.col("nr") + F.col("nl"))
                                     .cast("double")
                                     / (F.col("nr").cast("double")
                                        * F.col("nl").cast("double")))
                            * 1e6).cast("long").alias("crit_e6")))


def ks_oracle_sql() -> str:
    """DuckDB twin of ks_drift (same e6 grid, HUGEINT numerators, //
    exact division, same 1.358·sqrt((n+m)/nm) critical line)."""
    return """
        WITH kse AS (
            SELECT epoch_us(ts) AS u, floor(value * 1e6)::BIGINT AS v_e6
            FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        ), ksmm AS (
            SELECT min(u) AS lo, max(u) AS hi FROM kse
        ), ksg AS (
            SELECT v_e6,
                   sum(CASE WHEN u <= (lo + hi) // 2 THEN 1 ELSE 0 END)
                       ::BIGINT AS cr,
                   sum(CASE WHEN u <= (lo + hi) // 2 THEN 0 ELSE 1 END)
                       ::BIGINT AS cl
            FROM kse CROSS JOIN ksmm GROUP BY v_e6
        ), kst AS (
            SELECT sum(cr)::BIGINT AS nr, sum(cl)::BIGINT AS nl FROM ksg
        ), ksd AS (
            SELECT v_e6,
                   abs((sum(cr) OVER w)::HUGEINT * nl
                       - (sum(cl) OVER w)::HUGEINT * nr) * 1000000
                       // (nr::HUGEINT * nl) AS d_e6
            FROM ksg CROSS JOIN kst
            WINDOW w AS (ORDER BY v_e6 ROWS UNBOUNDED PRECEDING)
        ), ksm AS (SELECT max(d_e6) AS d_max FROM ksd)
        SELECT nr AS n_ref, nl AS n_live, d_max::BIGINT AS d_e6,
               (SELECT min(v_e6) FROM ksd WHERE d_e6 = d_max) AS at_v_e6,
               floor(1.358 * sqrt((nr + nl)::DOUBLE
                                  / (nr::DOUBLE * nl::DOUBLE))
                     * 1e6)::BIGINT AS crit_e6
        FROM kst CROSS JOIN ksm
    """


def ess_by_source(docs: DataFrame, weight_col: str = "n_chars") -> DataFrame:
    """Kish effective sample size of length-weighted sampling, per
    source — the "how many docs is this source REALLY worth?" readout.
    Sampling documents proportional to length (the usual token-budget
    view of a corpus) concentrates mass on long documents; Kish's
    ESS = (Σw)²/Σw² is the equivalent count of equally-weighted docs.
    ess_ratio near 1e6 means lengths are uniform inside the source;
    a low ratio means a few giant documents carry the source and
    dedup/quality decisions there are really about those documents.
    Companion to gini_concentration (across sources) — this is the
    within-source concentration number.

    All-integer: Σw is a BIGINT sum, Σw² sums DECIMAL(38,0) squares
    (w² ~ 1e12 per million-char doc × 1e12 docs = 1e24, past int64),
    ess_e6 = (Σw)²·1e6 div Σw² and ess_ratio_e6 = (Σw)²·1e6 div
    (Σw²·n) are exact integer divisions of DECIMAL(38,0) products
    ((Σw)²·1e6 ~ 1e34 < 1e38 headroom at 100 TB).

    Scale: ONE map-side-combined groupBy collapsing the corpus to
    |sources| rows; no window, no second pass.

    Output: (source, n_docs, sum_w, ess_e6, ess_ratio_e6).
    """
    dec = "decimal(38,0)"
    per = (docs.filter(F.col("source").isNotNull()
                       & F.col(weight_col).isNotNull())
           .groupBy("source")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum(weight_col).cast("long").alias("sum_w"),
                F.sum(F.col(weight_col).cast(dec)
                      * F.col(weight_col).cast(dec)).cast(dec)
                 .alias("sum_w2"))
           .filter(F.col("sum_w2") > 0))
    return per.select(
        "source", "n_docs", "sum_w",
        F.expr("cast(sum_w as decimal(38,0)) * sum_w * 1000000"
               " div sum_w2").alias("ess_e6"),
        F.expr("cast(sum_w as decimal(38,0)) * sum_w * 1000000"
               " div (sum_w2 * n_docs)").alias("ess_ratio_e6"))


def ess_oracle_sql() -> str:
    """DuckDB twin of ess_by_source (HUGEINT squares, // division)."""
    return """
        WITH essp AS (
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(n_chars)::BIGINT AS sum_w,
                   sum(n_chars::HUGEINT * n_chars::HUGEINT) AS sum_w2
            FROM documents
            WHERE source IS NOT NULL AND n_chars IS NOT NULL
            GROUP BY source HAVING sum(n_chars::HUGEINT * n_chars) > 0
        )
        SELECT source, n_docs, sum_w,
               (sum_w::HUGEINT * sum_w * 1000000 // sum_w2)::BIGINT
                   AS ess_e6,
               (sum_w::HUGEINT * sum_w * 1000000
                // (sum_w2 * n_docs))::BIGINT AS ess_ratio_e6
        FROM essp
    """


# First-digit Benford shares floor(log10(1 + 1/d)·1e6), precomputed in
# Python so BOTH engines consume identical integer literals (no
# cross-engine log in the hot path at all).
BENFORD_E6 = {d: int(_math.floor(_math.log10(1.0 + 1.0 / d) * 1e6))
              for d in range(1, 10)}


def benford_audit(events: DataFrame) -> DataFrame:
    """Benford first-digit audit of the event ``value`` column — the
    classic synthetic-data / fraud smell test: organically-grown
    magnitudes follow P(d) = log10(1+1/d); uniform generators, capped
    metrics, and fabricated rows do not. A large |dev| on digit 1 is
    the canonical "this column was synthesized" tell.

    Values land on the e6 integer grid first (floor(value·1e6), > 0 —
    sub-µ values and non-positives have no leading digit); the first
    significant digit is the first character of the base-10 integer
    rendering (integer→string is exact on both engines, unlike any
    double formatting). Observed shares quantize as cnt·1e6 div n
    (DECIMAL(38,0) product); expected shares are the BENFORD_E6
    integer literals baked into both plans.

    Scale: one scan, one map-side-combined 9-key aggregate; the CASE
    lookup is constant-folded JVM-side.

    Output: (digit, n_obs, obs_e6, exp_e6, dev_e6), dev = obs − exp.
    """
    exp_case = ("CASE digit "
                + " ".join(f"WHEN {d} THEN {v}L"
                           for d, v in BENFORD_E6.items())
                + " END")
    per = (events.filter(F.col("value").isNotNull())
           .select(F.floor(F.col("value") * 1e6).cast("long").alias("v"))
           .filter(F.col("v") > 0)
           .select(F.substring(F.col("v").cast("string"), 1, 1)
                   .cast("int").alias("digit"))
           .groupBy("digit")
           .agg(F.count(F.lit(1)).cast("long").alias("n_obs")))
    tot = per.agg(F.sum("n_obs").cast("long").alias("n"))
    return (per.crossJoin(F.broadcast(tot))
            .select("digit", "n_obs",
                    F.expr("cast(n_obs as decimal(38,0)) * 1000000 div n")
                     .alias("obs_e6"),
                    F.expr(exp_case).alias("exp_e6"))
            .withColumn("dev_e6", F.col("obs_e6") - F.col("exp_e6")))


def benford_oracle_sql() -> str:
    """DuckDB twin of benford_audit (same integer grid, same injected
    BENFORD_E6 literals, // exact division)."""
    exp_case = ("CASE digit "
                + " ".join(f"WHEN {d} THEN {v}"
                           for d, v in BENFORD_E6.items())
                + " END")
    return f"""
        WITH bfv AS (
            SELECT floor(value * 1e6)::BIGINT AS v FROM events
            WHERE value IS NOT NULL AND floor(value * 1e6) > 0
        ), bfd AS (
            SELECT substr(v::VARCHAR, 1, 1)::INT AS digit,
                   count(*)::BIGINT AS n_obs
            FROM bfv GROUP BY 1
        ), bft AS (SELECT sum(n_obs)::BIGINT AS n FROM bfd)
        SELECT digit, n_obs,
               (n_obs::HUGEINT * 1000000 // n)::BIGINT AS obs_e6,
               ({exp_case})::BIGINT AS exp_e6,
               (n_obs::HUGEINT * 1000000 // n)::BIGINT
                   - ({exp_case})::BIGINT AS dev_e6
        FROM bfd CROSS JOIN bft
    """


def theil_sen(events: DataFrame) -> DataFrame:
    """Theil-Sen robust trend slope of each event type's daily volume —
    the MAGNITUDE companion to mann_kendall's direction test: the
    median of all pairwise day-slopes, the estimator that shrugs off
    ~29% outlier days where OLS would chase a single spike.

    Integer recipe: per-pair slope quantizes as (c_j − c_i)·1e6 div
    (day_j − day_i) (truncating div, identical in Spark and DuckDB);
    the median is the LOWER median — the k = (n_pairs+1) div 2-th value
    of the slope multiset ordered ascending (selection by value, so
    ordering ties are irrelevant to the result). The anomaly_mad
    lower-median convention.

    Scale: the corpus collapses to (type, day) in one map-side-combined
    aggregate; the pairwise self-join is quadratic ONLY in days-per-type
    — calendar-bounded (3.65k days/decade → ≤ ~6.7M pair rows per type,
    an aggregate-sized relation), never in corpus rows.

    Output: (event_type, n_days, n_pairs, slope_e6).
    """
    days = (events.filter(F.col("ts").isNotNull()
                          & F.col("event_type").isNotNull())
            .groupBy("event_type",
                     F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
                      .cast("long").alias("day"))
            .agg(F.count(F.lit(1)).cast("long").alias("c")))
    i = days.select("event_type", F.col("day").alias("d_i"),
                    F.col("c").alias("c_i"))
    j = days.select("event_type", F.col("day").alias("d_j"),
                    F.col("c").alias("c_j"))
    slopes = (i.join(j, "event_type")
              .filter(F.col("d_i") < F.col("d_j"))
              .select("event_type",
                      F.expr("(c_j - c_i) * 1000000 div (d_j - d_i)")
                       .alias("sl")))
    wt = Window.partitionBy("event_type")
    ranked = (slopes
              .withColumn("n_pairs", F.count(F.lit(1)).over(wt))
              .withColumn("k", F.row_number().over(wt.orderBy("sl"))))
    nd = days.groupBy("event_type").agg(F.count(F.lit(1)).cast("long")
                                        .alias("n_days"))
    return (ranked.filter(F.expr("k = (n_pairs + 1) div 2"))
            .join(nd, "event_type")
            .select("event_type", "n_days",
                    F.col("n_pairs").cast("long").alias("n_pairs"),
                    F.col("sl").alias("slope_e6")))


def theil_sen_oracle_sql() -> str:
    """DuckDB twin of theil_sen (same truncating per-pair slopes, same
    lower-median selection)."""
    return """
        WITH tsd AS (
            SELECT event_type,
                   (ts::DATE - DATE '1970-01-01')::BIGINT AS day,
                   count(*)::BIGINT AS c
            FROM events
            WHERE ts IS NOT NULL AND event_type IS NOT NULL
            GROUP BY event_type, day
        ), tsp AS (
            SELECT i.event_type,
                   (j.c - i.c) * 1000000 // (j.day - i.day) AS sl
            FROM tsd i JOIN tsd j USING (event_type)
            WHERE i.day < j.day
        ), tsr AS (
            SELECT event_type, sl,
                   count(*) OVER (PARTITION BY event_type)::BIGINT
                       AS n_pairs,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY sl) AS k
            FROM tsp
        ), tsn AS (
            SELECT event_type, count(*)::BIGINT AS n_days
            FROM tsd GROUP BY event_type
        )
        SELECT event_type, n_days, n_pairs, sl AS slope_e6
        FROM tsr JOIN tsn USING (event_type)
        WHERE k = (n_pairs + 1) // 2
    """


def length_fences(docs: DataFrame, group_col: str = "source",
                  weight_col: str = "n_chars") -> DataFrame:
    """Tukey-fence length outliers per source — the whale-and-stub
    census: exact quartiles of document length (type-1 order
    statistics: Q_k = value at rank ⌈k·n/4⌉), and counts beyond the
    1.5·IQR fences. n_high > 0 tells the shard packer which sources
    hide whale documents; a fat n_low exposes truncated/stub crawls.

    All-integer: rank selection (ties can swap WHICH doc holds a rank
    but never the value there), and the fences compare doubled to
    avoid the half: outlier_low ⇔ 2x < 2·Q1 − 3·IQR, outlier_high ⇔
    2x > 2·Q3 + 3·IQR.

    Scale: one per-source window pass (partitioned shuffle) + one
    map-side-combined conditional aggregate; no self-join, no global
    sort. (Exact per-group quantiles at petabyte scale would swap to
    two-pass partition-prefix ranks; per-source windows are the
    honest single-pass form at this cardinality.)

    Output: (source, n_docs, q1, med, q3, n_low, n_high).
    """
    wt = Window.partitionBy("source")
    ranked = (docs.filter(F.col(group_col).isNotNull()
                          & F.col(weight_col).isNotNull())
              .select(F.col(group_col).alias("source"),
                      F.col(weight_col).cast("long").alias("x"))
              .withColumn("n", F.count(F.lit(1)).over(wt))
              .withColumn("rn", F.row_number().over(wt.orderBy("x"))))
    q = (ranked.groupBy("source")
         .agg(F.max("n").cast("long").alias("n_docs"),
              F.min(F.when(F.expr("rn = (n + 3) div 4"), F.col("x")))
               .alias("q1"),
              F.min(F.when(F.expr("rn = (n + 1) div 2"), F.col("x")))
               .alias("med"),
              F.min(F.when(F.expr("rn = (3 * n + 3) div 4"), F.col("x")))
               .alias("q3")))
    return (ranked.join(q, "source")
            .groupBy("source", "n_docs", "q1", "med", "q3")
            .agg(F.sum(F.when(2 * F.col("x")
                              < 2 * F.col("q1") - 3 * (F.col("q3")
                                                       - F.col("q1")),
                              1).otherwise(0)).cast("long").alias("n_low"),
                 F.sum(F.when(2 * F.col("x")
                              > 2 * F.col("q3") + 3 * (F.col("q3")
                                                       - F.col("q1")),
                              1).otherwise(0)).cast("long")
                  .alias("n_high"))
            .select("source", "n_docs", "q1", "med", "q3",
                    "n_low", "n_high"))


def fences_oracle_sql() -> str:
    """DuckDB twin of length_fences (same ⌈k·n/4⌉ rank selection, same
    doubled fence comparisons)."""
    return """
        WITH lfr AS (
            SELECT source, n_chars::BIGINT AS x,
                   count(*) OVER (PARTITION BY source)::BIGINT AS n,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars) AS rn
            FROM documents
            WHERE source IS NOT NULL AND n_chars IS NOT NULL
        ), lfq AS (
            SELECT source, max(n)::BIGINT AS n_docs,
                   min(CASE WHEN rn = (n + 3) // 4 THEN x END) AS q1,
                   min(CASE WHEN rn = (n + 1) // 2 THEN x END) AS med,
                   min(CASE WHEN rn = (3 * n + 3) // 4 THEN x END) AS q3
            FROM lfr GROUP BY source
        )
        SELECT source, n_docs, q1, med, q3,
               sum(CASE WHEN 2 * x < 2 * q1 - 3 * (q3 - q1)
                        THEN 1 ELSE 0 END)::BIGINT AS n_low,
               sum(CASE WHEN 2 * x > 2 * q3 + 3 * (q3 - q1)
                        THEN 1 ELSE 0 END)::BIGINT AS n_high
        FROM lfr JOIN lfq USING (source)
        GROUP BY source, n_docs, q1, med, q3
    """


def meta_mi(docs: DataFrame, x_col: str = "source",
            y_col: str = "lang") -> DataFrame:
    """Mutual information between two metadata dimensions (source ×
    language by default) — "does knowing the crawl tell you the
    language?": per-cell pointwise MI and the corpus MI total. MI ≈ 0
    means the mix is factorized (language balance survives any source
    reweighting); high MI warns that source-level mixing decisions ARE
    language decisions (dropping a source silently drops a language).

    Quantized recipe: pmi_e9 = floor((ln(c_xy/c_x) − ln(c_y/N))·1e9) —
    both engines evaluate the identical two-ln chain on exact-double
    ratios of BIGINT counts (< 2⁵³, exactly representable); the total
    MI is the exact integer Σ c_xy·pmi_e9 div N in DECIMAL(38,0),
    repeated on every row (the gini_e9 convention).

    Scale: one map-side-combined cell aggregate (≤ |X|·|Y| rows);
    margins derive from cells; one broadcast of the totals.

    Output: (source, lang, c_xy, pmi_e9, mi_e9).
    """
    cells = (docs.filter(F.col(x_col).isNotNull()
                         & F.col(y_col).isNotNull())
             .groupBy(F.col(x_col).alias("xk"), F.col(y_col).alias("yk"))
             .agg(F.count(F.lit(1)).cast("long").alias("c_xy")))
    cx = cells.groupBy("xk").agg(F.sum("c_xy").cast("long").alias("c_x"))
    cy = cells.groupBy("yk").agg(F.sum("c_xy").cast("long").alias("c_y"))
    n = cells.agg(F.sum("c_xy").cast("long").alias("nn"))
    per = (cells.join(F.broadcast(cx), "xk").join(F.broadcast(cy), "yk")
           .crossJoin(F.broadcast(n))
           .select("xk", "yk", "c_xy",
                   F.floor((F.log(F.col("c_xy").cast("double")
                                  / F.col("c_x").cast("double"))
                            - F.log(F.col("c_y").cast("double")
                                    / F.col("nn").cast("double")))
                           * 1e9).cast("long").alias("pmi_e9"),
                   "nn"))
    mi = per.agg(F.expr("sum(cast(c_xy as decimal(38,0)) * pmi_e9)"
                        " div max(nn)").alias("mi_e9"))
    return (per.crossJoin(F.broadcast(mi))
            .select(F.col("xk").alias("source"), F.col("yk").alias("lang"),
                    "c_xy", "pmi_e9", "mi_e9"))


def meta_mi_oracle_sql() -> str:
    """DuckDB twin of meta_mi (same two-ln chain on exact-double count
    ratios, HUGEINT weighted total, // division)."""
    return """
        WITH mmc AS (
            SELECT source AS xk, lang AS yk, count(*)::BIGINT AS c_xy
            FROM documents
            WHERE source IS NOT NULL AND lang IS NOT NULL
            GROUP BY source, lang
        ), mmx AS (SELECT xk, sum(c_xy)::BIGINT AS c_x FROM mmc
                   GROUP BY xk),
        mmy AS (SELECT yk, sum(c_xy)::BIGINT AS c_y FROM mmc GROUP BY yk),
        mmn AS (SELECT sum(c_xy)::BIGINT AS nn FROM mmc),
        mmp AS (
            SELECT xk, yk, c_xy,
                   floor((ln(c_xy::DOUBLE / c_x::DOUBLE)
                          - ln(c_y::DOUBLE / nn::DOUBLE))
                         * 1e9)::BIGINT AS pmi_e9, nn
            FROM mmc JOIN mmx USING (xk) JOIN mmy USING (yk)
            CROSS JOIN mmn
        ), mmt AS (
            SELECT (sum(c_xy::HUGEINT * pmi_e9) // max(nn))::BIGINT
                       AS mi_e9
            FROM mmp
        )
        SELECT xk AS source, yk AS lang, c_xy, pmi_e9, mi_e9
        FROM mmp CROSS JOIN mmt
    """


PROPS_KEY_RE = r'"([A-Za-z0-9_]+)"\s*:'


def props_keys(events: DataFrame) -> DataFrame:
    """Semi-structured schema inventory of the ``props`` JSON column —
    the schema-drift monitor for the one column a warehouse can't type:
    per event type, which top-level-looking keys appear and in what
    share of events. A key whose share collapses between snapshots is a
    producer-side schema change no relational check sees; a key that
    appears under only one event type documents the de-facto schema.

    Both engines extract keys with the SAME regex capture
    (``"(\\w+)"\\s*:`` shaped) — pure pattern matching, deliberately not
    a JSON parser (identical on malformed payloads, which is the
    point: drift detection must not die on the drifted rows).
    share_e6 = n·1e6 div n_events (DECIMAL(38,0) product, exact).

    Scale: regex extraction fuses into the scan (JVM codegen, no
    Python); one map-side-combined (type, key) aggregate; the per-type
    totals are an aggregate-sized broadcast.

    Output: (event_type, key, n, share_e6).
    """
    base = events.filter(F.col("event_type").isNotNull()
                         & F.col("props").isNotNull())
    tot = (base.groupBy("event_type")
           .agg(F.count(F.lit(1)).cast("long").alias("n_events")))
    keys = (base.select("event_type",
                        F.explode(F.regexp_extract_all(
                            F.col("props"), F.lit(PROPS_KEY_RE), 1))
                        .alias("key"))
            .groupBy("event_type", "key")
            .agg(F.count(F.lit(1)).cast("long").alias("n")))
    return (keys.join(F.broadcast(tot), "event_type")
            .select("event_type", "key", "n",
                    F.expr("cast(n as decimal(38,0)) * 1000000"
                           " div n_events").alias("share_e6")))


def props_keys_oracle_sql() -> str:
    """DuckDB twin of props_keys (same regex capture group, HUGEINT
    product, // exact division)."""
    return rf"""
        WITH pkb AS (
            SELECT event_type, props FROM events
            WHERE event_type IS NOT NULL AND props IS NOT NULL
        ),
        pkt AS (SELECT event_type, count(*)::BIGINT AS n_events
                FROM pkb GROUP BY event_type),
        pkk AS (
            SELECT event_type,
                   unnest(regexp_extract_all(props,
                                             '{PROPS_KEY_RE}', 1)) AS key
            FROM pkb
        ),
        pkc AS (SELECT event_type, key, count(*)::BIGINT AS n
                FROM pkk GROUP BY event_type, key)
        SELECT event_type, key, n,
               (n::HUGEINT * 1000000 // n_events)::BIGINT AS share_e6
        FROM pkc JOIN pkt USING (event_type)
    """


def pareto_users(events: DataFrame) -> DataFrame:
    """Skyline (Pareto frontier) of users over (activity, value): the
    users no one beats on BOTH event count and summed value — the
    classic "best customers/power users" set that no single score
    captures (any weighted score picks one point of this frontier;
    the skyline returns all of them).

    Strict-dominance rule: u is dominated iff some v is ≥ on both
    axes and > on at least one; equal twins both survive. Exact
    integers: per-event values floor to the e6 grid before summing.
    The skyline evaluates with the textbook sort-and-prefix-max: keep
    u iff its value is the max within its count AND beats the max
    value over all strictly-higher counts.

    Scale: corpus → per-user aggregate (one map-side-combined
    shuffle); the prefix-max window runs on the DISTINCT-COUNT table
    (bounded by max events/user, not by users); the final filter is a
    broadcast-sized join back. (A frontier over a truly unbounded key
    would range-partition the prefix max — two-level, same algebra.)

    Output: (user_id, n_events, val_e6), frontier rows only.
    """
    g = (events.filter(F.col("user_id").isNotNull()
                       & F.col("value").isNotNull())
         .groupBy("user_id")
         .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
              F.sum(F.floor(F.col("value") * 1e6).cast("long"))
               .cast("long").alias("val_e6")))
    per_n = g.groupBy("n_events").agg(F.max("val_e6").alias("vmax"))
    w = (Window.orderBy(F.desc("n_events"))
         .rowsBetween(Window.unboundedPreceding, -1))
    keep_n = (per_n.withColumn("hi_max", F.max("vmax").over(w))
              .filter(F.col("hi_max").isNull()
                      | (F.col("vmax") > F.col("hi_max")))
              .select("n_events", "vmax"))
    return (g.join(F.broadcast(keep_n), "n_events")
            .filter(F.col("val_e6") == F.col("vmax"))
            .select("user_id", "n_events", "val_e6"))


def pareto_oracle_sql() -> str:
    """DuckDB twin of pareto_users (same e6 grid, same
    prefix-max-over-distinct-counts skyline)."""
    return """
        WITH pug AS (
            SELECT user_id, count(*)::BIGINT AS n_events,
                   sum(floor(value * 1e6)::BIGINT)::BIGINT AS val_e6
            FROM events
            WHERE user_id IS NOT NULL AND value IS NOT NULL
            GROUP BY user_id
        ), pun AS (
            SELECT n_events, max(val_e6) AS vmax FROM pug
            GROUP BY n_events
        ), puk AS (
            SELECT n_events, vmax,
                   max(vmax) OVER (ORDER BY n_events DESC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS hi_max
            FROM pun
        )
        SELECT user_id, g.n_events, val_e6
        FROM pug g JOIN puk k ON g.n_events = k.n_events
        WHERE val_e6 = vmax AND (hi_max IS NULL OR vmax > hi_max)
    """


def type_affinity(events: DataFrame) -> DataFrame:
    """Market-basket affinity of event types — basket = user, item =
    event type: for every type pair, how many users do BOTH, the
    support, and the lift (observed co-occurrence over the
    independence expectation). Lift ≫ 1e6 is the classic "users who
    view also purchase" journey coupling; lift ≪ 1e6 exposes disjoint
    user populations sharing one product surface. The corpus-level
    companion to transition_entropy's sequential view (affinity
    ignores order; entropy is all order).

    Exact integers: lift_e6 = n_ab·N·1e6 div (n_a·n_b) and
    support_e6 = n_ab·1e6 div N in DECIMAL(38,0) (n_ab·N ~ 1e24 at
    corpus scale); N = users with ≥1 typed event; per-user types are
    DISTINCT; pairs ordered type_a < type_b.

    Scale: the pair join is keyed by user_id with fan-out C(k,2) over
    each user's OWN distinct-type count (bounded by |event_type|,
    single digits) — never corpus-quadratic; margins and totals are
    aggregate-sized broadcasts.

    Output: (type_a, type_b, n_ab, n_a, n_b, support_e6, lift_e6).
    """
    ut = (events.filter(F.col("user_id").isNotNull()
                        & F.col("event_type").isNotNull())
          .select("user_id", "event_type").distinct())
    n_tot = ut.agg(F.countDistinct("user_id").cast("long").alias("nn"))
    singles = ut.groupBy("event_type").agg(F.count(F.lit(1))
                                           .cast("long").alias("n_k"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    pairs = (a.join(b, "user_id")
             .filter(F.col("type_a") < F.col("type_b"))
             .groupBy("type_a", "type_b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_ab")))
    return (pairs
            .join(F.broadcast(singles.select(
                F.col("event_type").alias("type_a"),
                F.col("n_k").alias("n_a"))), "type_a")
            .join(F.broadcast(singles.select(
                F.col("event_type").alias("type_b"),
                F.col("n_k").alias("n_b"))), "type_b")
            .crossJoin(F.broadcast(n_tot))
            .select("type_a", "type_b", "n_ab", "n_a", "n_b",
                    F.expr("cast(n_ab as decimal(38,0)) * 1000000 div nn")
                     .alias("support_e6"),
                    F.expr("cast(n_ab as decimal(38,0)) * nn * 1000000"
                           " div (cast(n_a as decimal(38,0)) * n_b)")
                     .alias("lift_e6")))


def type_affinity_oracle_sql() -> str:
    """DuckDB twin of type_affinity (HUGEINT products, // division)."""
    return """
        WITH tau AS (
            SELECT DISTINCT user_id, event_type FROM events
            WHERE user_id IS NOT NULL AND event_type IS NOT NULL
        ),
        tan AS (SELECT count(DISTINCT user_id)::BIGINT AS nn FROM tau),
        tas AS (SELECT event_type, count(*)::BIGINT AS n_k FROM tau
                GROUP BY event_type),
        tap AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*)::BIGINT AS n_ab
            FROM tau a JOIN tau b USING (user_id)
            WHERE a.event_type < b.event_type
            GROUP BY type_a, type_b
        )
        SELECT type_a, type_b, n_ab, sa.n_k AS n_a, sb.n_k AS n_b,
               (n_ab::HUGEINT * 1000000 // nn)::BIGINT AS support_e6,
               (n_ab::HUGEINT * nn * 1000000
                // (sa.n_k::HUGEINT * sb.n_k))::BIGINT AS lift_e6
        FROM tap
        JOIN tas sa ON sa.event_type = type_a
        JOIN tas sb ON sb.event_type = type_b
        CROSS JOIN tan
    """


TRIM_DEN = 10   # trim 1/DEN of rows at each end


def trimmed_mean(docs: DataFrame, group_col: str = "source",
                 weight_col: str = "n_chars",
                 trim_den: int = TRIM_DEN) -> DataFrame:
    """Robust per-source length statistics: the raw mean next to the
    10%-trimmed mean (drop the ⌊n/den⌋ smallest and largest by rank).
    A trimmed mean far below the raw mean is the whale signature
    length_fences counts — this is the magnitude: how much of the
    source's "average document" is actually two giant files.

    Exact integers: rank selection (ties swap docs, never values),
    BIGINT sums, truncating div means; n < 2·⌊n/den⌋+1 can't happen
    (⌊n/den⌋ ≤ n/2 for den ≥ 2 leaves ≥ 1 row... den ≥ 3 guaranteed;
    the kept-range filter is empty-safe regardless).

    Scale: one per-source window pass + one conditional aggregate —
    the length_fences plan shape.

    Output: (source, n_docs, mean_all, n_kept, mean_trimmed).
    """
    if trim_den < 3:
        # den=2 on a 2-row group trims every row → mean_trimmed divides
        # by 0 (ANSI throw in Spark vs NULL in the DuckDB twin); the
        # docstring's "den ≥ 3 guaranteed" is enforced, not assumed
        raise ValueError(f"trim_den must be >= 3, got {trim_den}")
    wt = Window.partitionBy("source")
    ranked = (docs.filter(F.col(group_col).isNotNull()
                          & F.col(weight_col).isNotNull())
              .select(F.col(group_col).alias("source"),
                      F.col(weight_col).cast("long").alias("x"))
              .withColumn("n", F.count(F.lit(1)).over(wt))
              .withColumn("rn", F.row_number().over(wt.orderBy("x")))
              .withColumn("lo", F.expr(f"n div {trim_den}")))
    return (ranked.groupBy("source")
            .agg(F.max("n").cast("long").alias("n_docs"),
                 F.expr("sum(x) div max(n)").alias("mean_all"),
                 F.sum(F.when((F.col("rn") > F.col("lo"))
                              & (F.col("rn") <= F.col("n") - F.col("lo")),
                              1).otherwise(0)).cast("long")
                  .alias("n_kept"),
                 F.expr("sum(CASE WHEN rn > lo AND rn <= n - lo"
                        " THEN x ELSE 0 END)"
                        " div sum(CASE WHEN rn > lo AND rn <= n - lo"
                        " THEN 1 ELSE 0 END)").alias("mean_trimmed")))


def trimmed_mean_oracle_sql(trim_den: int = TRIM_DEN) -> str:
    """DuckDB twin of trimmed_mean (same rank trim, // means)."""
    return f"""
        WITH tmr AS (
            SELECT source, n_chars::BIGINT AS x,
                   count(*) OVER (PARTITION BY source)::BIGINT AS n,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY n_chars) AS rn
            FROM documents
            WHERE source IS NOT NULL AND n_chars IS NOT NULL
        )
        SELECT source, max(n)::BIGINT AS n_docs,
               (sum(x) // max(n))::BIGINT AS mean_all,
               sum(CASE WHEN rn > n // {trim_den}
                        AND rn <= n - n // {trim_den}
                        THEN 1 ELSE 0 END)::BIGINT AS n_kept,
               (sum(CASE WHEN rn > n // {trim_den}
                         AND rn <= n - n // {trim_den}
                         THEN x ELSE 0 END)
                // sum(CASE WHEN rn > n // {trim_den}
                            AND rn <= n - n // {trim_den}
                            THEN 1 ELSE 0 END))::BIGINT AS mean_trimmed
        FROM tmr GROUP BY source
    """
