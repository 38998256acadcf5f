"""Event-table operators: windowed aggregation + sessionization (SURVEY
§2.G 20). Batch semantics here; ``streaming/events.py`` lifts the same
transformations onto Structured Streaming (readStream + watermark).

Scale notes: tumbling windows are a plain groupBy on (window, type) — one
map-side-combinable shuffle. Sessionization shuffles once on user_id; the
per-user sort happens inside the window operator. Skewed users are the risk
at 100 TB — AQE skew-join/partition-split handles moderate skew; for
pathological keys, pre-bucket by (user_id, day) and merge sessions crossing
the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dwca_parquet_spark.operators.relational import dec_sum


def ts_micros(df: DataFrame, ts_col: str) -> F.Column:
    """Event time as epoch microseconds (BIGINT), whatever the storage type.

    Parquet TIMESTAMP(NANOS) columns arrive as epoch-nanos BIGINT (see
    session.py nanosAsLong) → floor-divide to µs, identical to DuckDB's
    ns→µs truncation. timestamp_ntz columns take the timestampdiff branch
    (wall clock interpreted as UTC via an NTZ epoch literal, never the
    session timezone); timezone-aware timestamps go through unix_micros.
    """
    dtype = dict(df.dtypes)[ts_col]
    if dtype in ("bigint", "long"):
        # integer `div`, NOT `/`: bigint/1000 promotes to DOUBLE and loses
        # precision beyond 2**53 (epoch-nanos are ~2**60)
        return F.expr(f"`{ts_col}` div 1000")
    if dtype == "timestamp_ntz":
        # Wall clock interpreted as UTC — the same reading DuckDB's
        # epoch_us() gives a TIMESTAMP (NTZ) column. timestampdiff against
        # an NTZ epoch literal never consults the session timezone, unlike
        # a cast to TIMESTAMP_LTZ.
        return F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00', `{ts_col}`)"
        )
    return F.unix_micros(F.col(ts_col))


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    duration: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time window aggregation (batch DataFrame).

    Emits window_start as a formatted string so differential hashing never
    depends on timestamp localization.
    """
    event_time = F.timestamp_micros(ts_micros(df, ts_col))
    win = F.window(event_time, duration)
    return (
        df.groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum(value_col).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            key_col,
            "n_events",
            "total_value",
        )
    )


def sliding_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    duration: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Sliding (hopping) event-time windows: each event lands in
    duration/slide overlapping windows. Same single-shuffle groupBy shape
    as tumbling — F.window with a slide emits one row per (event, window)
    pair before aggregation, so the shuffle grows by the overlap factor,
    nothing else changes."""
    event_time = F.timestamp_micros(ts_micros(df, ts_col))
    win = F.window(event_time, duration, slide)
    return (
        df.groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum(value_col).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            key_col,
            "n_events",
            "total_value",
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the LATEST right row with
    ``ts_right <= ts_left`` in the same key group (left-outer: no prior
    right row → nulls). The operator Spark's join zoo lacks.

    Scalable formulation — union + ordered carry-forward, NOT a range
    join: a range-condition join plans as a per-key nested loop
    (O(|L|·|R|) pairs per key); instead both inputs union into one
    event-ordered stream per key and a running ``last(ignoreNulls)``
    window carries the most recent right payload forward onto each left
    row. One shuffle on the key; the per-key sort lives inside the window
    operator — the same shape Flink/KDB use for as-of semantics.

    ``ts_col`` must exist in both inputs (epoch-µs bigint recommended —
    see ts_micros). Same-timestamp rows resolve right-before-left
    (inclusive <=); duplicate right timestamps within a key order by
    ``tiebreak_col`` if given (latest wins), else are ambiguous — exactly
    DuckDB ASOF JOIN's contract, which serves as the oracle.
    """
    rtypes = dict(right.dtypes)
    r_struct = "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in right_cols) + ">"
    l_struct = "struct<" + ",".join(f"{c}:{t}" for c, t in left.dtypes) + ">"
    tb_type = rtypes.get(tiebreak_col, "bigint") if tiebreak_col else "bigint"

    r_std = right.select(
        F.col(key_col),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_rv"),
        F.lit(None).cast(l_struct).alias("_lv"),
        (F.col(tiebreak_col) if tiebreak_col else F.lit(0)).alias("_tb"),
    )
    l_std = left.select(
        F.col(key_col),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct).alias("_rv"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lv"),
        F.lit(None).cast(tb_type).alias("_tb"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        r_std.unionByName(l_std)
        .withColumn("_rv_c", F.last("_rv", ignorenulls=True).over(w))
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col("_lv").getField(c).alias(c) for c in left.columns],
        *[F.col("_rv_c").getField(c).alias(f"r_{c}") for c in right_cols],
    )


def sessionize(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization via lag + cumulative flag sum.

    A new session starts when the gap to the previous event of the same user
    exceeds ``gap_minutes``. Timestamps compare as exact integer microseconds
    (unix_micros) for engine parity. Output: one row per session with event
    count and span.
    """
    sessions = sessionize_events(df, ts_col, user_col, id_col, gap_minutes)
    return sessions.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
    )


def sessionize_events(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    gap_minutes: int = 30,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-EVENT session assignment — the lag + cumulative-flag stage of
    :func:`sessionize`, split out so path-level ops (op 151 transitions)
    consume the identical session boundaries. Output: (user, id, ts_us,
    *keep_cols, session_id) with session_id 1-based per user."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(
        F.col("ts_us").asc(), F.col(id_col).asc()
    )
    prev = F.lag("ts_us").over(w)
    flagged = df.select(
        F.col(user_col),
        F.col(id_col),
        ts_micros(df, ts_col).alias("ts_us"),
        *[F.col(c) for c in keep_cols],
    ).withColumn(
        "new_session",
        F.when(prev.isNull() | (F.col("ts_us") - prev > gap_us), 1).otherwise(0),
    )
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return flagged.withColumn(
        "session_id", F.sum("new_session").over(w_cum).cast("long")
    ).drop("new_session")


def resample_ffill(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
    interval_us: int = 3_600_000_000,
) -> DataFrame:
    """Fixed-interval resample with gap-fill + forward-fill (SURVEY §2.G
    op 138). Per key: bucket events to ``interval_us``-wide slots, emit a
    DENSE per-key grid from the key's first to last active bucket (empty
    slots materialize with n_events = 0), and carry the last non-empty
    bucket's value sum forward onto the gaps — the resample→ffill step
    every metrics/feature pipeline runs before joining event streams to a
    model's time grid.

    Scale shape: the observed aggregate is ONE map-side-combinable shuffle
    on (key, bucket); the grid comes from per-key ``sequence(b0, b1)`` —
    bounded by the key's own active span, generated executor-side, never a
    driver loop or a global calendar cross-join; the fill is a running
    ``last(ignoreNulls)`` window per key (the asof_join carry-forward
    shape). Grid rows ≈ Σ_key span_buckets — at 100 TB choose interval so
    span/interval stays ~1e4-1e5 per key; Spark hard-caps one sequence()
    at the array limit (~2^31), which a year at 1-minute buckets (~5e5)
    clears easily.

    Output: (key, bucket BIGINT, n_events, filled_value DOUBLE) where
    bucket = epoch_us // interval_us — surfaced as the integer slot index,
    never a localized timestamp (differential-hash protocol).
    """
    obs = (
        df.select(
            F.col(key_col),
            ts_micros(df, ts_col).alias("_us"),
            F.col(value_col),
        )
        # integer `div`, not cast-of-double-divide: bigint/int promotes to
        # DOUBLE (precision loss past 2^53) and cast truncates toward 0,
        # which differs from floor for pre-epoch timestamps
        .withColumn("bucket", F.expr(f"_us div {interval_us}"))
        .groupBy(key_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dec_sum(value_col).alias("_sum_value"),
        )
    )
    return resample_grid_ffill(obs, key_col)


def resample_grid_ffill(obs: DataFrame, key_col: str) -> DataFrame:
    """Grid + forward-fill stage of :func:`resample_ffill`, split out so
    the streaming activity state (streaming/activity.py, op 143) reports
    through the IDENTICAL plan — the fold ≡ one-shot law then reduces to
    additivity of the observed aggregate. ``obs`` columns: (key, bucket,
    n_events, _sum_value DOUBLE).

    Plan shape (round-9 replan, measured 6.4 → 1.2 s at sf0.1 — 0.8×
    the DuckDB oracle, SCALE.md): the
    windows (carry-forward fill + lead-to-next-bucket) run over the
    OBSERVED rows only, and gap rows are exploded afterwards carrying
    the already-filled value — grid_rows = Σ_key span work happens in
    one projection. The first cut materialized the dense grid FIRST
    (bounds aggregate + sequence + left join back to obs + a window
    over every grid row): three extra shuffles and a sort over the
    ~10× larger grid, all deleted here. Output is row-identical: an
    observed bucket emits its own count and the carried value (its own
    sum unless NULL — the ignoreNulls carry); each gap bucket before
    the key's next observation emits n_events = 0 with the same
    carried value; grids still start/end at the key's own first/last
    active bucket.
    """
    w_fill = (
        Window.partitionBy(key_col)
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = Window.partitionBy(key_col).orderBy(F.col("bucket").asc())
    filled = obs.select(
        F.col(key_col),
        F.col("bucket"),
        F.col("n_events").cast("long").alias("_n"),
        F.last("_sum_value", ignorenulls=True).over(w_fill).alias("_fv"),
        F.lead("bucket").over(w_next).alias("_nb"),
    )
    out_bucket = F.explode(
        F.sequence(
            F.col("bucket"),
            F.coalesce(F.col("_nb") - F.lit(1), F.col("bucket")),
        )
    ).alias("_ob")
    return filled.select(
        F.col(key_col), out_bucket, F.col("bucket"), F.col("_n"), F.col("_fv")
    ).select(
        F.col(key_col),
        F.col("_ob").alias("bucket"),
        F.when(F.col("_ob") == F.col("bucket"), F.col("_n"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_events"),
        F.col("_fv").alias("filled_value"),
    )


def _funnel_survivors(
    df: DataFrame,
    stages: tuple[str, ...],
    ts_col: str,
    user_col: str,
    type_col: str,
    horizon_us: int | None,
):
    """The op-139 survivor chain, shared by :func:`funnel` (counts) and
    :func:`funnel_latency` (op 156, per-user conversion times). Yields
    (stage_idx, stage, survivors) where survivors = (user, _t =
    first-qualifying µs at this stage, _t1 = first stage-1 µs)."""
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")
    ev = df.select(
        F.col(user_col),
        F.col(type_col).alias("_tp"),
        ts_micros(df, ts_col).alias("_us"),
    )
    survivors = (
        ev.filter(F.col("_tp") == stages[0])
        .groupBy(user_col)
        .agg(F.min("_us").alias("_t"))
        .withColumn("_t1", F.col("_t"))
    )
    yield 1, stages[0], survivors
    for i, st in enumerate(stages[1:], start=2):
        nxt = ev.filter(F.col("_tp") == st).join(
            survivors.select(user_col, "_t", "_t1"), user_col
        )
        cond = F.col("_us") > F.col("_t")
        if horizon_us is not None:
            cond = cond & (F.col("_us") <= F.col("_t1") + F.lit(horizon_us))
        survivors = (
            nxt.filter(cond)
            .groupBy(user_col, "_t1")
            .agg(F.min("_us").alias("_t"))
        )
        yield i, st, survivors


def funnel(
    df: DataFrame,
    stages: tuple[str, ...],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    horizon_us: int | None = None,
) -> DataFrame:
    """Ordered funnel conversion (SURVEY §2.G op 139): per user, stage i
    counts only if its FIRST qualifying event is strictly after the user's
    stage-(i-1) time — and, with ``horizon_us``, within the horizon of the
    user's first stage-1 event (the classic conversion-window funnel).

    Scale shape: stage 1 is one filtered groupBy(user); each later stage is
    a filtered scan joined to the (shrinking) survivor frame on user_id and
    re-minimized — i.e. |stages| map-side-combinable aggregates + equi-joins
    on the SAME key, which AQE broadcasts as survivors shrink. No windows,
    no per-user event collection; per-user event skew never materializes a
    row wider than (user, t).

    Output: (stage_idx, stage, n_users, pct_of_first) — pct rounded to 6.
    """
    stage_counts = [
        surv.groupBy().agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.lit(i).alias("stage_idx"),
            F.lit(st).alias("stage"),
            "n_users",
        )
        for i, st, surv in _funnel_survivors(
            df, stages, ts_col, user_col, type_col, horizon_us
        )
    ]
    out = stage_counts[0]
    for s in stage_counts[1:]:
        out = out.unionByName(s)
    # |stages| rows total — the single-partition window is bounded by design
    first_n = F.first("n_users").over(
        Window.orderBy(F.col("stage_idx").asc()).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    return out.select(
        "stage_idx",
        "stage",
        F.col("n_users").cast("long").alias("n_users"),
        F.when(
            first_n > 0,
            F.round(F.col("n_users") / first_n.cast("double"), 6),
        ).alias("pct_of_first"),
    )


def funnel_latency(
    df: DataFrame,
    stages: tuple[str, ...],
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    horizon_us: int | None = None,
    permilles: tuple[int, ...] = (500, 900, 990),
) -> DataFrame:
    """Conversion-latency distribution per funnel stage (SURVEY §2.G
    op 156): for every stage >= 2, nearest-rank percentiles of
    (first-qualifying time at stage i) − (first stage-1 time) — the
    "how long does conversion take" panel next to op 139's "how many
    convert".

    Determinism protocol: latencies are exact integer µs; the selected
    rank is ceil(p·n) computed IN INTEGERS — (n·pm + 999) div 1000 for
    a permille pm — so no float ever decides a rank (a double p·n can
    straddle an integer boundary); the selected value is the latency
    whose cumulative count first reaches the rank. Bit-identical across
    engines by construction.

    Scale shape: the survivor chain is op 139's (no event-row windows);
    latencies then compress to (stage, latency) COUNTS in one
    combinable groupBy before the per-stage cumulative window — the
    window input is |distinct latencies per stage|, bounded by the
    value domain, not the user count, and collapses further under a
    coarser ``resolution`` upstream (quantize the ts columns) when a
    corpus has sub-µs-unique latencies (the op-124 pr_curve
    distinct-count discipline applies at that point).

    Output: (stage_idx, stage, n_conv, p{pm}_us ...) for stages >= 2.
    """
    lats = None
    for i, st, surv in _funnel_survivors(
        df, stages, ts_col, user_col, type_col, horizon_us
    ):
        if i == 1:
            continue
        frame = surv.select(
            F.lit(i).alias("stage_idx"),
            F.lit(st).alias("stage"),
            (F.col("_t") - F.col("_t1")).alias("_lat"),
        )
        lats = frame if lats is None else lats.unionByName(frame)
    cnt = lats.groupBy("stage_idx", "stage", "_lat").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = (
        Window.partitionBy("stage_idx")
        .orderBy("_lat")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cnt.withColumn("_hi", F.sum("_c").over(w))
    n = cnt.groupBy("stage_idx").agg(F.sum("_c").alias("_n"))
    joined = cum.join(n, "stage_idx")
    aggs = [F.max("_n").cast("long").alias("n_conv")]
    for pm in permilles:
        rank = F.expr(f"(_n * {pm} + 999) div 1000")
        aggs.append(
            F.min(
                F.when(
                    (F.col("_hi") >= rank)
                    & (F.col("_hi") - F.col("_c") < rank),
                    F.col("_lat"),
                )
            ).alias(f"p{pm}_us")
        )
    return (
        joined.groupBy("stage_idx", "stage")
        .agg(*aggs)
        .orderBy("stage_idx")
    )


def sql_funnel_latency(
    source: str,
    stages: tuple[str, ...],
    horizon_us: int | None = None,
    permilles: tuple[int, ...] = (500, 900, 990),
    ts_expr: str = "epoch_us(ts)",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> str:
    """DuckDB twin of :func:`funnel_latency` — the identical survivor
    chain, integer rank formula, and cumulative-count selection."""
    ctes = [
        f"ev AS (SELECT {user_col}, {type_col} AS tp, {ts_expr} AS us"
        f" FROM {source})",
        f"s1 AS (SELECT {user_col}, min(us) AS t, min(us) AS t1"
        f" FROM ev WHERE tp = '{stages[0]}' GROUP BY {user_col})",
    ]
    for i, st in enumerate(stages[1:], start=2):
        hor = (
            f" AND e.us <= s.t1 + {horizon_us}"
            if horizon_us is not None
            else ""
        )
        ctes.append(
            f"s{i} AS (SELECT e.{user_col}, min(e.us) AS t, s.t1 AS t1"
            f" FROM ev e JOIN s{i - 1} s ON e.{user_col} = s.{user_col}"
            f" WHERE e.tp = '{st}' AND e.us > s.t{hor}"
            f" GROUP BY e.{user_col}, s.t1)"
        )
    lat_selects = [
        f"SELECT {i} AS stage_idx, '{st}' AS stage, t - t1 AS lat FROM s{i}"
        for i, st in enumerate(stages[1:], start=2)
    ]
    ctes.append("lats AS (" + " UNION ALL ".join(lat_selects) + ")")
    ctes.append(
        "cnt AS (SELECT stage_idx, stage, lat, count(*) AS c"
        " FROM lats GROUP BY 1, 2, 3)"
    )
    ctes.append(
        "cum AS (SELECT *, sum(c) OVER (PARTITION BY stage_idx"
        " ORDER BY lat ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        " AS hi FROM cnt)"
    )
    ctes.append(
        "n AS (SELECT stage_idx, CAST(sum(c) AS BIGINT) AS n"
        " FROM cnt GROUP BY 1)"
    )
    picks = ["CAST(max(n.n) AS BIGINT) AS n_conv"]
    for pm in permilles:
        rank = f"(n.n * {pm} + 999) // 1000"
        picks.append(
            f"min(CASE WHEN cum.hi >= {rank} AND cum.hi - cum.c < {rank}"
            f" THEN cum.lat END) AS p{pm}_us"
        )
    return (
        "WITH "
        + ", ".join(ctes)
        + " SELECT stage_idx, stage, "
        + ", ".join(picks)
        + " FROM cum JOIN n USING (stage_idx)"
        + " GROUP BY stage_idx, stage ORDER BY stage_idx"
    )


def cohort_retention(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    bucket_us: int = 7 * 86_400_000_000,
) -> DataFrame:
    """Cohort retention matrix (SURVEY §2.G op 140): cohort = the user's
    first active bucket (default weekly); one output row per (cohort,
    offset) with the count of cohort users active offset buckets later —
    the engagement table every product/corpus-growth review reads.

    Scale shape: distinct (user, bucket) activity + a min-bucket cohort
    aggregate, joined on user_id and re-aggregated — three shuffles, all
    on bounded-width integer rows; the matrix itself is
    O(cohorts × offsets), tiny at any corpus size. Buckets are integer
    epoch_us // bucket_us slots, so engines can never disagree on week
    boundaries (ISO-week vs epoch-week truncation).

    Output: (cohort_bucket, offset, n_users).
    """
    act = (
        df.select(F.col(user_col), ts_micros(df, ts_col).alias("_us"))
        .select(
            F.col(user_col), F.expr(f"_us div {bucket_us}").alias("bucket")
        )
        .distinct()
    )
    cohort = act.groupBy(user_col).agg(F.min("bucket").alias("cohort_bucket"))
    return (
        act.join(cohort, user_col)
        .select(
            "cohort_bucket",
            (F.col("bucket") - F.col("cohort_bucket")).alias("offset"),
            F.col(user_col),
        )
        .groupBy("cohort_bucket", "offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def trend_by_group(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
    x_unit_us: int = 3_600_000_000,
    x_origin_us: int = 0,
) -> DataFrame:
    """Per-group least-squares trend of value against time (SURVEY §2.G
    op 144): slope/intercept/R² from EXACT sufficient moments — the
    metric-drift detector ("is error rate trending up?") every event
    pipeline runs per series.

    Determinism protocol (the op-38 exact-moments discipline, extended
    to the full OLS triple): the five moments Σx, Σy, Σx², Σxy, Σy² are
    exact decimal sums (order-free; x is an integer time slot, y a
    2-decimal value), cast to DOUBLE once, and the closed-form
    estimators evaluate in ONE fixed operand order on both engines —
    so results are bit-identical to the SQL oracle, not merely close.
    ``x_origin_us`` rebases the time axis (pass the corpus epoch) so
    the double-precision products stay far from 2^53 at any corpus
    size; degenerate series (constant x or constant y) surface NULL
    slope/R², never an engine-dependent inf. The x² moment multiplies
    AFTER the decimal cast (xd·xd, like xd·yd) — an int64 x*x would
    silently wrap for |x| > ~3.0e9 where DuckDB raises (ADVICE r9);
    in decimal both engines stay exact to |x| < 1e18.

    Scale shape: ONE map-side-combinable groupBy — five sums and a
    count per group, |groups| output rows, nothing else. Output:
    (group, n, slope, intercept, r2), slope in value-units per
    ``x_unit_us``.
    """
    pt = df.select(
        F.col(group_col).alias("grp"),
        ts_micros(df, ts_col).alias("_us"),
        F.col(value_col).alias("_y"),
    ).select(
        "grp",
        F.expr(f"(_us - {x_origin_us}) div {x_unit_us}").alias("_x"),
        F.col("_y"),
    )
    xd = F.col("_x").cast("decimal(18,0)")
    yd = F.col("_y").cast("decimal(18,2)")
    m = pt.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("_sx"),
        F.sum(yd).cast("double").alias("_sy"),
        F.sum(xd * xd).cast("double").alias("_sxx"),
        F.sum(xd * yd).cast("double").alias("_sxy"),
        F.sum(yd * yd).cast("double").alias("_syy"),
    )
    return trend_from_moments(m)


def trend_from_moments(m: DataFrame) -> DataFrame:
    """Closed-form OLS stage of :func:`trend_by_group`, split out so the
    streaming trend state (streaming/activity.py, op 146) reports through
    the IDENTICAL double arithmetic — the fold ≡ one-shot law then
    reduces to additivity of the decimal moments. ``m`` columns:
    (grp, n, _sx, _sy, _sxx, _sxy, _syy) with the moments in DOUBLE."""
    n = F.col("n").cast("double")
    cov_n = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    var_x = n * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    var_y = n * F.col("_syy") - F.col("_sy") * F.col("_sy")
    slope = cov_n / var_x
    return m.select(
        "grp",
        "n",
        F.when(var_x != 0, F.round(slope, 6)).alias("slope"),
        F.when(
            var_x != 0,
            F.round((F.col("_sy") - slope * F.col("_sx")) / n, 6),
        ).alias("intercept"),
        F.when(
            (var_x != 0) & (var_y != 0),
            F.round(cov_n * cov_n / (var_x * var_y), 6),
        ).alias("r2"),
    )


def rolling_active_users(
    df: DataFrame,
    window_buckets: int,
    ts_col: str = "ts",
    user_col: str = "user_id",
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Rolling distinct-actives (SURVEY §2.G op 147): for every bucket,
    the number of DISTINCT users active in the trailing ``window_buckets``
    buckets — the DAU/WAU/MAU family (window_buckets = 1 / 7 / 30 on
    daily buckets), the engagement denominator every corpus/product
    review reads.

    Scale shape — the distinct-explode lift: a windowed COUNT DISTINCT
    cannot partial-aggregate, so the naive per-day set union is a
    corpus-sized shuffle per day. Instead: (1) reduce events to the
    distinct (user, bucket) activity matrix (one combinable shuffle);
    (2) explode each activity row to the ``window_buckets`` report
    buckets it contributes to (in-row generate, blow-up = the window
    factor, the op-29 sliding-window shape); (3) distinct + count —
    (user, report_bucket) pairs, combinable again. Work is
    O(activity × window), never O(events × window); report buckets with
    no activity in range emit nothing (a dense grid is op 138's job).

    Emits only report buckets ≥ the corpus' first active bucket + 0
    (i.e. trailing windows clipped at the data's start are reported as
    observed — standard DAU convention) and ≤ the last active bucket
    (no phantom future buckets from the explode).

    Output: (bucket BIGINT, n_active BIGINT).
    """
    if window_buckets < 1:
        raise ValueError("window_buckets must be >= 1")
    act = (
        df.select(F.col(user_col), ts_micros(df, ts_col).alias("_us"))
        .select(
            F.col(user_col), F.expr(f"_us div {bucket_us}").alias("_b")
        )
        .distinct()
    )
    hi = act.groupBy().agg(F.max("_b").alias("_hi"))
    exploded = act.crossJoin(F.broadcast(hi)).select(
        F.col(user_col),
        F.explode(
            F.sequence(
                F.col("_b"),
                F.least(
                    F.col("_b") + F.lit(window_buckets - 1), F.col("_hi")
                ),
            )
        ).alias("bucket"),
    )
    return (
        exploded.distinct()
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def bucket_anomalies(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    interval_us: int = 3_600_000_000,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Per-series bucket anomalies (SURVEY §2.G op 149): bucket the
    series to fixed intervals, score every bucket's value sum against
    its own series' mean/std (population), and emit the buckets with
    |z| ≥ threshold — the "which hours were abnormal" monitor that sits
    on top of op 138's resample in every event pipeline.

    Determinism (the op-144 discipline): bucket sums stay DECIMAL into
    the per-series moment aggregate (Σs and Σs² exact, order-free), the
    cast to DOUBLE happens once, and z = (x − S/n) / (√(n·Σs² − S²)/n)
    evaluates in ONE fixed operand order on both engines — the flag set
    is bit-deterministic, never a float-reduction coin flip. Zero-
    variance series emit nothing (0/0 is not a z-score).

    Scale shape: two combinable aggregates (events → buckets → series
    moments) + one equi-join of the bucket table against |series|
    moment rows (broadcastable) — no windows, no second scan of events.

    Output: (key, bucket, bucket_sum DOUBLE, z DOUBLE rounded 6),
    |z| ≥ threshold only.
    """
    obs = (
        df.select(
            F.col(key_col).alias("key"),
            ts_micros(df, ts_col).alias("_us"),
            F.col(value_col),
        )
        .withColumn("bucket", F.expr(f"_us div {interval_us}"))
        .groupBy("key", "bucket")
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("_s")
        )
    )
    return anomalies_from_buckets(obs, z_threshold)


def anomalies_from_buckets(obs: DataFrame, z_threshold: float) -> DataFrame:
    """Scoring stage of :func:`bucket_anomalies`, split out so the
    op-143 activity state reports through the IDENTICAL plan
    (streaming/activity.py activity_anomaly_report): the state's
    per-bucket decimal sums ARE this obs table, so report(state) ≡
    batch operator by the additive fold law. ``obs`` columns:
    (key, bucket, _s DECIMAL(18,2))."""
    stats = obs.groupBy("key").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_s").cast("double").alias("_s1"),
        F.sum(F.col("_s") * F.col("_s")).cast("double").alias("_s2"),
    )
    n = F.col("_n").cast("double")
    mean = F.col("_s1") / n
    var_n = n * F.col("_s2") - F.col("_s1") * F.col("_s1")
    x = F.col("_s").cast("double")
    z = (x - mean) / (F.sqrt(var_n) / n)
    return (
        obs.join(stats, "key")
        .filter(var_n > 0)
        .select(
            "key",
            "bucket",
            x.alias("bucket_sum"),
            F.round(z, 6).alias("z"),
        )
        .filter(F.abs(F.col("z")) >= z_threshold)
    )


def cusum_alarms(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    interval_us: int = 3_600_000_000,
    slack: str = "0.00",
    tau: float = 4.0,
) -> DataFrame:
    """Per-series CUSUM mean-shift monitor (SURVEY §2.G op 150; Page
    1954): alarm on the buckets where the one-sided cumulative sum of
    (value − series mean − slack) exceeds τ series standard deviations —
    the sequential companion to op 149's pointwise z (a slow drift never
    trips a z-score; CUSUM accumulates it).

    The recursion S_t = max(0, S_{t-1} + y_t) is not window-expressible,
    but its CLOSED FORM is: S_t = P_t − min_{j≤t} P_j with P the prefix
    sum of y — two frames over one ordered window. Exactness protocol:
    the per-series mean never materializes (a division); instead
    everything scales by n — y'_t = n·x_t − Σx − n·slack is an EXACT
    decimal (``slack`` is a STRING so it enters decimal arithmetic
    unrounded, the op-82 discipline), prefix sums and mins of exact
    decimals are exact whatever the partitioning, and the one cast to
    DOUBLE happens at the final normalized statistic
    s_t = (n·S_t) / sqrt(n·Σx² − (Σx)²) — identical decimals in, one
    fixed-order double expression out, so the alarm set is
    bit-deterministic across engines. Zero-variance series emit nothing.

    Scale shape: one combinable bucket aggregate, one |series|-row
    moment join (broadcastable), ONE window per series over its
    buckets — the sessionize shape; nothing touches raw events twice.

    Output: (key, bucket, cusum DOUBLE rounded 6) where cusum > τ.
    """
    obs = (
        df.select(
            F.col(key_col).alias("key"),
            ts_micros(df, ts_col).alias("_us"),
            F.col(value_col),
        )
        .withColumn("bucket", F.expr(f"_us div {interval_us}"))
        .groupBy("key", "bucket")
        .agg(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("_x")
        )
    )
    return cusum_from_buckets(obs, slack, tau)


def cusum_from_buckets(obs: DataFrame, slack: str, tau: float) -> DataFrame:
    """Closed-form stage of :func:`cusum_alarms`, split out so the
    op-143 activity state reports through the IDENTICAL plan
    (streaming/activity.py activity_cusum_report). ``obs`` columns:
    (key, bucket, _x DECIMAL(18,2))."""
    stats = obs.groupBy("key").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").cast("decimal(38,2)").alias("_s1"),
        F.sum(F.col("_x") * F.col("_x")).cast("double").alias("_s2d"),
        F.sum("_x").cast("double").alias("_s1d"),
    )
    nd = F.col("_n").cast("decimal(12,0)")
    y = (
        (nd * F.col("_x")).cast("decimal(38,2)")
        - F.col("_s1")
        - (nd * F.lit(slack).cast("decimal(18,2)")).cast("decimal(38,2)")
    ).cast("decimal(38,2)")
    w = (
        Window.partitionBy("key")
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scored = (
        obs.join(stats, "key")
        .withColumn("_y", y)
        .withColumn("_p", F.sum("_y").over(w).cast("decimal(38,2)"))
        # the min must include the EMPTY prefix (P_0 = 0): the recursion
        # S_t = max(0, S_{t-1} + y_t) equals P_t − min_{0≤j≤t} P_j
        .withColumn(
            "_m",
            F.least(
                F.lit("0").cast("decimal(38,2)"), F.min("_p").over(w)
            ),
        )
    )
    n_dbl = F.col("_n").cast("double")
    var_n = n_dbl * F.col("_s2d") - F.col("_s1d") * F.col("_s1d")
    s_norm = (F.col("_p") - F.col("_m")).cast("double") / F.sqrt(var_n)
    return (
        scored.filter(var_n > 0)
        .select("key", "bucket", F.round(s_norm, 6).alias("cusum"))
        .filter(F.col("cusum") > tau)
    )


def session_transitions(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    id_col: str = "event_id",
    type_col: str = "event_type",
    gap_minutes: int = 30,
) -> DataFrame:
    """Within-session event-type transition matrix (SURVEY §2.G op 151):
    counts and row-normalized probabilities of (prev_type → next_type)
    over consecutive events of the same session — the first-order Markov
    path model behind "what do users do after X" and next-event
    baselines.

    Scale shape: session boundaries come from the op-20 machinery
    (sessionize_events — the SAME lag + cumulative-flag window, one
    shuffle on user); transitions are one more lag over the identical
    window partitioning (no extra exchange: same key, same order), then
    a combinable (prev, next) groupBy whose output is
    |types|² rows. The probability divides integer counts by the
    per-prev total in one fixed-order double (op-144 discipline),
    rounded 6 — bit-identical across engines.

    Output: (prev_type, next_type, n, prob).
    """
    ev = sessionize_events(
        df, ts_col, user_col, id_col, gap_minutes, keep_cols=(type_col,)
    )
    w = Window.partitionBy(user_col, "session_id").orderBy(
        F.col("ts_us").asc(), F.col(id_col).asc()
    )
    pairs = (
        ev.withColumn("_prev", F.lag(type_col).over(w))
        .filter(F.col("_prev").isNotNull())
        .groupBy(
            F.col("_prev").alias("prev_type"),
            F.col(type_col).alias("next_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("prev_type").agg(F.sum("n").alias("_tot"))
    return pairs.join(totals, "prev_type").select(
        "prev_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("n").cast("double") / F.col("_tot").cast("double"), 6
        ).alias("prob"),
    )


def psi_by_group(
    df: DataFrame,
    boundary_us: int,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    bin_width: str = "2.00",
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index per series between the periods before
    and after ``boundary_us`` (SURVEY §2.G op 152): the distribution-
    drift metric ML monitoring reads per feature — PSI < 0.1 stable,
    0.1–0.25 shifting, > 0.25 drifted (the credit-scoring convention).

    Values bin to a FIXED grid (floor(value / bin_width) clamped to
    [0, n_bins)), counts are integers, and both periods take add-one
    smoothing over the FULL bin domain (so empty bins contribute and
    ln never sees 0) — PSI = Σ_b (p_b − q_b)·ln(p_b / q_b) then folds
    over the densified, BIN-ORDERED array (the op-145 rank-ordered-fold
    protocol: ``aggregate(sort_array(…))`` ≡ the oracle's
    ``list_reduce(list_sort(…))``), so both engines sum the irrational
    terms in the same order — bit-identical. Binning divides DOUBLEs —
    the identical IEEE operation on both engines (decimal division
    derives different scales per engine and could flip a boundary
    floor; doubles never disagree).

    Scale shape: one combinable (key, bin, period) count, densified by
    a |keys|×n_bins grid join (bounded), one ≤ n_bins-element fold per
    key. Output: (key, n_before, n_after, psi) — NULL psi when either
    period is empty for the key (no distribution to compare).
    """
    ev = df.select(
        F.col(key_col).alias("key"),
        ts_micros(df, ts_col).alias("_us"),
        F.col(value_col).alias("_v"),
    ).select(
        "key",
        (F.col("_us") >= F.lit(boundary_us)).alias("_after"),
        F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                # floor over the IDENTICAL IEEE double division on both
                # engines: decimal division scales/rounds differently
                # between Spark and DuckDB, doubles never disagree
                F.floor(
                    F.col("_v").cast("double")
                    / F.lit(bin_width).cast("double")
                ).cast("int"),
            ),
        ).alias("_bin"),
    )
    counts = ev.groupBy("key", "_bin").agg(
        F.sum(F.when(~F.col("_after"), 1).otherwise(0)).alias("_ca"),
        F.sum(F.when(F.col("_after"), 1).otherwise(0)).alias("_cb"),
    )
    keys = counts.select("key").distinct()
    grid = keys.select(
        "key",
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("_bin"),
    )
    dense = grid.join(counts, ["key", "_bin"], "left").select(
        "key",
        "_bin",
        F.coalesce(F.col("_ca"), F.lit(0)).cast("long").alias("_ca"),
        F.coalesce(F.col("_cb"), F.lit(0)).cast("long").alias("_cb"),
    )
    per_key = dense.groupBy("key").agg(
        F.sum("_ca").alias("n_before"),
        F.sum("_cb").alias("n_after"),
        F.sort_array(
            F.collect_list(F.struct("_bin", "_ca", "_cb"))
        ).alias("_bins"),
    )
    na = F.col("n_before").cast("double") + F.lit(float(n_bins))
    nb = F.col("n_after").cast("double") + F.lit(float(n_bins))

    def _term(acc, e):
        pa = (e.getField("_ca").cast("double") + F.lit(1.0)) / na
        pb = (e.getField("_cb").cast("double") + F.lit(1.0)) / nb
        return acc + (pa - pb) * F.log(pa / pb)

    psi = F.aggregate(F.col("_bins"), F.lit(0.0), _term)
    return per_key.select(
        "key",
        F.col("n_before").cast("long").alias("n_before"),
        F.col("n_after").cast("long").alias("n_after"),
        F.when(
            (F.col("n_before") > 0) & (F.col("n_after") > 0),
            F.round(psi, 6),
        ).alias("psi"),
    )
