"""Irregular-series repair and order-sensitive matching operators.

The reference pipeline emits per-entry objects with no cross-row time
semantics (nypl-spacetime/etl-city-directories city-directories.js:
338-451); this module adds the time-series toolkit a warehouse user
layers on top of such event data: gap-fill (LOCF and exact linear
interpolation over a per-key date spine), a rolling least-squares
slope, FIFO quantity allocation via running-sum interval overlap, and
regex sequence matching over per-user event strings.

Cross-engine determinism policy (see functions/numeric.py): all value
math runs in DECIMAL/BIGINT cents until a single final double divide +
ROUND, so the DuckDB oracle is bit-identical. LOCF/interp avoid the
engines' differing IGNORE-NULLS dialects by construction: Spark uses
``last(..., ignorenulls=True)``, the oracle uses the equivalent
gid-partition emulation (count-over-preceding groups each gap with its
preceding observation).

Scale notes inline per operator; the common shapes are (a) collapse
the raw stream to O(keys x days) FIRST, so every window runs on the
small grid, and (b) FIFO matching as monotone interval overlap —
output pairs are O(supply+demand) per key, never O(s x d).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_city_directories_spark.sources.tables import load_table

SLOPE_WINDOW_DAYS = 7  # trailing rows in the rolling regression
SEQ_PATTERN = "vc*p"  # view -> any clicks -> purchase (unique-match regex)


def _daily_user_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) purchase revenue on a dense calendar spine.

    The event stream collapses to O(users x days-observed) rows before
    any window: one groupBy on (user_id, day). The spine is the global
    [min, max] day span (1-row bounds aggregate, exploded) crossed
    with the distinct purchasing users — both sides are tiny relative
    to the stream, so the densification join never touches raw events
    again. ``rev`` is NULL on filled days, DECIMAL(18,2) on observed
    ones.
    """
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("d"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("rev"))
    )
    bounds = daily.groupBy().agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("d"))
    users = daily.select("user_id").distinct()
    return users.crossJoin(F.broadcast(spine)).join(daily, ["user_id", "d"], "left")


def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward over the per-user daily grid.

    Days with no purchase inherit the most recent observed revenue;
    days before a user's first purchase stay NULL. One window per
    partition key over the ALREADY-COLLAPSED grid (users x days), so
    the sort is bounded by the spine length, not the event count —
    the shape that survives a 100 TB stream.
    """
    grid = _daily_user_grid(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.last("rev", ignorenulls=True).over(w).cast("double").alias("filled_rev"),
        F.col("rev").isNotNull().alias("is_observed"),
    )


def q_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear interpolation between observations on the grid.

    Missing days get ``prev + (next-prev) * (d-pd) / (nd-pd)``; the
    boundary tails carry the nearest observation flat. The math is
    integer cents x integer day-gaps with ONE double divide at the
    end (ROUND 4), so Spark and DuckDB agree bit-for-bit. Two windows
    (forward last / backward first) over the collapsed grid — no pass
    over the raw stream.
    """
    grid = _daily_user_grid(spark, sf_dir).select(
        "user_id",
        "d",
        "rev",
        (F.col("rev") * 100).cast("bigint").alias("cents"),
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bwd = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("rev").isNotNull(), F.col("d"))
    annotated = grid.select(
        "user_id",
        "d",
        "rev",
        F.last("cents", ignorenulls=True).over(fwd).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(fwd).alias("pd"),
        F.first("cents", ignorenulls=True).over(bwd).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(bwd).alias("nd"),
    )
    span = F.datediff("nd", "pd").cast("bigint")
    num = F.col("pv") * F.datediff("nd", "d").cast("bigint") + F.col(
        "nv"
    ) * F.datediff("d", "pd").cast("bigint")
    # Half-up rounding to 4 dp in INTEGER space: the quotient
    # num/(span*100) lands exactly on .00005 boundaries (span*100
    # divides powers of 10), where Spark's decimal-string HALF_UP and
    # DuckDB's scaled-double rounding disagree. cents are >= 0, so
    # round_half_up(a/b) == (2a + b) div (2b) exactly, both engines.
    # magnitudes stay < 2^40, so the double-floor is an exact int div
    interp = F.floor(
        (num * 200 + span) / (span * 2)
    ).cast("double") / 10000
    filled = (
        F.when(F.col("rev").isNotNull(), F.col("rev").cast("double"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp
        )
        .when(F.col("pv").isNotNull(), F.col("pv").cast("double") / 100)
        .otherwise(F.col("nv").cast("double") / 100)
    )
    return annotated.select(
        "user_id",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        filled.alias("filled_rev"),
        F.col("rev").isNotNull().alias("is_observed"),
    )


def q_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row least-squares slope of daily revenue per type.

    The regression reduces to five sufficient-statistic window sums
    (n, Sx, Sy, Sxx, Sxy) over integer cents and day ordinals — exact
    until the single closed-form double divide (ROUND 6). The stream
    collapses to O(types x days) before the window; rolling frames on
    that grid cost O(days) per type regardless of corpus size.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("rev")
    )
    daily = daily.select(
        "event_type",
        "d",
        F.datediff("d", F.lit("2024-01-01").cast("date")).cast("bigint").alias("x"),
        (F.col("rev") * 100).cast("bigint").alias("y"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-(SLOPE_WINDOW_DAYS - 1), 0)
    )
    n = F.count(F.lit(1)).over(w)
    sx = F.sum("x").over(w)
    sy = F.sum("y").over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    den = n * sxx - sx * sx
    slope = F.round(
        (n * sxy - sx * sy).cast("double")
        / F.nullif((den * 100).cast("double"), F.lit(0.0)),
        6,
    )
    return daily.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        n.cast("bigint").alias("n_days"),
        slope.alias("slope_per_day"),
    )


def q_allocation_fifo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO allocation of shipped quantity against returned stock.

    Classic FIFO-as-interval-algebra: per part, returned line items
    (``l_returnflag = 'R'``) form supply lots and the remaining line
    items form demand, both in (shipdate, orderkey, linenumber) order.
    Each side's running quantity sum turns rows into half-open
    intervals [s_hi - qty, s_hi); an allocation is the overlap of a
    supply and a demand interval. Because both interval chains are
    monotone and gap-free, every supply lot overlaps a CONTIGUOUS run
    of demands: output pairs are O(supply + demand) per part, not
    O(s x d) — the property that keeps the join linear at 100 TB.
    Spark executes it as an equi-join on the part key (the shuffle
    key) with the overlap predicate applied within each key.
    Quantities stay DECIMAL end-to-end; the only double cast is the
    output column.

    r10 optimization (guide §1.2 / §2.4): the former pre-pass — a
    running sum over the UNSPLIT per-part sequence whose [lo, hi)
    intervals were used only to ORDER each side — is algebraically
    redundant: quantities are strictly positive, so that running sum
    is strictly increasing and ordering a side by its ``lo`` equals
    ordering it by the original (shipdate, orderkey, linenumber) key.
    Each side now computes its own FIFO clock directly from the sort
    key, removing one full-table window pass (3 window passes → 2) and
    letting the ``l_returnflag`` side filters push down to the
    parquet scan (PushedFilters now carries the flag predicate).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        "l_returnflag",
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
    )

    # Each side's running quantity sum IS its FIFO clock; both sides
    # share the deterministic (shipdate, orderkey, linenumber) order.
    def _rebase(side: DataFrame, prefix: str) -> DataFrame:
        w2 = (
            Window.partitionBy("l_partkey")
            .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return side.select(
            "l_partkey",
            F.col("l_orderkey").alias(f"{prefix}_orderkey"),
            F.col("l_linenumber").alias(f"{prefix}_linenumber"),
            "qty",
            F.sum("qty").over(w2).alias("s_hi"),
        ).select(
            "l_partkey",
            f"{prefix}_orderkey",
            f"{prefix}_linenumber",
            (F.col("s_hi") - F.col("qty")).alias(f"{prefix}_lo"),
            F.col("s_hi").alias(f"{prefix}_hi"),
        )

    s = _rebase(li.filter(F.col("l_returnflag") == "R"), "s")
    d = _rebase(li.filter(F.col("l_returnflag") != "R"), "d")
    alloc = F.least("s_hi", "d_hi") - F.greatest("s_lo", "d_lo")
    return (
        s.join(d, "l_partkey")
        .filter(
            (F.col("s_lo") < F.col("d_hi")) & (F.col("d_lo") < F.col("s_hi"))
        )
        .select(
            "l_partkey",
            "s_orderkey",
            "s_linenumber",
            "d_orderkey",
            "d_linenumber",
            alloc.cast("double").alias("alloc_qty"),
        )
        .filter(F.col("alloc_qty") > 0)
    )


def q_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex funnel matching over per-user event-type strings.

    MATCH_RECOGNIZE semantics by compilation to a regex over the
    per-user sequence string: events sort by (ts, event_id), collapse
    to their type initials, and ``vc*p`` counts view->clicks->purchase
    conversions. The pattern has the unique-match property (the c-run
    between v and p is forced), so Java regex and RE2 agree on the
    non-overlapping count. One groupBy on user_id; the per-user string
    build is collect_list + array_sort — JVM-side, no Python. Sequence
    strings are O(events-per-user); at 100 TB this keys on the same
    user partitioning every other per-user op shuffles on.
    """
    events = load_table(spark, sf_dir, "events")
    seq = (
        events.select(
            "user_id",
            F.struct(
                F.col("ts"), F.col("event_id"), F.substring("event_type", 1, 1).alias("c")
            ).alias("e"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_list("e")).alias("es"))
        .select(
            "user_id",
            F.size("es").alias("n_events"),
            F.concat_ws("", F.transform("es", lambda x: x["c"])).alias("seq"),
        )
    )
    return seq.select(
        "user_id",
        "n_events",
        F.size(F.regexp_extract_all("seq", F.lit(SEQ_PATTERN), F.lit(0)))
        .cast("bigint")
        .alias("n_conversions"),
    )


QUERIES = {
    "q_gapfill_locf": q_gapfill_locf,
    "q_gapfill_interp": q_gapfill_interp,
    "q_rolling_slope": q_rolling_slope,
    "q_allocation_fifo": q_allocation_fifo,
    "q_sequence_match": q_sequence_match,
}

_GRID_SQL = """
        daily AS (
          SELECT user_id, CAST(ts AS DATE) AS d,
                 SUM(CAST(value AS DECIMAL(18,2))) AS rev
          FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
        ),
        bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
        spine AS (
          SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
          FROM bounds
        ),
        grid AS (
          SELECT u.user_id, s.d, dl.rev
          FROM (SELECT DISTINCT user_id FROM daily) u
          CROSS JOIN spine s
          LEFT JOIN daily dl ON dl.user_id = u.user_id AND dl.d = s.d
        )
"""

ORACLES = {
    # LOCF via the gid emulation: COUNT(rev) over preceding rows groups
    # every gap with the observation that opened it; MAX within the
    # (user, gid) group recovers that observation (it is the group's
    # only non-null).
    "q_gapfill_locf": f"""
        WITH {_GRID_SQL},
        g AS (
          SELECT user_id, d, rev,
                 COUNT(rev) OVER (PARTITION BY user_id ORDER BY d
                                  ROWS UNBOUNDED PRECEDING) AS gid
          FROM grid
        )
        SELECT user_id, STRFTIME(d, '%Y-%m-%d') AS day,
               CAST(MAX(rev) OVER (PARTITION BY user_id, gid) AS DOUBLE)
                 AS filled_rev,
               rev IS NOT NULL AS is_observed
        FROM g
    """,
    "q_gapfill_interp": f"""
        WITH {_GRID_SQL},
        g AS (
          SELECT user_id, d, rev,
                 CAST(rev * 100 AS BIGINT) AS cents,
                 CASE WHEN rev IS NOT NULL THEN d END AS od
          FROM grid
        ),
        ann AS (
          SELECT user_id, d, rev,
                 last_value(cents IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS UNBOUNDED PRECEDING) AS pv,
                 last_value(od IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS UNBOUNDED PRECEDING) AS pd,
                 first_value(cents IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
                 first_value(od IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY d
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
          FROM g
        )
        SELECT user_id, STRFTIME(d, '%Y-%m-%d') AS day,
               CASE
                 WHEN rev IS NOT NULL THEN CAST(rev AS DOUBLE)
                 WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                   CAST(((pv * DATE_DIFF('day', d, nd)
                          + nv * DATE_DIFF('day', pd, d)) * 200
                         + DATE_DIFF('day', pd, nd))
                        // (DATE_DIFF('day', pd, nd) * 2) AS DOUBLE) / 10000
                 WHEN pv IS NOT NULL THEN CAST(pv AS DOUBLE) / 100
                 ELSE CAST(nv AS DOUBLE) / 100
               END AS filled_rev,
               rev IS NOT NULL AS is_observed
        FROM ann
    """,
    "q_rolling_slope": f"""
        WITH daily AS (
          SELECT event_type, CAST(ts AS DATE) AS d,
                 DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT
                   AS x,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS y
          FROM events GROUP BY 1, 2, 3
        ),
        s AS (
          SELECT event_type, d,
                 COUNT(*) OVER w::BIGINT AS n,
                 SUM(x) OVER w::BIGINT AS sx,
                 SUM(y) OVER w::BIGINT AS sy,
                 SUM(x * x) OVER w::BIGINT AS sxx,
                 SUM(x * y) OVER w::BIGINT AS sxy
          FROM daily
          WINDOW w AS (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN {SLOPE_WINDOW_DAYS - 1} PRECEDING
                       AND CURRENT ROW)
        )
        SELECT event_type, STRFTIME(d, '%Y-%m-%d') AS day,
               n AS n_days,
               ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                     / NULLIF(CAST((n * sxx - sx * sx) * 100 AS DOUBLE), 0),
                     6) AS slope_per_day
        FROM s
    """,
    "q_allocation_fifo": """
        WITH ranged AS (
          SELECT l_partkey, l_orderkey, l_linenumber, l_returnflag,
                 CAST(l_quantity AS DECIMAL(18,2)) AS qty,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
                   PARTITION BY l_partkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS UNBOUNDED PRECEDING) AS hi
          FROM lineitem
        ),
        rebased AS (
          SELECT l_partkey, l_orderkey, l_linenumber, l_returnflag, qty,
                 SUM(qty) OVER (
                   PARTITION BY l_partkey, l_returnflag = 'R'
                   ORDER BY hi ROWS UNBOUNDED PRECEDING) AS s_hi
          FROM ranged
        ),
        iv AS (
          SELECT l_partkey, l_orderkey, l_linenumber, l_returnflag,
                 s_hi - qty AS lo, s_hi AS hi
          FROM rebased
        )
        SELECT s.l_partkey,
               s.l_orderkey AS s_orderkey, s.l_linenumber AS s_linenumber,
               d.l_orderkey AS d_orderkey, d.l_linenumber AS d_linenumber,
               CAST(LEAST(s.hi, d.hi) - GREATEST(s.lo, d.lo) AS DOUBLE)
                 AS alloc_qty
        FROM iv s JOIN iv d
          ON s.l_partkey = d.l_partkey
         AND s.l_returnflag = 'R' AND d.l_returnflag <> 'R'
         AND s.lo < d.hi AND d.lo < s.hi
        WHERE LEAST(s.hi, d.hi) - GREATEST(s.lo, d.lo) > 0
    """,
    "q_sequence_match": f"""
        WITH seqs AS (
          SELECT user_id, COUNT(*)::INT AS n_events,
                 STRING_AGG(SUBSTR(event_type, 1, 1), ''
                            ORDER BY ts, event_id) AS seq
          FROM events GROUP BY 1
        )
        SELECT user_id, n_events,
               LEN(regexp_extract_all(seq, '{SEQ_PATTERN}'))::BIGINT
                 AS n_conversions
        FROM seqs
    """,
}
