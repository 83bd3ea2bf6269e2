"""Cross-row analytics: market-basket pair mining, exact least-squares
trend, Pareto/ABC classification, and epoch-capped corpus mixing.

These extend the query surface past the reference's per-row transforms
(nypl-spacetime/etl-city-directories city-directories.js:338-451 emits
objects one entry at a time) with the whole-corpus analytics a
warehouse user expects, each designed around one shuffle and exact
decimal/integer arithmetic so the DuckDB oracle matches bit-for-bit.

Scale notes per operator are inline; the common theme is a-priori
pruning (market basket), dimension-sized global sorts only
(ABC over parts, not lineitem), and sufficient-statistics aggregation
(regression reduces 100 TB of rows to five sums per group map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_city_directories_spark.functions.graph import connected_components
from etl_city_directories_spark.functions.memo import rolling_persist
from etl_city_directories_spark.functions.numeric import dec2, ratio
from etl_city_directories_spark.sources.tables import load_table

# Pairs must co-occur in at least this many orders. Downward closure
# (Agrawal & Srikant 1994, a-priori): a pair in >=K orders implies each
# item is in >=K orders, so pruning items below K before the pair join
# is semantics-preserving while shrinking the join input.
MIN_PAIR_ORDERS = 2
BASKET_TOP_K = 20

MIX_EPOCH_CAP = 2  # max epochs any one source may repeat
MIX_BUDGET_X = 2  # total char budget = MIX_BUDGET_X * corpus chars


def _basket_graph(spark: SparkSession, sf_dir: str):
    """Shared pair-graph build: (baskets_all, items, support, pairs)
    where pairs are the part pairs co-occurring in >= MIN_PAIR_ORDERS
    orders and baskets_all is one row per order with its distinct item
    array (the persisted root every other frame derives from).

    Pair generation collapses each (pruned) order to a sorted item
    array, then expands the upper-triangle pairs with a higher-order
    expression — per-order local, whole-stage-codegen JVM work, one
    shuffle on the order key instead of a self-join materializing both
    sides. O(k^2) per basket of k items; a-priori pruning bounds k by
    dropping globally-infrequent items first.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # r11 (guide §2.4 remove shuffles outright): ONE exchange on the
    # ORDER key builds per-order distinct item arrays; the former
    # separate distinct-on-(order, part) exchange is the same dedup
    # done inside the array. Everything downstream derives from the
    # persisted arrays WITHOUT re-shuffling the fact: the explode is a
    # generator (partitioning preserved), support's broadcast build is
    # the only other exchange, and the pruned-basket regroup reuses the
    # order-key partitioning the persist already established — so the
    # build is 3 exchanges (order, part, pair) instead of 4, at every
    # scale. items = exactly the distinct (order, part) pairs.
    baskets_all = rolling_persist(
        spark,
        ("market_basket_baskets", sf_dir),
        li.groupBy("l_orderkey").agg(
            F.array_sort(F.array_distinct(F.collect_list("l_partkey"))).alias(
                "parts"
            )
        ),
    )
    items = baskets_all.select(
        "l_orderkey", F.explode("parts").alias("l_partkey")
    )
    support = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    frequent = support.filter(F.col("n_item") >= MIN_PAIR_ORDERS)
    baskets = (
        items.join(F.broadcast(frequent.select("l_partkey")), "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_list("l_partkey")).alias("parts"))
    )
    pair_expr = F.expr(
        """
        flatten(transform(parts, (x, i) ->
          transform(slice(parts, i + 2, size(parts)),
                    y -> struct(x AS part_a, y AS part_b))))
        """
    )
    pairs = (
        baskets.select(F.explode(pair_expr).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= MIN_PAIR_ORDERS)
    )
    return baskets_all, items, support, pairs


def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top part-pairs by order co-occurrence with support and lift.

    A-priori shaped for scale: distinct (order, part) once, prune parts
    below the pair threshold via downward closure (Agrawal & Srikant
    1994: a pair in >=K orders needs both items in >=K orders, so the
    prune cannot change the answer), THEN expand pairs per order (see
    ``_basket_graph``). Pair generation is per-order local — never
    cross-order, never corpus² — and the item-support side stays
    broadcast-sized (O(parts)). Lift is computed from exact integer
    counts with one final double divide.
    """
    baskets_all, items, support, pairs = _basket_graph(spark, sf_dir)
    # one row per distinct order by construction — COUNT(*) over the
    # persisted basket arrays IS COUNT(DISTINCT l_orderkey), without
    # re-exploding and re-shuffling the item set (r11)
    totals = baskets_all.agg(F.count(F.lit(1)).alias("n_orders"))
    sup_a = F.broadcast(
        support.select(
            F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a")
        )
    )
    sup_b = F.broadcast(
        support.select(
            F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b")
        )
    )
    return (
        pairs.join(sup_a, "part_a")
        .join(sup_b, "part_b")
        .crossJoin(F.broadcast(totals))
        .select(
            "part_a",
            "part_b",
            "n_pair",
            "n_a",
            "n_b",
            F.round(
                (F.col("n_pair") * F.col("n_orders")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ).alias("lift"),
        )
        # The sort is integer-keyed (no float ordering): count desc,
        # then the pair ids — deterministic across engines.
        .orderBy(F.desc("n_pair"), F.asc("part_a"), F.asc("part_b"))
        .limit(BASKET_TOP_K)
    )


def q_regr_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment monthly revenue trend by exact least squares.

    Classic sufficient-statistics regression: each group reduces to
    (n, Sx, Sy, Sxx, Sxy) map-side, so the shuffle carries five numbers
    per segment regardless of input size — the only shape that
    survives 100 TB. Closed forms
        slope     = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
        intercept = (Sy*Sxx - Sx*Sxy) / (n*Sxx - Sx^2)
    are evaluated on exact integer cents (decimal(38,0) accumulators,
    x = month index 0..79) with one final double divide, so Spark and
    DuckDB agree bit-for-bit where builtin regr_slope (double
    accumulation, order-dependent) would not.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    xy = orders.join(
        F.broadcast(cust),
        orders["o_custkey"] == cust["c_custkey"],
    ).select(
        "c_mktsegment",
        (
            (F.year("o_orderdate") - F.lit(1995)) * 12
            + F.month("o_orderdate")
            - 1
        )
        .cast("long")
        .alias("x"),
        (dec2("o_totalprice") * 100).cast("long").alias("y_cents"),
    )
    d38 = "decimal(38,0)"
    stats = xy.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast(d38).alias("n"),
        F.sum("x").cast(d38).alias("sx"),
        F.sum("y_cents").cast(d38).alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast(d38).alias("sxx"),
        F.sum(F.col("x").cast(d38) * F.col("y_cents")).alias("sxy"),
        F.max("x").alias("x_max"),
    )
    det = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope_num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    icept_num = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    x_next = (F.col("x_max") + 1).cast(d38)
    return (
        stats.select(
            "c_mktsegment",
            F.col("n").cast("bigint").alias("n_orders"),
            # cents -> dollars: the /100 rides inside the one divide
            F.round(
                slope_num.cast("double") / (det * 100).cast("double"), 6
            ).alias("slope_per_month"),
            F.round(
                icept_num.cast("double") / (det * 100).cast("double"), 4
            ).alias("intercept"),
            F.round(
                (icept_num + slope_num * x_next).cast("double")
                / (det * 100).cast("double"),
                4,
            ).alias("forecast_next_month"),
        )
        .orderBy("c_mktsegment")
    )


def q_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue share.

    Parts carrying the first 80% of cumulative revenue are class A,
    the next 15% class B, the tail C. The lineitem fact collapses to
    one exact-decimal revenue row per part first, so the global
    cumulative window runs over a DIMENSION-sized input (O(parts), not
    O(lineitem)) — at 100 TB the fact table never leaves its map-side
    partial agg. Class boundaries compare exact decimals cross-
    multiplied (cum*10 <= total*8) so no float boundary flips between
    engines; ordering ties break on l_partkey.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    one = F.lit(1).cast("decimal(18,2)")
    revenue = dec2("l_extendedprice") * (one - dec2("l_discount"))
    per_part = li.groupBy("l_partkey").agg(F.sum(revenue).alias("rev"))
    w = Window.orderBy(F.desc("rev"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = per_part.agg(F.sum("rev").alias("t"))
    classed = (
        per_part.withColumn("cum", F.sum("rev").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "l_partkey",
            "rev",
            F.when(F.col("cum") * 10 <= F.col("t") * 8, "A")
            .when(F.col("cum") * 20 <= F.col("t") * 19, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev").alias("rev_dec"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "abc_class",
            "n_parts",
            F.col("rev_dec").cast("double").alias("class_revenue"),
            ratio(F.col("rev_dec"), F.col("t"), "revenue_share", 6),
        )
        .orderBy("abc_class")
    )


def corpus_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-capped training-mix allocation across document sources.

    Standard LLM-corpus mixing step: a total char budget of
    MIX_BUDGET_X x the corpus is split into a uniform per-source
    target; a source smaller than its target repeats, capped at
    MIX_EPOCH_CAP epochs. All comparisons stay in exact integers by
    working with budget numerators scaled by n_sources (allocated*n =
    least(cap*chars*n, budget)), with one final double divide for the
    fractional epoch count. One O(sources) aggregate + a scalar
    broadcast — nothing here grows with corpus size except the first
    map-side sum.
    """
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars"),
    )
    totals = per_src.agg(
        F.sum("chars").alias("total_chars"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    budget = F.col("total_chars") * MIX_BUDGET_X  # chars
    # allocated * n_sources, exact integer
    alloc_num = F.least(
        F.lit(MIX_EPOCH_CAP) * F.col("chars") * F.col("n_sources"), budget
    )
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "chars",
            F.floor(
                alloc_num.cast("decimal(38,0)")
                / F.col("n_sources").cast("decimal(38,0)")
            )
            .cast("bigint")
            .alias("allocated_chars"),
            F.round(
                alloc_num.cast("double")
                / (F.col("chars") * F.col("n_sources")).cast("double"),
                6,
            ).alias("epochs"),
            (
                F.lit(MIX_EPOCH_CAP) * F.col("chars") * F.col("n_sources")
                <= budget
            ).alias("capped"),
        )
        .orderBy("source")
    )


def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation.

    The standard CRM scoring: per customer, days since last order,
    order count, and exact-cent lifetime spend, each quintiled with
    NTILE(5). The fact table collapses to one row per customer FIRST
    (map-side partials, one shuffle on o_custkey), so the three global
    NTILE windows run over a dimension-sized input — same pattern as
    q_pareto_abc. Every NTILE orders by (metric DESC, c_custkey):
    integer keys with an explicit tiebreak, so tile boundaries are
    bit-stable across engines. Tile 1 = best (most recent / most
    frequent / highest spend).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    per_cust = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_order"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum((dec2("o_totalprice") * 100).cast("long")).alias("spend_cents"),
    )
    anchor = per_cust.agg(F.max("last_order").alias("anchor"))
    scored = per_cust.crossJoin(F.broadcast(anchor)).select(
        F.col("o_custkey").alias("c_custkey"),
        F.datediff(F.col("anchor"), F.col("last_order")).alias("recency_days"),
        "n_orders",
        (F.col("spend_cents").cast("double") / 100).alias("monetary"),
        "spend_cents",
    )
    r_w = Window.orderBy(F.asc("recency_days"), F.asc("c_custkey"))
    f_w = Window.orderBy(F.desc("n_orders"), F.asc("c_custkey"))
    m_w = Window.orderBy(F.desc("spend_cents"), F.asc("c_custkey"))
    return (
        scored.select(
            "c_custkey",
            "recency_days",
            "n_orders",
            F.round(F.col("monetary"), 2).alias("monetary"),
            F.ntile(5).over(r_w).alias("r_score"),
            F.ntile(5).over(f_w).alias("f_score"),
            F.ntile(5).over(m_w).alias("m_score"),
        )
        .withColumn(
            "segment",
            F.concat_ws(
                "-",
                F.col("r_score").cast("string"),
                F.col("f_score").cast("string"),
                F.col("m_score").cast("string"),
            ),
        )
        .orderBy("c_custkey")
    )


def _oriented_graph(spark: SparkSession, sf_dir: str):
    """Shared degree-oriented view of the basket pair graph.

    Returns (edges, deg, oriented, n_edges) where ``oriented`` carries
    every undirected edge from its (degree, id)-smaller endpoint —
    the Suri & Vassilvitskii WWW'11 orientation bounding out-degree at
    O(sqrt(m)). Partitioning is sized from the ACTUAL edge count (one
    scalar — callers need it anyway): the pair graph is orders of
    magnitude smaller than the basket fact it came from, and dragging
    the fact's partition count through the graph stages makes every
    downstream join scheduling-bound. 1M edges/partition keeps a
    billion-edge graph at ~1k partitions and a small one at one. All
    intermediates are memoized via rolling_persist, so triangle count
    and neighbor-Jaccard share one build.
    """
    _, _, _, pairs = _basket_graph(spark, sf_dir)
    pairs_p = rolling_persist(
        spark, ("triangle_pairs", sf_dir), pairs.select("part_a", "part_b")
    )
    n_edges_val = pairs_p.count()  # scalar; reused as an output literal
    n_parts = max(1, n_edges_val // 1_000_000)
    if n_parts > 1:
        edges = rolling_persist(
            spark, ("triangle_edges", sf_dir), pairs_p.repartition(n_parts)
        )
    else:
        # r10 (guide §2.4): below one partition's worth of edges the
        # repartition is a pure round-robin shuffle + second persisted
        # copy of the identical rows — the already-persisted pair
        # table (AQE-coalesced to a handful of post-shuffle
        # partitions) IS the right layout. Only reshape when the
        # graph is big enough that 1M-edge partitions matter.
        edges = pairs_p
    deg = rolling_persist(
        spark,
        ("triangle_deg", sf_dir),
        edges.select(F.col("part_a").alias("node"))
        .unionAll(edges.select(F.col("part_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg")),
    )
    da = F.broadcast(deg.select(F.col("node").alias("part_a"),
                                F.col("deg").alias("deg_a")))
    db = F.broadcast(deg.select(F.col("node").alias("part_b"),
                                F.col("deg").alias("deg_b")))
    with_deg = edges.join(da, "part_a").join(db, "part_b")
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("part_a") < F.col("part_b"))
    )
    oriented = rolling_persist(
        spark,
        ("triangle_oriented", sf_dir),
        with_deg.select(
            F.when(a_first, F.col("part_a")).otherwise(F.col("part_b")).alias("src"),
            F.when(a_first, F.col("part_b")).otherwise(F.col("part_a")).alias("dst"),
            F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("ddeg"),
        ),
    )
    return edges, deg, oriented, n_edges_val


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the basket
    co-occurrence graph.

    The canonical distributed triangle algorithm (node-iterator with
    degree orientation, cf. Suri & Vassilvitskii WWW'11): orient every
    undirected edge from its (degree, id)-smaller endpoint to the
    larger, generate wedges by self-joining oriented edges on their
    source, and close each wedge against the oriented edge set.
    Orientation bounds any node's out-degree at O(sqrt(m)), so wedge
    generation is O(m^1.5) worst-case instead of sum(deg^2) — the
    difference between feasible and not on a power-law graph. Wedge
    count for the clustering denominator is exact integer sum(C(d,2)).

    Partitioning is sized from the ACTUAL edge count (one scalar — the
    output needs n_edges anyway): the pair graph is orders of magnitude
    smaller than the basket fact it came from, and dragging the fact's
    partition count through five graph stages makes every downstream
    join scheduling-bound. 1M edges/partition keeps a billion-edge
    graph at ~1k partitions and a thousand-edge graph at one.
    """
    edges, deg, oriented, n_edges_val = _oriented_graph(spark, sf_dir)
    w1 = oriented.select("src", F.col("dst").alias("v"), F.col("ddeg").alias("dv"))
    w2 = oriented.select("src", F.col("dst").alias("w"), F.col("ddeg").alias("dw"))
    wedges = w1.join(w2, "src").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    summary = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / 2)
        .cast("bigint")
        .alias("n_wedges"),
    )
    return (
        summary.crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            F.lit(n_edges_val).cast("bigint").alias("n_edges"),
            "n_wedges",
            "n_triangles",
            F.round(
                (F.col("n_triangles") * 3).cast("double")
                / F.col("n_wedges").cast("double"),
                6,
            ).alias("global_clustering"),
        )
    )


def graph_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbor-Jaccard link scores for every edge of the basket graph.

    The classic link-prediction feature: for an existing edge (a, b),
    |N(a) ∩ N(b)| equals the number of triangles through that edge, so
    the score rides the SAME degree-oriented O(m^1.5) wedge-close join
    as graph_triangle_count (shared rolling_persist artifacts — one
    graph build serves both queries). Each closed triangle {x<y<z}
    explodes into its three canonical edges; a groupBy counts common
    neighbors per edge, a left join puts zero-common edges back, and
    the broadcast degree table finishes jaccard = t / (deg_a + deg_b
    - t) as integers with one double divide (ROUND 6). No stage ever
    touches the fact table or materializes neighbor sets.
    """
    edges, deg, oriented, _ = _oriented_graph(spark, sf_dir)
    w1 = oriented.select("src", F.col("dst").alias("v"), F.col("ddeg").alias("dv"))
    w2 = oriented.select("src", F.col("dst").alias("w"), F.col("ddeg").alias("dw"))
    wedges = w1.join(w2, "src").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select("src", "v", "w")
    tri_edges = tri.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("src", "v").alias("part_a"),
                    F.greatest("src", "v").alias("part_b"),
                ),
                F.struct(
                    F.least("src", "w").alias("part_a"),
                    F.greatest("src", "w").alias("part_b"),
                ),
                F.struct(
                    F.least("v", "w").alias("part_a"),
                    F.greatest("v", "w").alias("part_b"),
                ),
            )
        ).alias("e")
    ).select("e.part_a", "e.part_b")
    common = tri_edges.groupBy("part_a", "part_b").agg(
        F.count(F.lit(1)).alias("t")
    )
    da = F.broadcast(deg.select(F.col("node").alias("part_a"),
                                F.col("deg").alias("deg_a")))
    db = F.broadcast(deg.select(F.col("node").alias("part_b"),
                                F.col("deg").alias("deg_b")))
    scored = (
        edges.join(common, ["part_a", "part_b"], "left")
        .na.fill({"t": 0})
        .join(da, "part_a")
        .join(db, "part_b")
    )
    return scored.select(
        "part_a",
        "part_b",
        F.col("deg_a").cast("bigint").alias("deg_a"),
        F.col("deg_b").cast("bigint").alias("deg_b"),
        F.col("t").cast("bigint").alias("n_common"),
        F.round(
            F.col("t").cast("double")
            / (F.col("deg_a") + F.col("deg_b") - F.col("t")).cast("double"),
            6,
        ).alias("jaccard"),
    )


def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-front) of parts: minimize price, maximize size.

    A part is on the skyline iff no other part is at-most-equal price
    AND at-least-equal size with one strict. Instead of the O(n²)
    dominance self-join, dominance collapses to a sorted sweep: group
    parts by exact price (cents), take each price's max size, and run
    one cumulative max over the DISTINCT-PRICE table ordered by price.
    A part is dominated iff (a) some strictly-cheaper price reached
    its size (the running max before its price group), or (b) its own
    price group holds a strictly larger size. The global window runs
    on the distinct-price aggregate — dimension-sized, thousands of
    rows even when the part table has billions — then broadcasts back,
    so no fact-sized global sort exists anywhere in the plan.
    """
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_retailprice",
        "p_size",
        (dec2("p_retailprice") * 100).cast("bigint").alias("cents"),
    )
    per_price = parts.groupBy("cents").agg(F.max("p_size").alias("gmax"))
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    price_stats = per_price.select(
        "cents", "gmax", F.max("gmax").over(w).alias("run_max_before")
    )
    dominated = (
        F.coalesce(
            F.col("run_max_before") >= F.col("p_size"), F.lit(False)
        )
    ) | (F.col("gmax") > F.col("p_size"))
    return (
        parts.join(F.broadcast(price_stats), "cents")
        .filter(~dominated)
        .select("p_partkey", "p_retailprice", "p_size")
    )


def q_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ancestor closure of the part assembly tree by path doubling.

    Spark has no recursive CTE; the closure of the derived hierarchy
    (parent of part k is k div 10, root 0) is built by logarithmic
    path doubling — round r holds every (descendant, ancestor, depth)
    pair with depth <= 2^r, so a depth-D hierarchy needs ceil(log2 D)
    self-join rounds, not D. The round count derives from the actual
    max key (one scalar aggregate), the same bounded-unroll pattern as
    q_hierarchy_rollup. Each round is one equi-join shuffle on the
    seam node; pairs are unique in a tree so the dedup distinct
    carries no multiplicity blowup. The DuckDB oracle replays the
    closure with WITH RECURSIVE.
    """
    import math

    parts = load_table(spark, sf_dir, "part").select("p_partkey")
    edges = parts.filter(F.col("p_partkey") >= 1).select(
        F.col("p_partkey").alias("src"),
        F.expr("p_partkey div 10").alias("dst"),
        F.lit(1).cast("bigint").alias("depth"),
    )
    max_key = parts.agg(F.max("p_partkey")).collect()[0][0]  # scalar
    max_depth = len(str(max(int(max_key), 1)))
    rounds = max(1, math.ceil(math.log2(max_depth)))
    closure = rolling_persist(spark, ("tc_r0", sf_dir), edges)
    for r in range(rounds):
        left = closure.select(
            F.col("src"), F.col("dst").alias("mid"), F.col("depth").alias("d1")
        )
        right = closure.select(
            F.col("src").alias("mid"), F.col("dst"), F.col("depth").alias("d2")
        )
        extended = left.join(right, "mid").select(
            "src", "dst", (F.col("d1") + F.col("d2")).alias("depth")
        )
        closure = rolling_persist(
            spark,
            (f"tc_r{r + 1}", sf_dir),
            closure.unionByName(extended).distinct(),
        )
    return closure.select(
        F.col("src").alias("descendant"),
        F.col("dst").alias("ancestor"),
        "depth",
    )


def graph_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the basket co-occurrence graph.

    The general-purpose WCC entry point the LSH cluster former
    (dedup.py dedup_lsh_clusters) already uses internally, exposed
    over a relational edge set: alternating large-star/small-star
    contraction (Kiveris et al. 2014, functions/graph.py), converging
    in O(log^2 n) rounds regardless of component diameter — each round
    two groupBy-min shuffles on the edge list, never a per-node
    adjacency gather. Component id = the minimum part key in the
    component, so labels are engine-independent. The reference has no
    corpus-level graph view at all (city-directories.js emits objects
    row-at-a-time); this is the "which products form one co-purchase
    family" rollup a directory-scale warehouse asks for.

    Scale: the pair graph is orders of magnitude smaller than the
    lineitem fact it derives from (a-priori pruned, _basket_graph),
    and the star rounds touch only that edge list. At 100 TB the same
    plan holds — WCC cost tracks edges, not facts.
    """
    from etl_city_directories_spark.functions.memo import memo_df, table_stamp

    # the component labeling is an index artifact (like IVF cells /
    # LSH cluster labels): build once per data stamp, localCheckpoint
    # so repeated queries pay O(components), not the star rounds
    comp = memo_df(
        spark,
        ("wcc_basket", sf_dir, table_stamp(sf_dir, ("lineitem",))),
        lambda: connected_components(
            _oriented_graph(spark, sf_dir)[0], src="part_a", dst="part_b"
        ),
    )
    per_comp = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.max("node").alias("max_node"),
    )
    return per_comp.select(
        F.col("component").cast("bigint").alias("component"),
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("max_node").cast("bigint").alias("max_node"),
    ).orderBy("component")


QUERIES = {
    "q_market_basket": q_market_basket,
    "q_regr_trend": q_regr_trend,
    "q_pareto_abc": q_pareto_abc,
    "corpus_mix_epochs": corpus_mix_epochs,
    "q_rfm_segmentation": q_rfm_segmentation,
    "graph_triangle_count": graph_triangle_count,
    "graph_jaccard_neighbors": graph_jaccard_neighbors,
    "q_skyline_pareto": q_skyline_pareto,
    "q_transitive_closure": q_transitive_closure,
    "graph_wcc": graph_wcc,
}

ORACLES = {
    "q_market_basket": f"""
        WITH items AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        support AS (
          SELECT l_partkey, COUNT(*) AS n_item FROM items GROUP BY 1
        ),
        pruned AS (
          SELECT i.l_orderkey, i.l_partkey FROM items i
          JOIN support s ON s.l_partkey = i.l_partkey
          WHERE s.n_item >= {MIN_PAIR_ORDERS}
        ),
        pairs AS (
          SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                 COUNT(*) AS n_pair
          FROM pruned a
          JOIN pruned b ON a.l_orderkey = b.l_orderkey
                       AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2
          HAVING COUNT(*) >= {MIN_PAIR_ORDERS}
        ),
        tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items)
        SELECT p.part_a, p.part_b, p.n_pair,
               sa.n_item AS n_a, sb.n_item AS n_b,
               ROUND((p.n_pair * tot.n_orders)::DOUBLE
                     / (sa.n_item * sb.n_item)::DOUBLE, 6) AS lift
        FROM pairs p, tot
        JOIN support sa ON sa.l_partkey = p.part_a
        JOIN support sb ON sb.l_partkey = p.part_b
        ORDER BY p.n_pair DESC, p.part_a, p.part_b
        LIMIT {BASKET_TOP_K}
    """,
    "q_regr_trend": """
        WITH xy AS (
          SELECT c.c_mktsegment,
                 ((YEAR(o.o_orderdate) - 1995) * 12
                   + MONTH(o.o_orderdate) - 1)::BIGINT AS x,
                 CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT) AS y_cents
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ),
        s AS (
          SELECT c_mktsegment,
                 COUNT(*)::HUGEINT AS n,
                 SUM(x)::HUGEINT AS sx,
                 SUM(y_cents)::HUGEINT AS sy,
                 SUM(x * x)::HUGEINT AS sxx,
                 SUM(x::HUGEINT * y_cents) AS sxy,
                 MAX(x) AS x_max
          FROM xy GROUP BY 1
        )
        SELECT c_mktsegment,
               n::BIGINT AS n_orders,
               ROUND((n * sxy - sx * sy)::DOUBLE
                     / ((n * sxx - sx * sx) * 100)::DOUBLE, 6)
                 AS slope_per_month,
               ROUND((sy * sxx - sx * sxy)::DOUBLE
                     / ((n * sxx - sx * sx) * 100)::DOUBLE, 4)
                 AS intercept,
               ROUND((sy * sxx - sx * sxy
                       + (n * sxy - sx * sy) * (x_max + 1)::HUGEINT)::DOUBLE
                     / ((n * sxx - sx * sx) * 100)::DOUBLE, 4)
                 AS forecast_next_month
        FROM s ORDER BY c_mktsegment
    """,
    "q_pareto_abc": """
        WITH per_part AS (
          SELECT l_partkey,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
          FROM lineitem GROUP BY 1
        ),
        tot AS (SELECT SUM(rev) AS t FROM per_part),
        classed AS (
          SELECT l_partkey, rev,
                 CASE
                   WHEN SUM(rev) OVER (
                          ORDER BY rev DESC, l_partkey
                          ROWS UNBOUNDED PRECEDING) * 10 <= tot.t * 8
                     THEN 'A'
                   WHEN SUM(rev) OVER (
                          ORDER BY rev DESC, l_partkey
                          ROWS UNBOUNDED PRECEDING) * 20 <= tot.t * 19
                     THEN 'B'
                   ELSE 'C'
                 END AS abc_class
          FROM per_part, tot
        )
        SELECT abc_class,
               COUNT(*)::BIGINT AS n_parts,
               (SUM(rev))::DOUBLE AS class_revenue,
               ROUND(CAST(SUM(rev) AS DOUBLE)
                     / CAST(tot.t AS DOUBLE), 6) AS revenue_share
        FROM classed, tot
        GROUP BY abc_class, tot.t
        ORDER BY abc_class
    """,
    "corpus_mix_epochs": f"""
        WITH per_src AS (
          SELECT source, COUNT(*)::BIGINT AS n_docs,
                 SUM(n_chars)::BIGINT AS chars
          FROM documents GROUP BY 1
        ),
        tot AS (
          SELECT SUM(chars) AS total_chars, COUNT(*) AS n_sources
          FROM per_src
        )
        SELECT source, n_docs, chars,
               (LEAST({MIX_EPOCH_CAP}::HUGEINT * chars * n_sources,
                      total_chars::HUGEINT * {MIX_BUDGET_X})
                // n_sources)::BIGINT AS allocated_chars,
               ROUND(LEAST({MIX_EPOCH_CAP}::HUGEINT * chars * n_sources,
                           total_chars::HUGEINT * {MIX_BUDGET_X})::DOUBLE
                     / (chars * n_sources)::DOUBLE, 6) AS epochs,
               ({MIX_EPOCH_CAP}::HUGEINT * chars * n_sources
                 <= total_chars::HUGEINT * {MIX_BUDGET_X}) AS capped
        FROM per_src, tot
        ORDER BY source
    """,
}

ORACLES["q_rfm_segmentation"] = """
    WITH per_cust AS (
      SELECT o_custkey AS c_custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_order,
             COUNT(*)::BIGINT AS n_orders,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS spend_cents
      FROM orders GROUP BY 1
    ),
    anchor AS (SELECT MAX(last_order) AS a FROM per_cust),
    scored AS (
      SELECT c_custkey,
             DATEDIFF('day', last_order, anchor.a)::INTEGER AS recency_days,
             n_orders, spend_cents
      FROM per_cust, anchor
    )
    SELECT c_custkey, recency_days, n_orders,
           ROUND(spend_cents::DOUBLE / 100, 2) AS monetary,
           NTILE(5) OVER (ORDER BY recency_days ASC, c_custkey) AS r_score,
           NTILE(5) OVER (ORDER BY n_orders DESC, c_custkey) AS f_score,
           NTILE(5) OVER (ORDER BY spend_cents DESC, c_custkey) AS m_score,
           CONCAT(NTILE(5) OVER (ORDER BY recency_days ASC, c_custkey), '-',
                  NTILE(5) OVER (ORDER BY n_orders DESC, c_custkey), '-',
                  NTILE(5) OVER (ORDER BY spend_cents DESC, c_custkey))
             AS segment
    FROM scored ORDER BY c_custkey
"""

ORACLES["graph_triangle_count"] = f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_PAIR_ORDERS}
    ),
    deg AS (
      SELECT node, COUNT(*)::BIGINT AS d FROM (
        SELECT part_a AS node FROM pairs
        UNION ALL SELECT part_b FROM pairs) GROUP BY 1
    ),
    tri AS (
      SELECT COUNT(*)::BIGINT AS t
      FROM pairs e1
      JOIN pairs e2 ON e2.part_a = e1.part_b
      JOIN pairs e3 ON e3.part_a = e1.part_a AND e3.part_b = e2.part_b
    )
    SELECT (SELECT COUNT(*) FROM deg)::BIGINT AS n_nodes,
           (SELECT COUNT(*) FROM pairs)::BIGINT AS n_edges,
           (SELECT SUM(d * (d - 1)) // 2 FROM deg)::BIGINT AS n_wedges,
           tri.t AS n_triangles,
           ROUND((tri.t * 3)::DOUBLE
                 / (SELECT SUM(d * (d - 1)) // 2 FROM deg)::DOUBLE, 6)
             AS global_clustering
    FROM tri
"""

ORACLES["graph_jaccard_neighbors"] = f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_PAIR_ORDERS}
    ),
    deg AS (
      SELECT node, COUNT(*)::BIGINT AS d FROM (
        SELECT part_a AS node FROM pairs
        UNION ALL SELECT part_b FROM pairs) GROUP BY 1
    ),
    tri AS (
      SELECT e1.part_a AS x, e1.part_b AS y, e2.part_b AS z
      FROM pairs e1
      JOIN pairs e2 ON e2.part_a = e1.part_b
      JOIN pairs e3 ON e3.part_a = e1.part_a AND e3.part_b = e2.part_b
    ),
    per_edge AS (
      SELECT part_a, part_b, COUNT(*)::BIGINT AS t FROM (
        SELECT x AS part_a, y AS part_b FROM tri
        UNION ALL SELECT x, z FROM tri
        UNION ALL SELECT y, z FROM tri) GROUP BY 1, 2
    )
    SELECT p.part_a, p.part_b, da.d AS deg_a, db.d AS deg_b,
           COALESCE(pe.t, 0)::BIGINT AS n_common,
           ROUND(COALESCE(pe.t, 0)::DOUBLE
                 / (da.d + db.d - COALESCE(pe.t, 0))::DOUBLE, 6) AS jaccard
    FROM pairs p
    LEFT JOIN per_edge pe ON pe.part_a = p.part_a AND pe.part_b = p.part_b
    JOIN deg da ON da.node = p.part_a
    JOIN deg db ON db.node = p.part_b
"""

ORACLES["q_skyline_pareto"] = """
    SELECT p.p_partkey, p.p_retailprice, p.p_size
    FROM part p
    WHERE NOT EXISTS (
      SELECT 1 FROM part q
      WHERE CAST(q.p_retailprice AS DECIMAL(18,2))
              <= CAST(p.p_retailprice AS DECIMAL(18,2))
        AND q.p_size >= p.p_size
        AND (CAST(q.p_retailprice AS DECIMAL(18,2))
               < CAST(p.p_retailprice AS DECIMAL(18,2))
             OR q.p_size > p.p_size)
    )
"""

ORACLES["graph_wcc"] = f"""
    WITH RECURSIVE items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_PAIR_ORDERS}
    ),
    edges AS (
      SELECT part_a AS s, part_b AS d FROM pairs
      UNION
      SELECT part_b, part_a FROM pairs
    ),
    reach AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    full_reach AS (
      SELECT s, d FROM reach
      UNION
      SELECT DISTINCT s, s FROM edges
    ),
    comp AS (
      SELECT s AS node, MIN(d) AS component FROM full_reach GROUP BY s
    )
    SELECT component::BIGINT AS component,
           COUNT(*)::BIGINT AS n_nodes,
           MAX(node)::BIGINT AS max_node
    FROM comp GROUP BY 1 ORDER BY 1
"""

ORACLES["q_transitive_closure"] = """
    WITH RECURSIVE closure AS (
      SELECT p_partkey AS descendant, p_partkey // 10 AS ancestor,
             1::BIGINT AS depth
      FROM part WHERE p_partkey >= 1
      UNION ALL
      SELECT c.descendant, c.ancestor // 10, c.depth + 1
      FROM closure c WHERE c.ancestor >= 1
    )
    SELECT descendant, ancestor, depth FROM closure
"""


def q_decile_lift_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table: cumulative revenue share by customer decile.

    The model-eval readout scored campaigns live on: rank customers by
    exact-cent spend (custkey tiebreak), NTILE(10), then per decile
    the cumulative customer and revenue shares plus lift (share of
    revenue / share of customers). The fact collapses to one decimal
    row per customer FIRST — the global sort ranks O(customers), never
    orders — and the cumulative window runs over the 10-row decile
    rollup. Exact integer cents until the final share divides (ROUND
    6). Same dimension-sized-sort discipline as q_pareto_abc / RFM.
    """
    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum((dec2("o_totalprice") * 100).cast("long"))
        .cast("decimal(38,0)")
        .alias("cents")
    )
    w = Window.orderBy(F.desc("cents"), F.asc("o_custkey"))
    tiled = spend.select(
        "cents", F.ntile(10).over(w).alias("decile")
    )
    per_dec = tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("cents").alias("dec_cents"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    return (
        per_dec.select(
            "decile",
            F.col("n_customers").cast("bigint").alias("n_customers"),
            (F.col("dec_cents").cast("double") / 100).alias("dec_rev"),
            F.sum("n_customers").over(wc).alias("cum_cust"),
            F.sum("dec_cents").over(wc).alias("cum_cents"),
            F.sum("n_customers").over(wt).alias("tot_cust"),
            F.sum("dec_cents").over(wt).alias("tot_cents"),
        )
        .select(
            "decile",
            "n_customers",
            F.round("dec_rev", 2).alias("decile_revenue"),
            F.round(
                F.col("cum_cents").cast("double")
                / F.col("tot_cents").cast("double"),
                6,
            ).alias("cum_revenue_share"),
            F.round(
                (
                    F.col("cum_cents").cast("double")
                    / F.col("tot_cents").cast("double")
                )
                / (
                    F.col("cum_cust").cast("double")
                    / F.col("tot_cust").cast("double")
                ),
                6,
            ).alias("cum_lift"),
        )
        .orderBy("decile")
    )


QUERIES["q_decile_lift_curve"] = q_decile_lift_curve

ORACLES["q_decile_lift_curve"] = """
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               ::HUGEINT AS cents
      FROM orders GROUP BY 1
    ),
    tiled AS (
      SELECT cents,
             NTILE(10) OVER (ORDER BY cents DESC, o_custkey ASC) AS decile
      FROM spend
    ),
    per_dec AS (
      SELECT decile, COUNT(*) AS n_customers, SUM(cents) AS dec_cents
      FROM tiled GROUP BY 1
    )
    SELECT decile,
           n_customers::BIGINT AS n_customers,
           ROUND(dec_cents::DOUBLE / 100, 2) AS decile_revenue,
           ROUND(SUM(dec_cents) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE
                 / SUM(dec_cents) OVER ()::DOUBLE, 6) AS cum_revenue_share,
           ROUND((SUM(dec_cents) OVER (ORDER BY decile
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE
                  / SUM(dec_cents) OVER ()::DOUBLE)
                 / (SUM(n_customers) OVER (ORDER BY decile
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE
                    / SUM(n_customers) OVER ()::DOUBLE), 6) AS cum_lift
    FROM per_dec ORDER BY decile
"""


def q_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-last-ship latency distribution per order priority.

    The operations SLA readout: per order, days from order date to its
    LAST line shipment (the customer-visible completion), rolled up to
    exact latency percentiles per priority class. One lineitem
    collapse keyed on orderkey, one join to orders, one grid-sized
    percentile sort per priority — the fact tables are each read once.
    Exact integer day arithmetic; median/p90 via the same closed-form
    index rule both engines share (ordered row_number against
    ceil(q*n), no interpolation).
    """
    li = load_table(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("last_ship")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("od")
    )
    lat = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        F.datediff("last_ship", "od").cast("long").alias("days"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("days")
    ranked = lat.select(
        "o_orderpriority",
        "days",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority")).alias("n"),
    )
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.max("n").alias("n_orders"),
            F.min("days").alias("min_days"),
            F.max(
                F.when(F.col("rn") == F.ceil(F.col("n") / 2), F.col("days"))
            ).alias("median_days"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.col("n") * 9 / 10), F.col("days")
                )
            ).alias("p90_days"),
            F.max("days").alias("max_days"),
        )
        .select(
            "o_orderpriority",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            "min_days",
            "median_days",
            "p90_days",
            "max_days",
        )
        .orderBy("o_orderpriority")
    )


QUERIES["q_fulfillment_latency"] = q_fulfillment_latency

ORACLES["q_fulfillment_latency"] = """
    WITH li AS (
      SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS last_ship
      FROM lineitem GROUP BY 1
    ),
    lat AS (
      SELECT o.o_orderpriority,
             date_diff('day', CAST(o.o_orderdate AS DATE), li.last_ship)
               ::BIGINT AS days
      FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
    ),
    ranked AS (
      SELECT o_orderpriority, days,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderpriority ORDER BY days
             ) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM lat
    )
    SELECT o_orderpriority,
           MAX(n)::BIGINT AS n_orders,
           MIN(days)::BIGINT AS min_days,
           MAX(CASE WHEN rn = CEIL(n / 2.0) THEN days END)::BIGINT
             AS median_days,
           MAX(CASE WHEN rn = CEIL(n * 9 / 10.0) THEN days END)::BIGINT
             AS p90_days,
           MAX(days)::BIGINT AS max_days
    FROM ranked GROUP BY 1 ORDER BY 1
"""


def q_xyz_variability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XYZ demand-variability classes — the companion axis to ABC.

    Inventory planning's second dimension: per part, the coefficient
    of variation of monthly demand (X = steady CV < 0.5, Y =
    fluctuating < 1.0, Z = erratic). Monthly demand collapses map-side
    to exact integer (n, Σqty, Σqty²) per part over the months the
    part actually traded; CV = population sd / mean is one closed
    double expression; class edges are literal compares. Output is the
    per-class rollup (part counts + demand mass), O(parts) work after
    a single lineitem pass — join with q_pareto_abc for the classic
    9-cell ABC/XYZ planning matrix.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        ((F.year("l_shipdate")) * 12 + F.month("l_shipdate")).alias("m"),
        (dec2("l_quantity") * 100).cast("long").alias("cq"),
    )
    monthly = li.groupBy("l_partkey", "m").agg(
        F.sum("cq").cast("decimal(18,0)").alias("q")
    )
    suff = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_months"),
        F.sum("q").cast("decimal(38,0)").alias("s"),
        F.sum((F.col("q") * F.col("q")).cast("decimal(38,0)")).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n_months").cast("double")
    var_pop = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
        / F.col("n_months").cast("double")
    ) / F.col("n_months").cast("double")
    cv = F.sqrt(var_pop) / mean
    classed = suff.select(
        "l_partkey",
        "n_months",
        F.col("s").alias("demand"),
        F.when(cv < 0.5, "X").when(cv < 1.0, "Y").otherwise("Z").alias(
            "xyz_class"
        ),
    )
    return (
        classed.groupBy("xyz_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(
                F.avg(F.col("n_months").cast("double")), 4
            ).alias("avg_active_months"),
            F.round(F.sum("demand").cast("double") / 100, 2).alias(
                "total_demand"
            ),
        )
        .orderBy("xyz_class")
    )


QUERIES["q_xyz_variability"] = q_xyz_variability

ORACLES["q_xyz_variability"] = """
    WITH monthly AS (
      SELECT l_partkey,
             YEAR(CAST(l_shipdate AS DATE)) * 12
               + MONTH(CAST(l_shipdate AS DATE)) AS m,
             SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
               ::HUGEINT AS q
      FROM lineitem GROUP BY 1, 2
    ),
    suff AS (
      SELECT l_partkey, COUNT(*) AS n_months,
             SUM(q) AS s, SUM(q * q) AS ss
      FROM monthly GROUP BY 1
    ),
    classed AS (
      SELECT l_partkey, n_months, s AS demand,
             CASE WHEN sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE
                             / n_months::DOUBLE) / n_months::DOUBLE)
                       / (s::DOUBLE / n_months::DOUBLE) < 0.5 THEN 'X'
                  WHEN sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE
                             / n_months::DOUBLE) / n_months::DOUBLE)
                       / (s::DOUBLE / n_months::DOUBLE) < 1.0 THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM suff
    )
    SELECT xyz_class,
           COUNT(*)::BIGINT AS n_parts,
           ROUND(AVG(n_months::DOUBLE), 4) AS avg_active_months,
           ROUND(SUM(demand)::DOUBLE / 100, 2) AS total_demand
    FROM classed GROUP BY 1 ORDER BY 1
"""


def q_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per market segment.

    The board-deck query: yearly exact-cent revenue per segment, LAG
    one year on the (segments × years)-sized rollup, growth = one
    double divide (ROUND 6, NULL for the first year — no fabricated
    zero). The fact pass is one map-side-combined shuffle; the window
    runs over dozens of rows.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", F.year("o_orderdate").alias("yr")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    yearly = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "yr")
        .agg(
            F.sum((dec2("o_totalprice") * 100).cast("long"))
            .cast("decimal(38,0)")
            .alias("cents")
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy("yr")
    with_prev = yearly.select(
        "c_mktsegment",
        "yr",
        "cents",
        F.lag("cents").over(w).alias("prev"),
    )
    return with_prev.select(
        "c_mktsegment",
        F.col("yr").cast("bigint").alias("yr"),
        F.round(F.col("cents").cast("double") / 100, 2).alias("revenue"),
        F.round(
            (F.col("cents") - F.col("prev")).cast("double")
            / F.col("prev").cast("double"),
            6,
        ).alias("yoy_growth"),
    ).orderBy("c_mktsegment", "yr")


QUERIES["q_yoy_growth"] = q_yoy_growth

ORACLES["q_yoy_growth"] = """
    WITH yearly AS (
      SELECT c.c_mktsegment, YEAR(CAST(o.o_orderdate AS DATE)) AS yr,
             SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                      AS BIGINT))::HUGEINT AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    )
    SELECT c_mktsegment, yr::BIGINT AS yr,
           ROUND(cents::DOUBLE / 100, 2) AS revenue,
           ROUND((cents - LAG(cents) OVER (
                    PARTITION BY c_mktsegment ORDER BY yr))::DOUBLE
                 / LAG(cents) OVER (
                    PARTITION BY c_mktsegment ORDER BY yr)::DOUBLE, 6)
             AS yoy_growth
    FROM yearly ORDER BY c_mktsegment, yr
"""


def graph_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the basket graph + heavy-tail slope.

    The first diagnostic on any production graph: the (degree, node
    count) histogram — reusing the memoized degree table the triangle
    and Jaccard queries built, so this costs one O(nodes) rollup —
    with each degree bucket's share and the cumulative share from the
    hub side (the "what fraction of nodes have degree ≥ d" curve
    planners size salting and orientation strategies from). Exact
    integers until the ROUND 6 shares.
    """
    _, deg, _, _ = _oriented_graph(spark, sf_dir)
    hist = deg.groupBy("deg").agg(F.count(F.lit(1)).alias("n_nodes"))
    wt = Window.partitionBy()
    wcum = Window.orderBy(F.desc("deg")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        hist.select(
            F.col("deg").cast("bigint").alias("degree"),
            F.col("n_nodes").cast("bigint").alias("n_nodes"),
            F.round(
                F.col("n_nodes").cast("double")
                / F.sum("n_nodes").over(wt).cast("double"),
                6,
            ).alias("share"),
            F.round(
                F.sum("n_nodes").over(wcum).cast("double")
                / F.sum("n_nodes").over(wt).cast("double"),
                6,
            ).alias("cum_share_from_top"),
        )
        .orderBy(F.desc("degree"))
    )


QUERIES["graph_degree_distribution"] = graph_degree_distribution

ORACLES["graph_degree_distribution"] = f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_PAIR_ORDERS}
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT part_a AS node FROM pairs
        UNION ALL SELECT part_b FROM pairs) GROUP BY 1
    ),
    hist AS (
      SELECT d AS degree, COUNT(*) AS n_nodes FROM deg GROUP BY 1
    )
    SELECT degree::BIGINT AS degree, n_nodes::BIGINT AS n_nodes,
           ROUND(n_nodes::DOUBLE / SUM(n_nodes) OVER ()::DOUBLE, 6) AS share,
           ROUND(SUM(n_nodes) OVER (ORDER BY degree DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::DOUBLE
                 / SUM(n_nodes) OVER ()::DOUBLE, 6) AS cum_share_from_top
    FROM hist ORDER BY degree DESC
"""


FUNNEL_PCT_STEPS = ("signup_to_click", "click_to_purchase")


def q_funnel_time_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution between funnel stages.

    q_funnel counts who converts; this measures HOW LONG conversion
    takes — the metric latency SLOs for onboarding funnels are set
    on. Reuses the funnel's single-shuffle chained-window timestamps
    (first signup → first later click → first later purchase), then
    per stage-gap the exact min/median/p90/max in seconds via the
    shared row_number-vs-ceil(q·n) closed form. Output is one row per
    stage transition; everything after the per-user collapse is
    O(converting users) narrow rows.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    w = Window.partitionBy("user_id")
    staged = (
        events.withColumn(
            "signup_us",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts_us"))).over(w),
        )
        .withColumn(
            "click_us",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts_us") > F.col("signup_us")),
                    F.col("ts_us"),
                )
            ).over(w),
        )
        .withColumn(
            "purchase_us",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") > F.col("click_us")),
                    F.col("ts_us"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("signup_us").alias("s"),
        F.first("click_us").alias("c"),
        F.first("purchase_us").alias("p"),
    )
    # r10 (guide §1.2 don't compute twice): the 2-branch union embedded
    # the staged window chain + per-user aggregate TWICE; one explode
    # of a 2-struct array yields the identical row multiset with the
    # subtree appearing once.
    gaps = (
        per_user.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("signup_to_click").alias("step"),
                        ((F.col("c") - F.col("s")) / 1_000_000)
                        .cast("long")
                        .alias("secs"),
                    ),
                    F.struct(
                        F.lit("click_to_purchase").alias("step"),
                        ((F.col("p") - F.col("c")) / 1_000_000)
                        .cast("long")
                        .alias("secs"),
                    ),
                )
            ).alias("g")
        )
        .select("g.step", "g.secs")
        .filter(F.col("secs").isNotNull())
    )
    wr = Window.partitionBy("step").orderBy("secs")
    wn = Window.partitionBy("step")
    ranked = gaps.select(
        "step",
        "secs",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        ranked.groupBy("step")
        .agg(
            F.max("n").cast("bigint").alias("n_users"),
            F.min("secs").alias("min_s"),
            F.max(
                F.when(F.col("rn") == F.ceil(F.col("n") / 2), F.col("secs"))
            ).alias("median_s"),
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.col("n") * 9 / 10), F.col("secs")
                )
            ).alias("p90_s"),
            F.max("secs").alias("max_s"),
        )
        .orderBy("step")
    )


QUERIES["q_funnel_time_percentiles"] = q_funnel_time_percentiles

ORACLES["q_funnel_time_percentiles"] = """
    WITH staged AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS s
      FROM events GROUP BY 1
    ),
    with_c AS (
      SELECT st.user_id, st.s,
             MIN(CASE WHEN e.event_type = 'click'
                       AND epoch_us(e.ts) > st.s
                      THEN epoch_us(e.ts) END) AS c
      FROM staged st JOIN events e ON e.user_id = st.user_id
      GROUP BY 1, 2
    ),
    with_p AS (
      SELECT wc.user_id, wc.s, wc.c,
             MIN(CASE WHEN e.event_type = 'purchase'
                       AND epoch_us(e.ts) > wc.c
                      THEN epoch_us(e.ts) END) AS p
      FROM with_c wc JOIN events e ON e.user_id = wc.user_id
      GROUP BY 1, 2, 3
    ),
    gaps AS (
      SELECT 'signup_to_click' AS step, (c - s) // 1000000 AS secs
      FROM with_p WHERE c IS NOT NULL AND s IS NOT NULL
      UNION ALL
      SELECT 'click_to_purchase', (p - c) // 1000000
      FROM with_p WHERE p IS NOT NULL AND c IS NOT NULL
    ),
    ranked AS (
      SELECT step, secs,
             ROW_NUMBER() OVER (PARTITION BY step ORDER BY secs) AS rn,
             COUNT(*) OVER (PARTITION BY step) AS n
      FROM gaps
    )
    SELECT step,
           MAX(n)::BIGINT AS n_users,
           MIN(secs)::BIGINT AS min_s,
           MAX(CASE WHEN rn = CEIL(n / 2.0) THEN secs END)::BIGINT
             AS median_s,
           MAX(CASE WHEN rn = CEIL(n * 9 / 10.0) THEN secs END)::BIGINT
             AS p90_s,
           MAX(secs)::BIGINT AS max_s
    FROM ranked GROUP BY 1 ORDER BY 1
"""


TOP_MOVERS_K = 10


def q_top_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top parts by absolute month-over-month demand swing.

    The anomaly triage list demand planners open every morning: per
    part, monthly quantity (exact centi-units), LAG to the previous
    ACTIVE month, rank by |Δ| with full integer tiebreaks (|Δ| desc,
    part asc, month asc), keep the top 10. The fact collapses to the
    O(parts × months) grid in one map-side pass; the global top-K is
    a TakeOrdered over integer keys — no double enters the ordering.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("m"),
        (dec2("l_quantity") * 100).cast("long").alias("cq"),
    )
    monthly = li.groupBy("l_partkey", "m").agg(F.sum("cq").alias("q"))
    w = Window.partitionBy("l_partkey").orderBy("m")
    delta = monthly.select(
        "l_partkey",
        "m",
        "q",
        F.lag("q").over(w).alias("prev_q"),
        F.lag("m").over(w).alias("prev_m"),
    ).filter(F.col("prev_q").isNotNull())
    return (
        delta.select(
            "l_partkey",
            F.col("m").cast("bigint").alias("month_idx"),
            F.col("prev_m").cast("bigint").alias("prev_month_idx"),
            (F.col("q").cast("double") / 100).alias("qty"),
            (F.col("prev_q").cast("double") / 100).alias("prev_qty"),
            ((F.col("q") - F.col("prev_q")).cast("double") / 100).alias(
                "delta_qty"
            ),
            F.abs(F.col("q") - F.col("prev_q")).alias("abs_c"),
        )
        .orderBy(F.desc("abs_c"), F.asc("l_partkey"), F.asc("month_idx"))
        .limit(TOP_MOVERS_K)
        .select(
            "l_partkey",
            "month_idx",
            "prev_month_idx",
            F.round("qty", 2).alias("qty"),
            F.round("prev_qty", 2).alias("prev_qty"),
            F.round("delta_qty", 2).alias("delta_qty"),
        )
    )


QUERIES["q_top_movers"] = q_top_movers

ORACLES["q_top_movers"] = f"""
    WITH monthly AS (
      SELECT l_partkey,
             YEAR(CAST(l_shipdate AS DATE)) * 12
               + MONTH(CAST(l_shipdate AS DATE)) AS m,
             SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    delta AS (
      SELECT l_partkey, m, q,
             LAG(q) OVER (PARTITION BY l_partkey ORDER BY m) AS prev_q,
             LAG(m) OVER (PARTITION BY l_partkey ORDER BY m) AS prev_m
      FROM monthly QUALIFY prev_q IS NOT NULL
    )
    SELECT l_partkey, m::BIGINT AS month_idx, prev_m::BIGINT AS prev_month_idx,
           ROUND(q::DOUBLE / 100, 2) AS qty,
           ROUND(prev_q::DOUBLE / 100, 2) AS prev_qty,
           ROUND((q - prev_q)::DOUBLE / 100, 2) AS delta_qty
    FROM delta
    ORDER BY abs(q - prev_q) DESC, l_partkey ASC, m ASC
    LIMIT {TOP_MOVERS_K}
"""


def q_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer spend-tier migration matrix between the two data halves.

    The churn-and-upgrade view a CRM plans campaigns from: quintile
    customers by exact-cent spend WITHIN each time half (orders split
    at the median order date), then count the 5×5 tier transitions —
    plus 'new'/'lapsed' rows for customers active in only one half.
    Both NTILEs order (spend desc, custkey) so tile edges are
    bit-stable; the matrix is a dimension-sized rollup after two
    per-customer collapses.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", F.to_date("o_orderdate").alias("od")
    )
    split = orders.agg(
        F.date_add(F.min("od"), (F.datediff(F.max("od"), F.min("od")) / 2).cast("int")).alias("mid")
    )
    tagged = orders.crossJoin(F.broadcast(split)).select(
        "o_custkey",
        (F.col("od") > F.col("mid")).alias("is_h2"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    per = tagged.groupBy("o_custkey", "is_h2").agg(
        F.sum("cents").alias("spend")
    )
    w = Window.partitionBy("is_h2").orderBy(F.desc("spend"), F.asc("o_custkey"))
    tiered = per.select(
        "o_custkey", "is_h2", F.ntile(5).over(w).alias("tier")
    )
    h1 = tiered.filter(~F.col("is_h2")).select(
        "o_custkey", F.col("tier").alias("tier_h1")
    )
    h2 = tiered.filter(F.col("is_h2")).select(
        "o_custkey", F.col("tier").alias("tier_h2")
    )
    joined = h1.join(h2, "o_custkey", "full").select(
        F.coalesce(F.col("tier_h1").cast("string"), F.lit("new")).alias(
            "from_tier"
        ),
        F.coalesce(F.col("tier_h2").cast("string"), F.lit("lapsed")).alias(
            "to_tier"
        ),
    )
    wt = Window.partitionBy("from_tier")
    return (
        joined.groupBy("from_tier", "to_tier")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            "from_tier",
            "to_tier",
            F.col("n_customers").cast("bigint").alias("n_customers"),
            F.round(
                F.col("n_customers").cast("double")
                / F.sum("n_customers").over(wt).cast("double"),
                6,
            ).alias("row_share"),
        )
        .orderBy("from_tier", "to_tier")
    )


QUERIES["q_segment_migration"] = q_segment_migration

ORACLES["q_segment_migration"] = """
    WITH bounds AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
             MAX(CAST(o_orderdate AS DATE)) AS hi
      FROM orders
    ),
    tagged AS (
      SELECT o_custkey,
             CAST(o.o_orderdate AS DATE) >
               (b.lo + CAST(date_diff('day', b.lo, b.hi) // 2 AS INT))
               AS is_h2,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders o, bounds b
    ),
    per AS (
      SELECT o_custkey, is_h2, SUM(cents) AS spend
      FROM tagged GROUP BY 1, 2
    ),
    tiered AS (
      SELECT o_custkey, is_h2,
             NTILE(5) OVER (PARTITION BY is_h2
                            ORDER BY spend DESC, o_custkey) AS tier
      FROM per
    ),
    joined AS (
      SELECT COALESCE(CAST(h1.tier AS VARCHAR), 'new') AS from_tier,
             COALESCE(CAST(h2.tier AS VARCHAR), 'lapsed') AS to_tier
      FROM (SELECT o_custkey, tier FROM tiered WHERE NOT is_h2) h1
      FULL JOIN (SELECT o_custkey, tier FROM tiered WHERE is_h2) h2
        USING (o_custkey)
    )
    SELECT from_tier, to_tier, COUNT(*)::BIGINT AS n_customers,
           ROUND(COUNT(*)::DOUBLE
                 / SUM(COUNT(*)) OVER (PARTITION BY from_tier)::DOUBLE, 6)
             AS row_share
    FROM joined GROUP BY 1, 2 ORDER BY 1, 2
"""


def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the basket graph (Newman 2002).

    Do hubs connect to hubs (r > 0, social-network-like) or to leaves
    (r < 0, hub-and-spoke)? The Pearson correlation of endpoint
    degrees over every edge counted in BOTH directions — computed
    from five exact integer sums over the memoized (edges ⋈ degree)
    view, one closed-form double at the end. Decides whether skew
    mitigation should target a few hubs (disassortative) or whole
    hub communities (assortative). O(edges) map-side work.
    """
    edges, deg, _, _ = _oriented_graph(spark, sf_dir)
    da = F.broadcast(
        deg.select(F.col("node").alias("part_a"), F.col("deg").alias("dx"))
    )
    db = F.broadcast(
        deg.select(F.col("node").alias("part_b"), F.col("deg").alias("dy"))
    )
    both = edges.join(da, "part_a").join(db, "part_b")
    # symmetric view: every undirected edge contributes (dx,dy), (dy,dx)
    sym = both.select("dx", "dy").unionAll(
        both.select(F.col("dy").alias("dx"), F.col("dx").alias("dy"))
    )
    d38 = "decimal(38,0)"
    suff = sym.agg(
        F.count(F.lit(1)).alias("m2"),
        F.sum(F.col("dx").cast(d38)).alias("sx"),
        F.sum(F.col("dy").cast(d38)).alias("sy"),
        F.sum((F.col("dx").cast(d38) * F.col("dy")).cast(d38)).alias("sxy"),
        F.sum((F.col("dx").cast(d38) * F.col("dx")).cast(d38)).alias("sxx"),
        F.sum((F.col("dy").cast(d38) * F.col("dy")).cast(d38)).alias("syy"),
    )
    num = (
        "CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)"
    )
    den = (
        "sqrt(CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        " * sqrt(CAST(m2 AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))"
    )
    return suff.selectExpr(
        "CAST(m2 div 2 AS BIGINT) AS n_edges",
        f"ROUND(({num}) / ({den}), 6) AS assortativity",
    )


QUERIES["graph_assortativity"] = graph_assortativity

ORACLES["graph_assortativity"] = f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_PAIR_ORDERS}
    ),
    deg AS (
      SELECT node, COUNT(*)::BIGINT AS d FROM (
        SELECT part_a AS node FROM pairs
        UNION ALL SELECT part_b FROM pairs) GROUP BY 1
    ),
    sym AS (
      SELECT da.d AS dx, db.d AS dy
      FROM pairs p JOIN deg da ON da.node = p.part_a
                   JOIN deg db ON db.node = p.part_b
      UNION ALL
      SELECT db.d, da.d
      FROM pairs p JOIN deg da ON da.node = p.part_a
                   JOIN deg db ON db.node = p.part_b
    ),
    suff AS (
      SELECT COUNT(*) AS m2,
             SUM(dx)::HUGEINT AS sx, SUM(dy)::HUGEINT AS sy,
             SUM(dx::HUGEINT * dy) AS sxy,
             SUM(dx::HUGEINT * dx) AS sxx,
             SUM(dy::HUGEINT * dy) AS syy
      FROM sym
    )
    SELECT CAST(m2 // 2 AS BIGINT) AS n_edges,
           ROUND((CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(m2 AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS assortativity
    FROM suff
"""


def q_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 9-cell ABC×XYZ inventory planning matrix.

    Composes the two classification axes this module already computes
    — revenue importance (ABC, exact cross-multiplied cumulative
    boundaries) and demand variability (XYZ, exact CV) — into the
    grid every stocking policy is written against (AX = automate,
    CZ = discontinue). Both classifications re-derive from their
    per-part collapses (each one map-side pass over lineitem; Catalyst
    reuses the scan), joined on partkey, rolled up to at most 9 rows
    with part counts and revenue mass.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount", "l_quantity", "l_shipdate"
    )
    one = F.lit(1).cast("decimal(18,2)")
    revenue = dec2("l_extendedprice") * (one - dec2("l_discount"))
    per_part = li.groupBy("l_partkey").agg(F.sum(revenue).alias("rev"))
    w = Window.orderBy(F.desc("rev"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = per_part.agg(F.sum("rev").alias("t"))
    abc = (
        per_part.withColumn("cum", F.sum("rev").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "l_partkey",
            "rev",
            F.when(F.col("cum") * 10 <= F.col("t") * 8, "A")
            .when(F.col("cum") * 20 <= F.col("t") * 19, "B")
            .otherwise("C")
            .alias("abc_class"),
        )
    )
    monthly = li.groupBy(
        "l_partkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("m"),
    ).agg((F.sum(dec2("l_quantity")) * 100).cast("decimal(18,0)").alias("q"))
    suff = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("nm"),
        F.sum("q").cast("decimal(38,0)").alias("s"),
        F.sum((F.col("q") * F.col("q")).cast("decimal(38,0)")).alias("ss"),
    )
    cv = F.sqrt(
        (
            F.col("ss").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("nm").cast("double")
        )
        / F.col("nm").cast("double")
    ) / (F.col("s").cast("double") / F.col("nm").cast("double"))
    xyz = suff.select(
        "l_partkey",
        F.when(cv < 0.5, "X").when(cv < 1.0, "Y").otherwise("Z").alias(
            "xyz_class"
        ),
    )
    cells = abc.join(xyz, "l_partkey")
    wt = Window.partitionBy()
    return (
        cells.groupBy("abc_class", "xyz_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev").alias("rev_dec"),
        )
        .select(
            "abc_class",
            "xyz_class",
            F.col("n_parts").cast("bigint").alias("n_parts"),
            F.round(
                F.col("rev_dec").cast("double")
                / F.sum("rev_dec").over(wt).cast("double"),
                6,
            ).alias("revenue_share"),
        )
        .orderBy("abc_class", "xyz_class")
    )


QUERIES["q_abc_xyz_matrix"] = q_abc_xyz_matrix

ORACLES["q_abc_xyz_matrix"] = """
    WITH per_part AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT SUM(rev) AS t FROM per_part),
    abc AS (
      SELECT l_partkey, rev,
             CASE
               WHEN SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                                   ROWS UNBOUNDED PRECEDING) * 10
                    <= tot.t * 8 THEN 'A'
               WHEN SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                                   ROWS UNBOUNDED PRECEDING) * 20
                    <= tot.t * 19 THEN 'B'
               ELSE 'C'
             END AS abc_class
      FROM per_part, tot
    ),
    monthly AS (
      SELECT l_partkey,
             YEAR(CAST(l_shipdate AS DATE)) * 12
               + MONTH(CAST(l_shipdate AS DATE)) AS m,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100
                  AS DECIMAL(18,0)) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    suff AS (
      SELECT l_partkey, COUNT(*) AS nm,
             SUM(q)::HUGEINT AS s, SUM(q::HUGEINT * q::HUGEINT) AS ss
      FROM monthly GROUP BY 1
    ),
    xyz AS (
      SELECT l_partkey,
             CASE WHEN sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE / nm::DOUBLE)
                            / nm::DOUBLE)
                       / (s::DOUBLE / nm::DOUBLE) < 0.5 THEN 'X'
                  WHEN sqrt((ss::DOUBLE - s::DOUBLE * s::DOUBLE / nm::DOUBLE)
                            / nm::DOUBLE)
                       / (s::DOUBLE / nm::DOUBLE) < 1.0 THEN 'Y'
                  ELSE 'Z' END AS xyz_class
      FROM suff
    )
    SELECT a.abc_class, x.xyz_class,
           COUNT(*)::BIGINT AS n_parts,
           ROUND((SUM(a.rev))::DOUBLE / (SUM(SUM(a.rev)) OVER ())::DOUBLE, 6)
             AS revenue_share
    FROM abc a JOIN xyz x USING (l_partkey)
    GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SaaS-style revenue growth accounting between the two data halves.

    The board-level bridge from last period's revenue to this
    period's: every customer classifies as new / churned / expanded /
    contracted / flat by comparing exact-cent spend across the halves
    (orders split at the median order date), and each class reports
    both customer counts and the SIGNED revenue delta it contributes.
    The identity Σ deltas = H2 − H1 total is exact by construction —
    two per-customer collapses, one full join, O(classes) output.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", F.to_date("o_orderdate").alias("od")
    )
    split = orders.agg(
        F.date_add(
            F.min("od"), (F.datediff(F.max("od"), F.min("od")) / 2).cast("int")
        ).alias("mid")
    )
    tagged = orders.crossJoin(F.broadcast(split)).select(
        "o_custkey",
        (F.col("od") > F.col("mid")).alias("is_h2"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    per = tagged.groupBy("o_custkey").agg(
        F.sum(F.when(~F.col("is_h2"), F.col("cents")).otherwise(0)).alias("h1"),
        F.sum(F.when(F.col("is_h2"), F.col("cents")).otherwise(0)).alias("h2"),
    )
    klass = (
        F.when((F.col("h1") == 0) & (F.col("h2") > 0), "new")
        .when((F.col("h1") > 0) & (F.col("h2") == 0), "churned")
        .when(F.col("h2") > F.col("h1"), "expanded")
        .when(F.col("h2") < F.col("h1"), "contracted")
        .otherwise("flat")
    )
    return (
        per.select(
            klass.alias("class"), "h1", "h2", (F.col("h2") - F.col("h1")).alias("delta")
        )
        .groupBy("class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(F.sum("h1").cast("double") / 100, 2).alias("h1_revenue"),
            F.round(F.sum("h2").cast("double") / 100, 2).alias("h2_revenue"),
            F.round(F.sum("delta").cast("double") / 100, 2).alias(
                "revenue_delta"
            ),
        )
        .orderBy("class")
    )


QUERIES["q_growth_accounting"] = q_growth_accounting

ORACLES["q_growth_accounting"] = """
    WITH bounds AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
             MAX(CAST(o_orderdate AS DATE)) AS hi
      FROM orders
    ),
    tagged AS (
      SELECT o_custkey,
             CAST(o.o_orderdate AS DATE) >
               (b.lo + CAST(date_diff('day', b.lo, b.hi) // 2 AS INT))
               AS is_h2,
             CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders o, bounds b
    ),
    per AS (
      SELECT o_custkey,
             SUM(CASE WHEN NOT is_h2 THEN cents ELSE 0 END) AS h1,
             SUM(CASE WHEN is_h2 THEN cents ELSE 0 END) AS h2
      FROM tagged GROUP BY 1
    ),
    classed AS (
      SELECT CASE
               WHEN h1 = 0 AND h2 > 0 THEN 'new'
               WHEN h1 > 0 AND h2 = 0 THEN 'churned'
               WHEN h2 > h1 THEN 'expanded'
               WHEN h2 < h1 THEN 'contracted'
               ELSE 'flat'
             END AS class,
             h1, h2, h2 - h1 AS delta
      FROM per
    )
    SELECT class, COUNT(*)::BIGINT AS n_customers,
           ROUND(SUM(h1)::DOUBLE / 100, 2) AS h1_revenue,
           ROUND(SUM(h2)::DOUBLE / 100, 2) AS h2_revenue,
           ROUND(SUM(delta)::DOUBLE / 100, 2) AS revenue_delta
    FROM classed GROUP BY 1 ORDER BY 1
"""


STICKY_WINDOW_DAYS = 7


def q_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-WAU stickiness per day — the product-health ratio.

    Exact rolling distinct users: the (user, day) distinct activity
    table joins the day spine against itself within the trailing
    7-day band (band fan-out is a constant 7 per activity row, keyed
    on the day grid — never a corpus self-join), counts distinct
    users per anchor day, and divides DAU by WAU (ROUND 4). Only days
    with a full trailing window emit, so the ratio is never inflated
    by a short window.
    """
    events = load_table(spark, sf_dir, "events")
    act = events.select(
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day"),
    ).distinct()
    dau = act.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    # each activity row registers into the 7 anchor days it supports
    anchors = act.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + STICKY_WINDOW_DAYS - 1)
        ).alias("anchor"),
    )
    wau = (
        anchors.groupBy("anchor")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(F.col("anchor").alias("day"), "wau")
    )
    lo_hi = act.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    )
    return (
        dau.join(wau, "day")
        .crossJoin(F.broadcast(lo_hi))
        .filter(F.col("day") >= F.col("lo") + STICKY_WINDOW_DAYS - 1)
        .filter(F.col("day") <= F.col("hi"))
        .select(
            F.col("day").cast("bigint").alias("epoch_day"),
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            F.round(
                F.col("dau").cast("double") / F.col("wau").cast("double"), 4
            ).alias("stickiness"),
        )
        .orderBy("epoch_day")
    )


QUERIES["q_dau_wau_stickiness"] = q_dau_wau_stickiness

ORACLES["q_dau_wau_stickiness"] = f"""
    WITH act AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
      FROM events
    ),
    dau AS (
      SELECT day, COUNT(DISTINCT user_id) AS dau FROM act GROUP BY 1
    ),
    anchors AS (
      SELECT user_id, day + o.o AS anchor
      FROM act, LATERAL unnest(generate_series(0,
                    {STICKY_WINDOW_DAYS - 1})) AS o(o)
    ),
    wau AS (
      SELECT anchor AS day, COUNT(DISTINCT user_id) AS wau
      FROM anchors GROUP BY 1
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM act)
    SELECT d.day::BIGINT AS epoch_day,
           d.dau::BIGINT AS dau,
           w.wau::BIGINT AS wau,
           ROUND(d.dau::DOUBLE / w.wau::DOUBLE, 4) AS stickiness
    FROM dau d JOIN wau w USING (day), bounds b
    WHERE d.day >= b.lo + {STICKY_WINDOW_DAYS - 1} AND d.day <= b.hi
    ORDER BY epoch_day
"""


def q_did_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: PROMO parts vs the rest across halves.

    The workhorse causal readout when there's no experiment: treated =
    PROMO-type parts, control = everything else, periods = lineitem
    ship-date halves. Revenue collapses to the exact-decimal 2×2
    (group × period) grid map-side — the whole DiD then runs on four
    numbers: did = (T2 − T1) − (C2 − C1), reported absolute and
    relative to the counterfactual T1 + (C2 − C1). One broadcast dim
    join + one fact pass at any scale.
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("treated")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.to_date("l_shipdate").alias("sd"),
        "l_extendedprice",
        "l_discount",
    )
    split = li.agg(
        F.date_add(
            F.min("sd"), (F.datediff(F.max("sd"), F.min("sd")) / 2).cast("int")
        ).alias("mid")
    )
    one = F.lit(1).cast("decimal(18,2)")
    rev = dec2("l_extendedprice") * (one - dec2("l_discount"))
    grid = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .crossJoin(F.broadcast(split))
        .groupBy("treated", (F.col("sd") > F.col("mid")).alias("is_h2"))
        .agg(F.sum(rev).cast("decimal(38,6)").alias("r"))
    )
    # fold the 4-cell grid via conditional sums
    folded = grid.agg(
        F.sum(F.when(F.col("treated") & ~F.col("is_h2"), F.col("r"))).alias("t1"),
        F.sum(F.when(F.col("treated") & F.col("is_h2"), F.col("r"))).alias("t2"),
        F.sum(F.when(~F.col("treated") & ~F.col("is_h2"), F.col("r"))).alias("c1"),
        F.sum(F.when(~F.col("treated") & F.col("is_h2"), F.col("r"))).alias("c2"),
    )
    # Round IN DECIMAL, cast to double after: the 4-cell values are
    # exact DECIMAL(38,6), and decimal ROUND is exact half-away-from-
    # zero in BOTH engines — whereas double ROUND diverges on exact
    # negative binary ties (the q_promo_uplift_matching att_dollars
    # lesson; did_abs is the negative-capable column here). did_rel is
    # a double quotient whose 6-dp ties aren't exactly representable —
    # left on the double path.
    return folded.selectExpr(
        "CAST(ROUND(t1, 2) AS DOUBLE) AS treated_h1",
        "CAST(ROUND(t2, 2) AS DOUBLE) AS treated_h2",
        "CAST(ROUND(c1, 2) AS DOUBLE) AS control_h1",
        "CAST(ROUND(c2, 2) AS DOUBLE) AS control_h2",
        "CAST(ROUND((t2 - t1) - (c2 - c1), 2) AS DOUBLE) AS did_abs",
        "ROUND((CAST(t2 - t1 AS DOUBLE) - CAST(c2 - c1 AS DOUBLE))"
        " / (CAST(t1 AS DOUBLE) + CAST(c2 - c1 AS DOUBLE)), 6) AS did_rel",
    )


QUERIES["q_did_promo"] = q_did_promo

ORACLES["q_did_promo"] = """
    WITH bounds AS (
      SELECT MIN(CAST(l_shipdate AS DATE)) AS lo,
             MAX(CAST(l_shipdate AS DATE)) AS hi
      FROM lineitem
    ),
    grid AS (
      SELECT p.p_type = 'PROMO' AS treated,
             CAST(l.l_shipdate AS DATE) >
               (b.lo + CAST(date_diff('day', b.lo, b.hi) // 2 AS INT))
               AS is_h2,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l.l_discount AS DECIMAL(18,2))))
                  AS DECIMAL(38,6)) AS r
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey, bounds b
      GROUP BY 1, 2
    ),
    folded AS (
      SELECT SUM(CASE WHEN treated AND NOT is_h2 THEN r END) AS t1,
             SUM(CASE WHEN treated AND is_h2 THEN r END) AS t2,
             SUM(CASE WHEN NOT treated AND NOT is_h2 THEN r END) AS c1,
             SUM(CASE WHEN NOT treated AND is_h2 THEN r END) AS c2
      FROM grid
    )
    SELECT CAST(ROUND(t1, 2) AS DOUBLE) AS treated_h1,
           CAST(ROUND(t2, 2) AS DOUBLE) AS treated_h2,
           CAST(ROUND(c1, 2) AS DOUBLE) AS control_h1,
           CAST(ROUND(c2, 2) AS DOUBLE) AS control_h2,
           CAST(ROUND((t2 - t1) - (c2 - c1), 2) AS DOUBLE) AS did_abs,
           ROUND((CAST(t2 - t1 AS DOUBLE) - CAST(c2 - c1 AS DOUBLE))
                 / (CAST(t1 AS DOUBLE) + CAST(c2 - c1 AS DOUBLE)), 6)
             AS did_rel
    FROM folded
"""


def q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres and Paasche price indices between the data halves.

    The econ-textbook inflation pair: how much did this basket's
    prices move, weighted by base-period (Laspeyres) vs current-period
    (Paasche) quantities? Per (part, half): exact decimal quantity and
    a DECIMAL(18,6)-quantized mean unit price (one divide, then
    quantize — both engines identical); parts present in both halves
    contribute p·q cross terms as exact decimal products. Output is
    one row with both indices and the Fisher geometric mean left in
    squared form (fisher_sq = L·P — no cross-engine sqrt needed at
    the boundary, and the caller can sqrt it).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.to_date("l_shipdate").alias("sd"),
        "l_extendedprice",
        "l_quantity",
    )
    split = li.agg(
        F.date_add(
            F.min("sd"), (F.datediff(F.max("sd"), F.min("sd")) / 2).cast("int")
        ).alias("mid")
    )
    half = li.crossJoin(F.broadcast(split)).select(
        "l_partkey",
        (F.col("sd") > F.col("mid")).alias("is_h2"),
        dec2("l_extendedprice").alias("ep"),
        dec2("l_quantity").alias("q"),
    )
    per = half.groupBy("l_partkey", "is_h2").agg(
        F.sum("q").cast("decimal(18,2)").alias("qty"),
        (F.sum("ep").cast("double") / F.sum("q").cast("double"))
        .cast("decimal(18,6)")
        .alias("unit_p"),
    )
    h1 = per.filter(~F.col("is_h2")).select(
        "l_partkey", F.col("qty").alias("q1"), F.col("unit_p").alias("p1")
    )
    h2 = per.filter(F.col("is_h2")).select(
        "l_partkey", F.col("qty").alias("q2"), F.col("unit_p").alias("p2")
    )
    both = h1.join(h2, "l_partkey")
    sums = both.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum((F.col("p1") * F.col("q1")).cast("decimal(38,8)")).alias("p1q1"),
        F.sum((F.col("p2") * F.col("q1")).cast("decimal(38,8)")).alias("p2q1"),
        F.sum((F.col("p1") * F.col("q2")).cast("decimal(38,8)")).alias("p1q2"),
        F.sum((F.col("p2") * F.col("q2")).cast("decimal(38,8)")).alias("p2q2"),
    )
    return sums.selectExpr(
        "CAST(n_parts AS BIGINT) AS n_parts",
        "ROUND(CAST(p2q1 AS DOUBLE) / CAST(p1q1 AS DOUBLE), 6) AS laspeyres",
        "ROUND(CAST(p2q2 AS DOUBLE) / CAST(p1q2 AS DOUBLE), 6) AS paasche",
        "ROUND((CAST(p2q1 AS DOUBLE) / CAST(p1q1 AS DOUBLE))"
        " * (CAST(p2q2 AS DOUBLE) / CAST(p1q2 AS DOUBLE)), 6) AS fisher_sq",
    )


QUERIES["q_price_index"] = q_price_index

ORACLES["q_price_index"] = """
    WITH bounds AS (
      SELECT MIN(CAST(l_shipdate AS DATE)) AS lo,
             MAX(CAST(l_shipdate AS DATE)) AS hi
      FROM lineitem
    ),
    half AS (
      SELECT l_partkey,
             CAST(l_shipdate AS DATE) >
               (b.lo + CAST(date_diff('day', b.lo, b.hi) // 2 AS INT))
               AS is_h2,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS ep,
             CAST(l_quantity AS DECIMAL(18,2)) AS q
      FROM lineitem, bounds b
    ),
    per AS (
      SELECT l_partkey, is_h2,
             CAST(SUM(q) AS DECIMAL(18,2)) AS qty,
             CAST(SUM(ep)::DOUBLE / SUM(q)::DOUBLE AS DECIMAL(18,6))
               AS unit_p
      FROM half GROUP BY 1, 2
    ),
    matched AS (
      SELECT h1.l_partkey, h1.qty AS q1, h1.unit_p AS p1,
             h2.qty AS q2, h2.unit_p AS p2
      FROM (SELECT * FROM per WHERE NOT is_h2) h1
      JOIN (SELECT * FROM per WHERE is_h2) h2 USING (l_partkey)
    ),
    sums AS (
      SELECT COUNT(*) AS n_parts,
             SUM(CAST(p1 * q1 AS DECIMAL(38,8))) AS p1q1,
             SUM(CAST(p2 * q1 AS DECIMAL(38,8))) AS p2q1,
             SUM(CAST(p1 * q2 AS DECIMAL(38,8))) AS p1q2,
             SUM(CAST(p2 * q2 AS DECIMAL(38,8))) AS p2q2
      FROM matched
    )
    SELECT CAST(n_parts AS BIGINT) AS n_parts,
           ROUND(CAST(p2q1 AS DOUBLE) / CAST(p1q1 AS DOUBLE), 6) AS laspeyres,
           ROUND(CAST(p2q2 AS DOUBLE) / CAST(p1q2 AS DOUBLE), 6) AS paasche,
           ROUND((CAST(p2q1 AS DOUBLE) / CAST(p1q1 AS DOUBLE))
                 * (CAST(p2q2 AS DOUBLE) / CAST(p1q2 AS DOUBLE)), 6)
             AS fisher_sq
    FROM sums
"""


def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative LTV curve per signup cohort (money twin of retention).

    Cohort = a customer's first-order quarter; age = quarters since;
    each (cohort, age) cell accumulates exact-cent revenue, and the
    curve reports cumulative revenue per cohort member — the number
    payback-period decisions read off. Two passes over orders (first
    order via min-window on the same custkey shuffle, then the cell
    rollup); the cumulative window runs over the O(cohorts × ages)
    grid.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_totalprice",
        (F.year("o_orderdate") * 4 + F.quarter("o_orderdate") - 1).alias("q"),
    )
    w = Window.partitionBy("o_custkey")
    marked = orders.select(
        "o_custkey",
        "q",
        F.min("q").over(w).alias("cohort_q"),
        (dec2("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cohort_sizes = (
        marked.select("o_custkey", "cohort_q")
        .distinct()
        .groupBy("cohort_q")
        .agg(F.count(F.lit(1)).alias("n_members"))
    )
    cells = marked.groupBy(
        "cohort_q", (F.col("q") - F.col("cohort_q")).alias("age_q")
    ).agg(F.sum("cents").alias("cents"))
    wcum = Window.partitionBy("cohort_q").orderBy("age_q").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        cells.join(F.broadcast(cohort_sizes), "cohort_q")
        .select(
            F.col("cohort_q").cast("bigint").alias("cohort_q"),
            F.col("age_q").cast("bigint").alias("age_q"),
            F.col("n_members").cast("bigint").alias("n_members"),
            F.round(F.col("cents").cast("double") / 100, 2).alias(
                "period_revenue"
            ),
            # exact integer micro-dollars: cents*100 div members —
            # truncation is engine-identical where a 4dp double ROUND
            # can tie at the half-ulp
            (
                F.expr("(sum(cents) OVER (PARTITION BY cohort_q ORDER BY age_q"
                       " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                       " * 100) div n_members")
            )
            .cast("bigint")
            .alias("cum_ltv_micro"),
        )
        .orderBy("cohort_q", "age_q")
    )


QUERIES["q_cohort_ltv"] = q_cohort_ltv

ORACLES["q_cohort_ltv"] = """
    WITH marked AS (
      SELECT o_custkey,
             YEAR(CAST(o_orderdate AS DATE)) * 4
               + QUARTER(CAST(o_orderdate AS DATE)) - 1 AS q,
             MIN(YEAR(CAST(o_orderdate AS DATE)) * 4
                 + QUARTER(CAST(o_orderdate AS DATE)) - 1)
               OVER (PARTITION BY o_custkey) AS cohort_q,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ),
    cohort_sizes AS (
      SELECT cohort_q, COUNT(*) AS n_members FROM (
        SELECT DISTINCT o_custkey, cohort_q FROM marked
      ) GROUP BY 1
    ),
    cells AS (
      SELECT cohort_q, q - cohort_q AS age_q, SUM(cents) AS cents
      FROM marked GROUP BY 1, 2
    )
    SELECT c.cohort_q::BIGINT AS cohort_q,
           c.age_q::BIGINT AS age_q,
           s.n_members::BIGINT AS n_members,
           ROUND(c.cents::DOUBLE / 100, 2) AS period_revenue,
           ((SUM(c.cents) OVER (PARTITION BY c.cohort_q ORDER BY c.age_q
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100)
             // s.n_members)::BIGINT AS cum_ltv_micro
    FROM cells c JOIN cohort_sizes s USING (cohort_q)
    ORDER BY cohort_q, age_q
"""


def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supply-concentration risk: per-part supplier HHI, rolled up.

    Procurement's single-source-risk screen: for each part, the
    Herfindahl index of quantity share across its suppliers (10000 =
    sole-sourced; competitive parts sit low). HHI stays fully
    rational — Σ qᵢ² · 10000 / (Σ qᵢ)² in exact decimal cross-
    multiplication, ONE double divide per part — then parts roll up
    into the standard concentration bands. Two chained map-side
    collapses on (part, supplier) → part; nothing rescans the fact.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (dec2("l_quantity") * 100).cast("long").alias("cq"),
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("cq").cast("decimal(18,0)").alias("q")
    )
    per_part = ps.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("q").cast("decimal(38,0)").alias("s"),
        F.sum((F.col("q") * F.col("q")).cast("decimal(38,0)")).alias("ss"),
    )
    hhi = F.round(
        F.col("ss").cast("double")
        * 10000
        / (F.col("s").cast("double") * F.col("s").cast("double")),
        2,
    )
    banded = per_part.select(
        "l_partkey",
        "n_suppliers",
        hhi.alias("hhi"),
        F.when(hhi >= 5000, "concentrated")
        .when(hhi >= 2500, "moderate")
        .otherwise("competitive")
        .alias("band"),
    )
    return (
        banded.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(F.avg(F.col("n_suppliers").cast("double")), 4).alias(
                "avg_suppliers"
            ),
            F.round(F.avg("hhi"), 2).alias("avg_hhi"),
        )
        .orderBy("band")
    )


QUERIES["q_supplier_hhi"] = q_supplier_hhi

ORACLES["q_supplier_hhi"] = """
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS DECIMAL(18,0)) AS q
      FROM lineitem GROUP BY 1, 2
    ),
    per_part AS (
      SELECT l_partkey, COUNT(*) AS n_suppliers,
             SUM(q)::HUGEINT AS s, SUM(q::HUGEINT * q::HUGEINT) AS ss
      FROM ps GROUP BY 1
    ),
    banded AS (
      SELECT l_partkey, n_suppliers,
             ROUND(ss::DOUBLE * 10000 / (s::DOUBLE * s::DOUBLE), 2) AS hhi,
             CASE WHEN ROUND(ss::DOUBLE * 10000
                             / (s::DOUBLE * s::DOUBLE), 2) >= 5000
                    THEN 'concentrated'
                  WHEN ROUND(ss::DOUBLE * 10000
                             / (s::DOUBLE * s::DOUBLE), 2) >= 2500
                    THEN 'moderate'
                  ELSE 'competitive' END AS band
      FROM per_part
    )
    SELECT band, COUNT(*)::BIGINT AS n_parts,
           ROUND(AVG(n_suppliers::DOUBLE), 4) AS avg_suppliers,
           ROUND(AVG(hhi), 2) AS avg_hhi
    FROM banded GROUP BY 1 ORDER BY 1
"""


def q_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour activity heatmap of the event stream.

    The 7×24 grid behind every traffic dashboard: exact event counts
    and decimal-exact value mass per cell, with each cell's share of
    the week. Pure map-side classification (dayofweek/hour on the
    normalized timestamp) into 168 cells — one partial-aggregated
    shuffle at any scale.
    """
    events = load_table(spark, sf_dir, "events")
    grid = events.groupBy(
        F.dayofweek("ts").alias("dow"), F.hour("ts").alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec2("value")).cast("double").alias("total_value"),
    )
    wt = Window.partitionBy()
    return grid.select(
        F.col("dow").cast("bigint").alias("dow"),
        F.col("hour").cast("bigint").alias("hour"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round("total_value", 2).alias("total_value"),
        F.round(
            F.col("n_events").cast("double")
            / F.sum("n_events").over(wt).cast("double"),
            6,
        ).alias("share"),
    ).orderBy("dow", "hour")


QUERIES["q_dow_hour_heatmap"] = q_dow_hour_heatmap

ORACLES["q_dow_hour_heatmap"] = """
    WITH grid AS (
      SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hour,
             COUNT(*) AS n_events,
             SUM(CAST(value AS DECIMAL(18,2))) AS total_value
      FROM events GROUP BY 1, 2
    )
    SELECT dow::BIGINT AS dow, hour::BIGINT AS hour,
           n_events::BIGINT AS n_events,
           ROUND(total_value::DOUBLE, 2) AS total_value,
           ROUND(n_events::DOUBLE / SUM(n_events) OVER ()::DOUBLE, 6) AS share
    FROM grid ORDER BY dow, hour
"""


# --- r06 additions: operations audit + graph link prediction ---------------

AGING_BUCKETS = ((0, 30), (31, 90), (91, 180))  # days; beyond last = "180+"
CN_MAX_DEG = 12  # wedge-center degree cap (hot hubs dropped whole)
CN_TOP_K = 20


def q_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog aging: non-finished orders bucketed by age
    (days since order date, measured at the corpus' latest order date)
    per order status, with counts and open value.

    The operations-dashboard staple. One pass: the as-of date is a
    single scalar aggregate broadcast into the row-level bucket expr
    (1-row crossJoin — the allowlisted scalar-broadcast shape), then
    one map-side-combinable groupBy((status, bucket)). Age arithmetic
    is integer days; money sums in DECIMAL cents cast once at the
    edge — nothing for an engine to round differently at 100 TB.
    """
    orders = load_table(spark, sf_dir, "orders")
    asof = orders.agg(F.max(F.to_date("o_orderdate")).alias("asof"))
    aged = (
        orders.filter(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(asof))
        .select(
            "o_orderstatus",
            F.datediff(F.col("asof"), F.to_date("o_orderdate")).alias("age_d"),
            dec2("o_totalprice").alias("price"),
        )
    )
    b = F.when(F.col("age_d") <= AGING_BUCKETS[0][1], F.lit("000-030"))
    b = b.when(F.col("age_d") <= AGING_BUCKETS[1][1], F.lit("031-090"))
    b = b.when(F.col("age_d") <= AGING_BUCKETS[2][1], F.lit("091-180"))
    b = b.otherwise(F.lit("180+"))
    return (
        aged.select("o_orderstatus", b.alias("age_bucket"), "price")
        .groupBy("o_orderstatus", "age_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price").cast("double").alias("open_value"),
        )
        .orderBy("o_orderstatus", "age_bucket")
    )


def q_shipping_delay_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency profile per order priority: line items
    joined back to their order header (the canonical fact-to-fact
    equi-join, both sides shuffled on l_orderkey/o_orderkey — the
    shape AQE handles at 100 TB), delay bucketed in integer days plus
    the exact mean delay.

    Every statistic is a ratio of integer sums (count, sum of day
    deltas), so the single ROUND(.,4) at the edge is the only double
    op — bit-stable across engines.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship_d")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", F.to_date("o_orderdate").alias("ord_d")
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority", F.datediff("ship_d", "ord_d").alias("delay_d")
    )
    b = F.when(F.col("delay_d") <= 7, F.lit("00-07"))
    b = b.when(F.col("delay_d") <= 30, F.lit("08-30"))
    b = b.when(F.col("delay_d") <= 90, F.lit("31-90"))
    b = b.otherwise(F.lit("90+"))
    return (
        j.select("o_orderpriority", b.alias("delay_bucket"), "delay_d")
        .groupBy("o_orderpriority", "delay_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum("delay_d").cast("double") / F.count(F.lit(1)),
                4,
            ).alias("avg_delay_days"),
        )
        .orderBy("o_orderpriority", "delay_bucket")
    )


def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the basket graph: the CN_TOP_K NON-adjacent
    part pairs with the most common neighbors (the classical
    common-neighbors score, Liben-Nowell & Kleinberg 2003).

    Candidates come from wedges centered on LOW-degree nodes only
    (deg <= CN_MAX_DEG; hot hubs are dropped whole — the same
    deterministic drop-the-bucket device as the df-capped LSH bands,
    replayed by the oracle): a hub center contributes deg² wedge
    pairs of near-zero specificity, so the cap bounds wedge mass at
    O(cap · m) while keeping the informative low-degree evidence. The
    existing-edge anti-join removes already-linked pairs; top-K is a
    takeOrdered, never a global sort.
    """
    edges, deg, _, _ = _oriented_graph(spark, sf_dir)
    sym = edges.select(
        F.col("part_a").alias("u"), F.col("part_b").alias("v")
    ).unionAll(edges.select(F.col("part_b").alias("u"), F.col("part_a").alias("v")))
    centers = deg.filter(F.col("deg") <= CN_MAX_DEG).select(
        F.col("node").alias("u")
    )
    adj = sym.join(F.broadcast(centers), "u")
    w1 = adj.select("u", F.col("v").alias("x"))
    w2 = adj.select("u", F.col("v").alias("y"))
    cand = (
        w1.join(w2, "u")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    non_edges = cand.join(
        edges,
        (cand.x == edges.part_a) & (cand.y == edges.part_b),
        "left_anti",
    )
    return (
        non_edges.orderBy(
            F.col("n_common").desc(), F.col("x"), F.col("y")
        )
        .limit(CN_TOP_K)
        .select(
            F.col("x").alias("part_a"),
            F.col("y").alias("part_b"),
            "n_common",
        )
    )


QUERIES["q_backlog_aging"] = q_backlog_aging
QUERIES["q_shipping_delay_profile"] = q_shipping_delay_profile
QUERIES["graph_common_neighbors"] = graph_common_neighbors

ORACLES["q_backlog_aging"] = """
    WITH asof_d AS (
      SELECT MAX(CAST(o_orderdate AS DATE)) AS d FROM orders
    ),
    aged AS (
      SELECT o_orderstatus,
             datediff('day', CAST(o_orderdate AS DATE), asof_d.d) AS age_d,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders, asof_d
      WHERE o_orderstatus <> 'F'
    )
    SELECT o_orderstatus,
           CASE WHEN age_d <= 30 THEN '000-030'
                WHEN age_d <= 90 THEN '031-090'
                WHEN age_d <= 180 THEN '091-180'
                ELSE '180+' END AS age_bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(price) AS DOUBLE) AS open_value
    FROM aged
    GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLES["q_shipping_delay_profile"] = """
    WITH j AS (
      SELECT o.o_orderpriority,
             datediff('day', CAST(o.o_orderdate AS DATE),
                      CAST(l.l_shipdate AS DATE)) AS delay_d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT o_orderpriority,
           CASE WHEN delay_d <= 7 THEN '00-07'
                WHEN delay_d <= 30 THEN '08-30'
                WHEN delay_d <= 90 THEN '31-90'
                ELSE '90+' END AS delay_bucket,
           COUNT(*) AS n_lines,
           ROUND(SUM(delay_d)::DOUBLE / COUNT(*), 4) AS avg_delay_days
    FROM j
    GROUP BY 1, 2 ORDER BY 1, 2
"""

ORACLES["graph_common_neighbors"] = f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_PAIR_ORDERS}
    ),
    deg AS (
      SELECT node, COUNT(*)::BIGINT AS d FROM (
        SELECT part_a AS node FROM pairs
        UNION ALL SELECT part_b FROM pairs) GROUP BY 1
    ),
    sym AS (
      SELECT part_a AS u, part_b AS v FROM pairs
      UNION ALL
      SELECT part_b, part_a FROM pairs
    ),
    adj AS (
      SELECT s.u, s.v FROM sym s JOIN deg ON deg.node = s.u
      WHERE deg.d <= {CN_MAX_DEG}
    ),
    cand AS (
      SELECT a.v AS x, b.v AS y, COUNT(*) AS n_common
      FROM adj a JOIN adj b ON a.u = b.u AND a.v < b.v
      GROUP BY 1, 2
    )
    SELECT c.x AS part_a, c.y AS part_b, c.n_common
    FROM cand c
    WHERE NOT EXISTS (
      SELECT 1 FROM pairs p WHERE p.part_a = c.x AND p.part_b = c.y
    )
    ORDER BY c.n_common DESC, c.x, c.y
    LIMIT {CN_TOP_K}
"""


# --- r06 batch 2: k-core + repeat-purchase retention ------------------------

KCORE_K = 3
KCORE_MAX_ROUNDS = 12


def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-core decomposition on the basket graph, run TO CONVERGENCE:
    the standard peel (drop nodes with degree < KCORE_K, recompute)
    repeats until a round removes no edge, reporting surviving
    node/edge counts per executed round. The loop early-exits on the
    first round whose edge count equals the previous round's (no edge
    removed ⇒ degrees unchanged ⇒ fixpoint); KCORE_MAX_ROUNDS is a
    safety cap, and the oracle replays the identical unrolled peel
    with the identical stop rule.

    At 100 TB the edge list is the only big table; each round shuffles
    O(E) on the node key and the survivor set shrinks monotonically,
    so later rounds get cheaper, not pricier.
    """
    edges, _, _, n_edges_val = _oriented_graph(spark, sf_dir)
    out_rows = kcore_peel_rounds(edges, k=KCORE_K, initial_edges=n_edges_val)
    return spark.createDataFrame(
        out_rows, "round int, n_nodes bigint, n_edges bigint"
    ).orderBy("round")


def kcore_peel_rounds(
    edges: DataFrame,
    k: int,
    max_rounds: int = KCORE_MAX_ROUNDS,
    initial_edges: int | None = None,
) -> list[tuple[int, int, int]]:
    """The convergence peel over ANY undirected edge list (columns
    part_a, part_b, one row per edge) — factored out of graph_kcore so
    tests can drive it with arbitrary graphs against a pure-Python
    union peel. Returns [(round, n_nodes, n_edges), ...] up to and
    including the first round that removed no edge. Pass
    ``initial_edges`` when the caller already counted the edge list
    (graph_kcore gets it from _oriented_graph) to skip one full count
    action."""
    cur = edges.select("part_a", "part_b")
    prev_edges = initial_edges if initial_edges is not None else cur.count()

    def degree_of(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col("part_a").alias("node"))
            .unionAll(df.select(F.col("part_b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )

    # The degree table does double duty (r10 optimization, guide §1.2 /
    # §2.3): it drives the peel AND yields the round's survivor stats —
    # n_nodes = its row count, n_edges = sum(deg)/2 (each edge counts
    # at both endpoints) — replacing the former per-round
    # explode + countDistinct pass over the full edge list with an
    # O(nodes) aggregate. One O(E) pass per round instead of two;
    # bit-identical output (sum(deg) is exactly 2·|edges|).
    deg = degree_of(cur).persist()
    out_rows = []
    for rnd in range(1, max_rounds + 1):
        keep = deg.filter(F.col("deg") >= k).select("node")
        cur = (
            cur.join(keep.withColumnRenamed("node", "part_a"), "part_a")
            .join(keep.withColumnRenamed("node", "part_b"), "part_b")
            .select("part_a", "part_b")
        )
        # localCheckpoint (not just persist): each round's plan embeds
        # the previous round's twice (two semi-joins) on top of the
        # basket-graph build, so the UNTRUNCATED lineage grows
        # exponentially in rounds — the round-3 plan string alone OOMs
        # a modest driver. Truncating per round is the standard move
        # for iterative graph algorithms (same device as memo_df).
        # eager=False: the stats action below materializes checkpoint,
        # degree cache and round stats in ONE job per round instead of
        # two — the checkpoint still truncates lineage at that point.
        # (r10 adjudication: an eager=True A/B at 8 runs measured
        # 3.23/3.54 s best — statistically a tie locally; lazy keeps
        # one fewer O(E) checkpoint-block re-read per round at scale.)
        cur = cur.localCheckpoint(eager=False)
        prev_deg = deg
        deg = degree_of(cur).persist()
        stat = deg.agg(
            F.count(F.lit(1)).alias("nn"),
            F.coalesce(F.sum("deg"), F.lit(0)).cast("long").alias("sm"),
        ).first()
        prev_deg.unpersist()
        ne = stat["sm"] // 2  # exact: sum(deg) is even by construction
        out_rows.append((rnd, stat["nn"], ne))
        if ne == prev_edges:
            break
        prev_edges = ne
    deg.unpersist()
    return out_rows


def q_repeat_purchase_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase retention curve: how many customers reach an
    n-th order, with the step-to-step continuation rate — the curve
    behind every retention/LTV model. One window (per-customer order
    rank) + one groupBy(rank); the lag for the continuation ratio runs
    on the O(max-rank) curve itself. Capped at rank 10 for a stable
    reporting surface.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    ranked = orders.select(
        "o_custkey", F.row_number().over(w).alias("rank_n")
    ).filter(F.col("rank_n") <= 10)
    curve = ranked.groupBy("rank_n").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    w_lag = Window.orderBy("rank_n")
    return (
        curve.select(
            "rank_n",
            "n_customers",
            F.lag("n_customers").over(w_lag).alias("prev"),
        )
        .select(
            "rank_n",
            "n_customers",
            F.when(
                F.col("prev").isNotNull(),
                F.round(
                    F.col("n_customers").cast("double")
                    / F.col("prev").cast("double"),
                    4,
                ),
            ).alias("continuation_rate"),
        )
        .orderBy("rank_n")
    )


QUERIES["graph_kcore"] = graph_kcore
QUERIES["q_repeat_purchase_curve"] = q_repeat_purchase_curve

# AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs per
# reference, and each peel round references the previous one three
# times — un-materialized, the basket-pair build re-executes 3^rounds
# times and spills the disk at sf0.1.
_KCORE_PEEL = """
    d{r} AS MATERIALIZED (
      SELECT node, COUNT(*) AS deg FROM (
        SELECT part_a AS node FROM e{p}
        UNION ALL SELECT part_b FROM e{p}) GROUP BY 1
    ),
    e{r} AS MATERIALIZED (
      SELECT c.part_a, c.part_b FROM e{p} c
      JOIN d{r} ka ON ka.node = c.part_a AND ka.deg >= {k}
      JOIN d{r} kb ON kb.node = c.part_b AND kb.deg >= {k}
    )"""

# Convergence stop rule, replayed verbatim: emit rounds 1..R where R is
# the FIRST round whose edge count equals the previous round's (round 0
# = the unpeeled basket graph), capped at KCORE_MAX_ROUNDS. The peel
# CTEs keep running to the cap (cheap: post-fixpoint rounds copy a
# shrunken, materialized edge set) and the WHERE clause trims the
# report to the converged prefix, matching the Spark early-exit loop.
ORACLES["graph_kcore"] = (
    f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    e0 AS MATERIALIZED (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_PAIR_ORDERS}
    ),"""
    + ",".join(
        _KCORE_PEEL.format(r=r, p=r - 1, k=KCORE_K)
        for r in range(1, KCORE_MAX_ROUNDS + 1)
    )
    + "".join(
        f""",
    s{r} AS (
      SELECT {r} AS round,
             (SELECT COUNT(DISTINCT n) FROM (
                SELECT part_a AS n FROM e{r}
                UNION ALL SELECT part_b FROM e{r})) AS n_nodes,
             (SELECT COUNT(*) FROM e{r}) AS n_edges
    )"""
        for r in range(1, KCORE_MAX_ROUNDS + 1)
    )
    + f""",
    counts AS (
      SELECT 0 AS round, (SELECT COUNT(*) FROM e0) AS n_edges
      UNION ALL
      {' UNION ALL '.join(f'SELECT round, n_edges FROM s{r}' for r in range(1, KCORE_MAX_ROUNDS + 1))}
    ),
    conv AS (
      SELECT COALESCE(MIN(a.round), {KCORE_MAX_ROUNDS}) AS stop
      FROM counts a JOIN counts b
        ON b.round = a.round - 1 AND b.n_edges = a.n_edges
      WHERE a.round >= 1
    )
    SELECT CAST(round AS INT) AS round,
           CAST(n_nodes AS BIGINT) AS n_nodes,
           CAST(n_edges AS BIGINT) AS n_edges
    FROM ({' UNION ALL '.join(f'SELECT * FROM s{r}' for r in range(1, KCORE_MAX_ROUNDS + 1))})
    WHERE round <= (SELECT stop FROM conv)
    ORDER BY round
"""
)

ORACLES["q_repeat_purchase_curve"] = """
    WITH ranked AS (
      SELECT o_custkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS rank_n
      FROM orders
    ),
    curve AS (
      SELECT rank_n, COUNT(*) AS n_customers
      FROM ranked WHERE rank_n <= 10 GROUP BY 1
    )
    SELECT rank_n, n_customers,
           CASE WHEN LAG(n_customers) OVER (ORDER BY rank_n) IS NOT NULL
             THEN ROUND(n_customers::DOUBLE
                        / LAG(n_customers) OVER (ORDER BY rank_n)::DOUBLE, 4)
             ELSE NULL END AS continuation_rate
    FROM curve ORDER BY rank_n
"""


# --- r06 batch 3: ops + funnel health ---------------------------------------

ERROR_BUDGET_SHARE = 0.45  # SLO: error events <= 45% of traffic (synthetic mix)


def q_cart_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily view→purchase abandonment per user cohort day: of the
    users who viewed that day, how many never purchased the same day —
    THE e-commerce funnel-health number. Exact set arithmetic on two
    per-(day, user) distinct collapses joined on the day grid; the
    fact stream is touched once per leg, map-side combinable, and the
    join key is the day — dimension-sized.
    """
    events = load_table(spark, sf_dir, "events")
    daily_users = (
        events.filter(F.col("event_type").isin("view", "purchase"))
        .select(
            F.to_date("ts").alias("d"),
            "user_id",
            (F.col("event_type") == "purchase").alias("is_p"),
        )
        .groupBy("d", "user_id")
        .agg(F.max(F.when(F.col("is_p"), 1).otherwise(0)).alias("purchased"),
             F.max(F.when(~F.col("is_p"), 1).otherwise(0)).alias("viewed"))
    )
    per_day = daily_users.filter(F.col("viewed") == 1).groupBy("d").agg(
        F.count(F.lit(1)).alias("n_viewers"),
        F.sum("purchased").alias("n_converted"),
    )
    return per_day.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n_viewers").cast("bigint").alias("n_viewers"),
        F.col("n_converted").cast("bigint").alias("n_converted"),
        F.round(
            (F.col("n_viewers") - F.col("n_converted")).cast("double")
            / F.col("n_viewers").cast("double"),
            4,
        ).alias("abandonment_rate"),
    ).orderBy("day")


def q_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget burn per day: error-event share of traffic vs
    the ERROR_BUDGET_SHARE objective, with the cumulative burn ratio a
    paging policy reads (burn > 1 = the budget is being spent faster
    than the SLO window allows). Integer counts, cross-multiplied
    compares, two windows on the O(days) grid only.
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(
            F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("n_err"),
    )
    w_cum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.select(
        "d",
        "n_total",
        "n_err",
        F.sum("n_total").over(w_cum).alias("cum_total"),
        F.sum("n_err").over(w_cum).alias("cum_err"),
    )
    budget = F.lit(ERROR_BUDGET_SHARE)
    return cum.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.col("n_total").cast("bigint").alias("n_total"),
        F.col("n_err").cast("bigint").alias("n_err"),
        F.round(F.col("n_err").cast("double") / F.col("n_total"), 4).alias(
            "err_share"
        ),
        F.round(
            F.col("cum_err").cast("double")
            / (F.col("cum_total").cast("double") * budget),
            4,
        ).alias("budget_burn"),
        (
            F.col("cum_err").cast("double")
            > F.col("cum_total").cast("double") * budget
        ).alias("budget_exceeded"),
    ).orderBy("day")


QUERIES["q_cart_abandonment"] = q_cart_abandonment
QUERIES["q_error_budget_burn"] = q_error_budget_burn

ORACLES["q_cart_abandonment"] = """
    WITH du AS (
      SELECT CAST(ts AS DATE) AS d, user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS purchased,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS viewed
      FROM events
      WHERE event_type IN ('view', 'purchase')
      GROUP BY 1, 2
    ),
    per_day AS (
      SELECT d, COUNT(*) AS n_viewers, SUM(purchased) AS n_converted
      FROM du WHERE viewed = 1 GROUP BY 1
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           n_viewers::BIGINT AS n_viewers,
           n_converted::BIGINT AS n_converted,
           ROUND((n_viewers - n_converted)::DOUBLE / n_viewers::DOUBLE, 4)
             AS abandonment_rate
    FROM per_day ORDER BY day
"""

ORACLES["q_error_budget_burn"] = f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             COUNT(*) AS n_total,
             SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err
      FROM events GROUP BY 1
    ),
    cum AS (
      SELECT d, n_total, n_err,
             SUM(n_total) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
               AS cum_total,
             SUM(n_err) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum_err
      FROM daily
    )
    SELECT strftime(d, '%Y-%m-%d') AS day,
           n_total::BIGINT AS n_total,
           n_err::BIGINT AS n_err,
           ROUND(n_err::DOUBLE / n_total, 4) AS err_share,
           ROUND(cum_err::DOUBLE / (cum_total::DOUBLE * {ERROR_BUDGET_SHARE}), 4)
             AS budget_burn,
           (cum_err::DOUBLE > cum_total::DOUBLE * {ERROR_BUDGET_SHARE})
             AS budget_exceeded
    FROM cum ORDER BY day
"""


# --- r06 batch 4: growth streaks + catalog adoption --------------------------


def q_runlength_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive revenue-growth days per event type —
    gaps-and-islands on the SIGN OF THE DELTA instead of on presence:
    day-over-day growth flags from one lag, islands by the classic
    rownum-difference trick, one max. All on the collapsed O(types ×
    days) grid; signs are exact integer-cents compares.
    """
    from etl_city_directories_spark.operators.stats import _daily_type_cents

    daily = _daily_type_cents(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("d")
    flagged = daily.select(
        "event_type",
        "d",
        (F.col("cents") > F.lag("cents").over(w)).alias("grew"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("grew"))
    w2 = Window.partitionBy("event_type").orderBy("d")
    islands = flagged.select(
        "event_type",
        (F.col("rn") - F.row_number().over(w2)).alias("grp"),
    )
    runs = islands.groupBy("event_type", "grp").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        runs.groupBy("event_type")
        .agg(
            F.max("run_len").cast("bigint").alias("longest_growth_streak"),
            F.count(F.lit(1)).cast("bigint").alias("n_streaks"),
        )
        .orderBy("event_type")
    )


def q_new_product_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog adoption curve: parts first ever ordered in each month
    and the cumulative distinct catalog coverage — "how fast does the
    assortment get discovered". First-touch is ONE min-date partial
    agg per part (never a distinct over the fact), then the curve is
    an O(months) window.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    )
    first_touch = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_partkey")
        .agg(F.min("od").alias("first_d"))
    )
    monthly = first_touch.groupBy(
        F.date_format("first_d", "yyyy-MM").alias("month")
    ).agg(F.count(F.lit(1)).alias("n_new_parts"))
    w = Window.orderBy("month").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        "month",
        F.col("n_new_parts").cast("bigint").alias("n_new_parts"),
        F.sum("n_new_parts").over(w).cast("bigint").alias("cum_parts"),
    ).orderBy("month")


QUERIES["q_runlength_streaks"] = q_runlength_streaks
QUERIES["q_new_product_adoption"] = q_new_product_adoption

ORACLES["q_runlength_streaks"] = """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    ),
    flagged AS (
      SELECT event_type, d,
             cents > LAG(cents) OVER (PARTITION BY event_type ORDER BY d)
               AS grew,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS rn
      FROM daily
    ),
    islands AS (
      SELECT event_type,
             rn - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d)
               AS grp
      FROM flagged WHERE grew
    ),
    runs AS (
      SELECT event_type, grp, COUNT(*) AS run_len
      FROM islands GROUP BY 1, 2
    )
    SELECT event_type,
           MAX(run_len)::BIGINT AS longest_growth_streak,
           COUNT(*)::BIGINT AS n_streaks
    FROM runs GROUP BY 1 ORDER BY 1
"""

ORACLES["q_new_product_adoption"] = """
    WITH ft AS (
      SELECT l.l_partkey, MIN(CAST(o.o_orderdate AS DATE)) AS first_d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
    ),
    monthly AS (
      SELECT strftime(first_d, '%Y-%m') AS month, COUNT(*) AS n_new_parts
      FROM ft GROUP BY 1
    )
    SELECT month, n_new_parts::BIGINT AS n_new_parts,
           SUM(n_new_parts) OVER (ORDER BY month
             ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_parts
    FROM monthly ORDER BY month
"""


# --- r06 batch 5: weekly seasonal index ---------------------------------------


def q_seasonal_index_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonal revenue index per event type: each ISO week's
    share of the type's revenue relative to a uniform week (index 1.0
    = no seasonality) — the demand-planning complement to the
    day-of-week decomposition, at the granularity this corpus actually
    spans. Exact integer cents sums; the index is a cross-multiplied
    ratio of sums with ONE divide, computed on the O(types × weeks)
    grid.
    """
    events = load_table(spark, sf_dir, "events")
    weekly = events.groupBy(
        "event_type", F.weekofyear("ts").alias("week_num")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    per_type = Window.partitionBy("event_type")
    return weekly.select(
        "event_type",
        "week_num",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        F.round(
            F.col("cents").cast("double")
            * F.count(F.lit(1)).over(per_type).cast("double")
            / F.sum("cents").over(per_type).cast("double"),
            4,
        ).alias("seasonal_index"),
    ).orderBy("event_type", "week_num")


QUERIES["q_seasonal_index_weekly"] = q_seasonal_index_weekly

ORACLES["q_seasonal_index_weekly"] = """
    WITH weekly AS (
      SELECT event_type, WEEKOFYEAR(ts) AS week_num,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, week_num,
           cents::DOUBLE / 100.0 AS revenue,
           ROUND(cents::DOUBLE
                 * COUNT(*) OVER (PARTITION BY event_type)
                 / SUM(cents) OVER (PARTITION BY event_type)::DOUBLE, 4)
             AS seasonal_index
    FROM weekly ORDER BY event_type, week_num
"""


# ---- r08 BI batch: PVM bridge, concentration, nested shares ----

PVM_Y1, PVM_Y2 = 1996, 1997  # the bridged periods
CONC_TOP_N = 5  # concentration: top-N customers per nation


def q_price_volume_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix bridge per part brand between two ship years —
    "did brand revenue move because we charged MORE or because we sold
    MORE?", the FP&A waterfall behind every revenue review.

    Both periods collapse to exact (cents, units) sufficient pairs per
    brand in one fact pass (the year filter pushes down). The bridge
    needs last year's unit price applied to this year's volume —
    a rational r1·q2/q1 — which is rounded HALF-UP IN INTEGER
    ARITHMETIC (the q_vwap_daily lesson: never let a double divide
    decide a reported cent), so price_effect + volume_effect
    reconciles to delta_revenue EXACTLY on every both-period row.
    Single-period brands classify as new/discontinued with the whole
    delta attributed accordingly. The rational is evaluated as
    q2·(r1 div q1) + round(q2·(r1 mod q1)/q1): the quotient term is a
    UNIT PRICE (scale-invariant), so no intermediate grows with the
    corpus — the naive r1·q2 product overflowed BIGINT at the 10×
    probe (sf1), which is exactly what the probe exists to catch.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(f"{PVM_Y1}-01-01"))
        & (F.col("l_shipdate") < F.lit(f"{PVM_Y2 + 1}-01-01"))
    )
    part = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    )
    rev = dec2("l_extendedprice") * (F.lit(1) - dec2("l_discount"))
    per = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", F.year("l_shipdate").alias("y"))
        .agg(
            # rev carries scale 4 (price x (1-disc)), so the exact
            # integer unit is 1e-4 dollars, not cents — x100 would
            # leave fractional parts for the engines to cast apart
            (F.sum(rev) * 10000).cast("bigint").alias("m4"),
            F.sum("l_quantity").cast("bigint").alias("units"),
        )
    )
    y1 = per.filter(F.col("y") == PVM_Y1).select(
        "p_brand", F.col("m4").alias("r1"), F.col("units").alias("q1")
    )
    y2 = per.filter(F.col("y") == PVM_Y2).select(
        "p_brand", F.col("m4").alias("r2"), F.col("units").alias("q2")
    )
    joined = y1.join(y2, "p_brand", "full_outer")
    return joined.selectExpr(
        "p_brand",
        f"CAST({PVM_Y1} AS BIGINT) AS year_base",
        "CAST(COALESCE(r1, 0) AS DOUBLE) / 1e4 AS revenue_base",
        "CAST(COALESCE(r2, 0) AS DOUBLE) / 1e4 AS revenue_next",
        "CAST(COALESCE(r2, 0) - COALESCE(r1, 0) AS DOUBLE) / 1e4"
        " AS delta_revenue",
        # x = round(r1*q2/q1): last year's price at this year's volume,
        # overflow-free (the quotient is a unit price, the remainder
        # term's product is bounded by q1*q2)
        "CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL THEN"
        " CAST(r2 - (q2 * (r1 DIV q1) + (q2 * (r1 % q1) + q1 DIV 2) DIV q1) AS DOUBLE) / 1e4 END"
        " AS price_effect",
        "CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL THEN"
        " CAST((q2 * (r1 DIV q1) + (q2 * (r1 % q1) + q1 DIV 2) DIV q1) - r1 AS DOUBLE) / 1e4 END"
        " AS volume_effect",
        "CASE WHEN r1 IS NULL THEN 'new'"
        " WHEN r2 IS NULL THEN 'discontinued'"
        " ELSE 'carried' END AS bridge_class",
    ).orderBy("p_brand")


def q_customer_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration per nation: what share of a nation's
    revenue do its top-5 customers carry? — the account-risk lens
    (complement of q_supplier_hhi's supply-side view).

    The fact collapses to per-customer cents on the (custkey) shuffle;
    the rank and both conditional sums run per nation over the
    customer dimension, never the fact. Deterministic rank tiebreak
    (cents DESC, custkey). Exact integer shares, one double divide.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey"
        )
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    per_cust = (
        orders.groupBy("o_custkey")
        .agg((F.sum(dec2("o_totalprice")) * 100).cast("bigint").alias("cents"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_name", "o_custkey", "cents")
    )
    w_rank = Window.partitionBy("n_name").orderBy(
        F.desc("cents"), F.asc("o_custkey")
    )
    ranked = per_cust.select(
        "n_name", "cents", F.row_number().over(w_rank).alias("rk")
    )
    return (
        ranked.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            (F.sum("cents").cast("double") / 100).alias("revenue"),
            F.sum(F.when(F.col("rk") <= CONC_TOP_N, F.col("cents")).otherwise(0))
            .alias("top_cents"),
            F.sum("cents").alias("all_cents"),
        )
        .select(
            "n_name",
            "n_customers",
            "revenue",
            F.round(
                F.col("top_cents").cast("double")
                / F.col("all_cents").cast("double"),
                6,
            ).alias(f"top{CONC_TOP_N}_share"),
        )
        .orderBy("n_name")
    )


def q_share_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested percent-of-total: each nation's revenue share WITHIN its
    region and each region's share of global revenue, on one row per
    nation — the drill-path normalization every BI tool recomputes.

    One fact pass to per-nation cents (dims broadcast), then two
    window sums over the 25-row nation grid. Integer shares, two
    double divides at the edge.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice"
    )
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
    )
    region = F.broadcast(
        load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    )
    per_nation = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg((F.sum(dec2("o_totalprice")) * 100).cast("bigint").alias("cents"))
    )
    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return per_nation.select(
        "r_name",
        "n_name",
        (F.col("cents").cast("double") / 100).alias("nation_revenue"),
        F.round(
            F.col("cents").cast("double")
            / F.sum("cents").over(w_region).cast("double"),
            6,
        ).alias("share_in_region"),
        F.round(
            F.sum("cents").over(w_region).cast("double")
            / F.sum("cents").over(w_all).cast("double"),
            6,
        ).alias("region_share_global"),
    ).orderBy("r_name", "n_name")


QUERIES["q_price_volume_mix"] = q_price_volume_mix
QUERIES["q_customer_concentration"] = q_customer_concentration
QUERIES["q_share_nested"] = q_share_nested

ORACLES["q_price_volume_mix"] = f"""
    WITH per AS (
      SELECT p.p_brand, EXTRACT(year FROM l.l_shipdate) AS y,
             CAST(SUM(l.l_extendedprice::DECIMAL(18,2)
                      * (1 - l.l_discount::DECIMAL(18,2))) * 10000 AS BIGINT)
               AS m4,
             CAST(SUM(l.l_quantity) AS BIGINT) AS units
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= '{PVM_Y1}-01-01'
        AND l.l_shipdate < '{PVM_Y2 + 1}-01-01'
      GROUP BY 1, 2
    ),
    y1 AS (SELECT p_brand, m4 AS r1, units AS q1 FROM per
           WHERE y = {PVM_Y1}),
    y2 AS (SELECT p_brand, m4 AS r2, units AS q2 FROM per
           WHERE y = {PVM_Y2})
    SELECT COALESCE(y1.p_brand, y2.p_brand) AS p_brand,
           CAST({PVM_Y1} AS BIGINT) AS year_base,
           CAST(COALESCE(r1, 0) AS DOUBLE) / 1e4 AS revenue_base,
           CAST(COALESCE(r2, 0) AS DOUBLE) / 1e4 AS revenue_next,
           CAST(COALESCE(r2, 0) - COALESCE(r1, 0) AS DOUBLE) / 1e4
             AS delta_revenue,
           CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL THEN
             CAST(r2 - (q2 * (r1 // q1) + (q2 * (r1 % q1) + q1 // 2) // q1) AS DOUBLE) / 1e4 END
             AS price_effect,
           CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL THEN
             CAST((q2 * (r1 // q1) + (q2 * (r1 % q1) + q1 // 2) // q1) - r1 AS DOUBLE) / 1e4 END
             AS volume_effect,
           CASE WHEN r1 IS NULL THEN 'new'
                WHEN r2 IS NULL THEN 'discontinued'
                ELSE 'carried' END AS bridge_class
    FROM y1 FULL OUTER JOIN y2 USING (p_brand)
    ORDER BY p_brand
"""

ORACLES["q_customer_concentration"] = f"""
    WITH per_cust AS (
      SELECT n.n_name, o.o_custkey,
             CAST(SUM(o.o_totalprice::DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT n_name, cents,
             ROW_NUMBER() OVER (PARTITION BY n_name
                                ORDER BY cents DESC, o_custkey) AS rk
      FROM per_cust
    )
    SELECT n_name,
           COUNT(*)::BIGINT AS n_customers,
           SUM(cents)::DOUBLE / 100 AS revenue,
           ROUND(SUM(CASE WHEN rk <= {CONC_TOP_N} THEN cents ELSE 0 END)::DOUBLE
                 / SUM(cents)::DOUBLE, 6) AS top{CONC_TOP_N}_share
    FROM ranked GROUP BY 1 ORDER BY 1
"""

ORACLES["q_share_nested"] = """
    WITH per_nation AS (
      SELECT r.r_name, n.n_name,
             CAST(SUM(o.o_totalprice::DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2
    )
    SELECT r_name, n_name,
           cents::DOUBLE / 100 AS nation_revenue,
           ROUND(cents::DOUBLE
                 / SUM(cents) OVER (PARTITION BY r_name)::DOUBLE, 6)
             AS share_in_region,
           ROUND(SUM(cents) OVER (PARTITION BY r_name)::DOUBLE
                 / SUM(cents) OVER ()::DOUBLE, 6) AS region_share_global
    FROM per_nation ORDER BY r_name, n_name
"""


def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering-coefficient distribution of the basket graph:
    per-node cc = triangles_at_v / C(deg_v, 2), bucketed to a 0.1-wide
    histogram plus the Watts-Strogatz average — the per-node
    companion to graph_triangle_count's single global ratio.

    Reuses the memoized degree-oriented graph: the wedge-close join
    emits each triangle once as (v, w, src); exploding the three
    corners and counting per node costs O(3·triangles). cc is a small
    RATIONAL (2t / d(d−1)), so both the bucket (floor(10·cc)) and the
    micro-quantized average term compute in EXACT integer division —
    a double divide could land 4.999… vs 5.0 across engines exactly
    when 10·cc is integral, which is common (cc = 1/2, 1/5, …).
    Degree-1 nodes are excluded (cc undefined).
    """
    edges, deg, oriented, n_edges_val = _oriented_graph(spark, sf_dir)
    w1 = oriented.select("src", F.col("dst").alias("v"), F.col("ddeg").alias("dv"))
    w2 = oriented.select("src", F.col("dst").alias("w"), F.col("ddeg").alias("dw"))
    wedges = w1.join(w2, "src").filter(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    closing = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri_nodes = (
        wedges.join(closing, ["v", "w"])
        .select(
            F.explode(F.array(F.col("src"), F.col("v"), F.col("w"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    per_node = (
        deg.filter(F.col("deg") >= 2)
        .join(tri_nodes, "node", "left")
        .select(
            "node",
            "deg",
            F.coalesce("t", F.lit(0)).alias("t"),
            (F.col("deg") * (F.col("deg") - 1)).alias("dd"),
        )
    )
    scored = per_node.selectExpr(
        "node",
        "(20 * t) DIV dd AS bucket",  # floor(10·cc), exact
        "(4000000 * t + dd) DIV (2 * dd) AS cc_micro",  # round(1e6·cc)
    )
    w_all = Window.partitionBy()
    return (
        scored.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("cc_micro").alias("micro_sum"),
        )
        .select(
            F.col("bucket").cast("bigint").alias("cc_bucket_x10"),
            "n_nodes",
            F.round(
                F.sum("micro_sum").over(w_all).cast("double")
                / F.sum("n_nodes").over(w_all).cast("double")
                / 1e6,
                6,
            ).alias("avg_local_cc"),
        )
        .orderBy("cc_bucket_x10")
    )


QUERIES["graph_clustering_coeff"] = graph_clustering_coeff

ORACLES["graph_clustering_coeff"] = f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a
      JOIN items b ON a.l_orderkey = b.l_orderkey
                  AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_PAIR_ORDERS}
    ),
    deg AS (
      SELECT node, COUNT(*)::BIGINT AS d FROM (
        SELECT part_a AS node FROM pairs
        UNION ALL SELECT part_b FROM pairs) GROUP BY 1
    ),
    tri AS (
      SELECT e1.part_a AS x, e1.part_b AS y, e2.part_b AS z
      FROM pairs e1
      JOIN pairs e2 ON e2.part_a = e1.part_b
      JOIN pairs e3 ON e3.part_a = e1.part_a AND e3.part_b = e2.part_b
    ),
    tri_nodes AS (
      SELECT node, COUNT(*)::BIGINT AS t FROM (
        SELECT x AS node FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri) GROUP BY 1
    ),
    scored AS (
      SELECT (20 * COALESCE(tn.t, 0)) // (deg.d * (deg.d - 1)) AS bucket,
             (4000000 * COALESCE(tn.t, 0) + deg.d * (deg.d - 1))
               // (2 * deg.d * (deg.d - 1)) AS cc_micro
      FROM deg LEFT JOIN tri_nodes tn USING (node)
      WHERE deg.d >= 2
    )
    SELECT CAST(bucket AS BIGINT) AS cc_bucket_x10,
           COUNT(*)::BIGINT AS n_nodes,
           ROUND(SUM(SUM(cc_micro)) OVER ()::DOUBLE
                 / SUM(COUNT(*)) OVER ()::DOUBLE / 1e6, 6) AS avg_local_cc
    FROM scored GROUP BY bucket ORDER BY cc_bucket_x10
"""


# --- Little's law audit --------------------------------------------
LITTLE_EDGE_DAYS = 30  # interior-window trim (censoring guard)
# degenerate-window guard predicate, shared verbatim by both engines
_LL_DEGEN = "(window_days = 0 OR n_arrivals = 0)"


def q_queue_little_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law audit (L = λ·W) on the order-fulfillment queue:
    time-average open orders vs arrival rate × average time-in-system,
    over an interior window (edges trimmed so boundary censoring
    doesn't bias either side) — the steady-state sanity check run on
    any queue before its latency SLOs are trusted.

    The WIP series uses the DELTA-ENCODING sweep, not an interval
    join: +1 at each order's start day, −1 after its last ship day,
    one cumulative-sum window over the O(days) spine — O(orders +
    days) where the naive day×interval range join is O(Σ durations).
    Every count is an exact integer; three closed-form double divides
    at the edge.
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    spans = (
        li.groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("end_d"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(F.col("o_orderdate").alias("start_d"), "end_d")
    )
    bounds = spans.agg(
        F.min("start_d").alias("lo"), F.max("end_d").alias("hi")
    )
    # r10 (guide §1.2 don't compute twice): the 2-branch union embedded
    # the spans subtree (fact rollup + orders join) twice — the explode
    # of a 2-struct array emits the identical (d, delta) multiset from
    # one pass. (bounds above is spans' other consumer; its scalar
    # min/max cannot ride the per-day grouping, so 3 subtree
    # evaluations become 2.)
    deltas = (
        spans.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("start_d").alias("d"), F.lit(1).alias("delta")
                    ),
                    F.struct(
                        F.date_add("end_d", 1).alias("d"),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("e")
        )
        .select("e.d", "e.delta")
        .groupBy("d")
        .agg(F.sum("delta").alias("delta"))
    )
    spine = bounds.select(
        "lo",
        "hi",
        F.explode(F.sequence("lo", F.date_add("hi", 1))).alias("d"),
    )
    w_cum = Window.partitionBy().orderBy("d")
    series = (
        spine.join(deltas, "d", "left")
        .select(
            "d",
            "lo",
            "hi",
            F.sum(F.coalesce("delta", F.lit(0))).over(w_cum).alias("wip"),
        )
        .filter(
            (F.datediff("d", "lo") >= LITTLE_EDGE_DAYS)
            & (F.datediff("hi", "d") >= LITTLE_EDGE_DAYS)
        )
    )
    wip = series.agg(
        F.count(F.lit(1)).alias("window_days"),
        F.sum("wip").cast("decimal(38,0)").alias("wip_sum"),
        F.min("d").alias("win_lo"),
        F.max("d").alias("win_hi"),
    )
    arr = spans.crossJoin(F.broadcast(wip.select("win_lo", "win_hi"))).filter(
        (F.col("start_d") >= F.col("win_lo"))
        & (F.col("start_d") <= F.col("win_hi"))
    ).agg(
        F.count(F.lit(1)).alias("n_arrivals"),
        F.sum(F.datediff("end_d", "start_d") + 1)
        .cast("decimal(38,0)")
        .alias("dur_sum"),
    )
    both = wip.crossJoin(arr)
    d = lambda c: f"CAST({c} AS DOUBLE)"  # noqa: E731
    l_expr = f"({d('wip_sum')} / {d('window_days')})"
    lam_expr = f"({d('n_arrivals')} / {d('window_days')})"
    w_expr = f"({d('dur_sum')} / {d('n_arrivals')})"
    # Empty-interior guard (shared CASE, identical string in the
    # oracle): a span shorter than 2*LITTLE_EDGE_DAYS leaves
    # window_days = 0 / n_arrivals = 0, where Spark's x/0 yields NULL
    # but DuckDB yields IEEE inf/NaN — report NULL in BOTH engines.
    g = lambda e: f"(CASE WHEN {_LL_DEGEN} THEN NULL ELSE {e} END)"  # noqa: E731
    return both.selectExpr(
        "CAST(window_days AS BIGINT) AS window_days",
        "CAST(n_arrivals AS BIGINT) AS n_arrivals",
        g(f"ROUND({l_expr}, 4)") + " AS avg_wip",
        g(f"ROUND({lam_expr}, 6)") + " AS lambda_per_day",
        g(f"ROUND({w_expr}, 4)") + " AS w_days",
        g(f"ROUND({l_expr} / ({lam_expr} * {w_expr}), 4)") + " AS little_ratio",
    )


QUERIES["q_queue_little_law"] = q_queue_little_law

ORACLES["q_queue_little_law"] = f"""
    WITH spans AS (
      SELECT o.o_orderdate AS start_d, e.end_d
      FROM (SELECT l_orderkey, MAX(l_shipdate) AS end_d
            FROM lineitem GROUP BY 1) e
      JOIN orders o ON e.l_orderkey = o.o_orderkey
    ),
    bounds AS (
      SELECT MIN(start_d) AS lo, MAX(end_d) AS hi FROM spans
    ),
    deltas AS (
      SELECT d, SUM(delta) AS delta FROM (
        SELECT start_d AS d, 1 AS delta FROM spans
        UNION ALL
        SELECT end_d + INTERVAL 1 DAY, -1 FROM spans
      ) GROUP BY 1
    ),
    spine AS (
      SELECT lo, hi,
             UNNEST(generate_series(lo, hi + INTERVAL 1 DAY,
                                    INTERVAL 1 DAY))::DATE AS d
      FROM bounds
    ),
    series AS (
      SELECT s.d, s.lo, s.hi,
             SUM(COALESCE(x.delta, 0)) OVER (ORDER BY s.d
               ROWS UNBOUNDED PRECEDING) AS wip
      FROM spine s LEFT JOIN deltas x ON s.d = x.d
    ),
    interior AS (
      SELECT * FROM series
      WHERE date_diff('day', lo, d) >= {LITTLE_EDGE_DAYS}
        AND date_diff('day', d, hi) >= {LITTLE_EDGE_DAYS}
    ),
    wip AS (
      SELECT COUNT(*) AS window_days,
             CAST(SUM(wip) AS HUGEINT) AS wip_sum,
             MIN(d) AS win_lo, MAX(d) AS win_hi
      FROM interior
    ),
    arr AS (
      SELECT COUNT(*) AS n_arrivals,
             CAST(SUM(date_diff('day', start_d, end_d) + 1) AS HUGEINT)
               AS dur_sum
      FROM spans, wip
      WHERE start_d >= win_lo AND start_d <= win_hi
    )
    SELECT CAST(window_days AS BIGINT) AS window_days,
           CAST(n_arrivals AS BIGINT) AS n_arrivals,
           (CASE WHEN {_LL_DEGEN} THEN NULL ELSE
            ROUND(CAST(wip_sum AS DOUBLE) / CAST(window_days AS DOUBLE), 4)
            END) AS avg_wip,
           (CASE WHEN {_LL_DEGEN} THEN NULL ELSE
            ROUND(CAST(n_arrivals AS DOUBLE) / CAST(window_days AS DOUBLE), 6)
            END) AS lambda_per_day,
           (CASE WHEN {_LL_DEGEN} THEN NULL ELSE
            ROUND(CAST(dur_sum AS DOUBLE) / CAST(n_arrivals AS DOUBLE), 4)
            END) AS w_days,
           (CASE WHEN {_LL_DEGEN} THEN NULL ELSE
            ROUND((CAST(wip_sum AS DOUBLE) / CAST(window_days AS DOUBLE))
                  / ((CAST(n_arrivals AS DOUBLE) / CAST(window_days AS DOUBLE))
                     * (CAST(dur_sum AS DOUBLE) / CAST(n_arrivals AS DOUBLE))),
                  4) END) AS little_ratio
    FROM wip, arr
"""


# --- Stratified matching uplift ------------------------------------
# treatment = the customer's MEAN item discount exceeds 5% (an
# any-item rule catches ~everyone at ~40 items/customer — no control
# arm); the mean splits the corpus near 50/50 and compares exactly by
# cross-multiplication (Σ discount-cents > 5 · n_items).
UPLIFT_MEAN_DISCOUNT_CENTS = 5
UPLIFT_STRATA = 10  # acctbal deciles (explicit rank, bit-stable)


def q_promo_uplift_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified-matching uplift (ATT): did discounted customers
    spend more than comparable full-price customers? Customers
    stratify into account-balance deciles (the pre-treatment
    covariate), treated = MEAN item discount above 5% (exact by
    cross-multiplication; see the constant's note on why an any-item
    rule leaves no control arm), and the
    per-stratum mean-outcome gap weights by treated mass into the
    average treatment effect on the treated — the
    covariate-adjustment sibling of q_did_promo's time-based
    identification.

    Deciles come from an explicit rank (floor((rn−1)·10/n), the
    bit-stable q_rfm_segmentation device, not ntile). Outcomes are
    exact cents; each stratum's rational uplift micro-quantizes
    before the treated-weighted ATT sum (one window over the ≤10
    stratum rows). Strata missing an arm report NULL uplift and drop
    out of the ATT weighting.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_discount")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    treated = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("o_custkey").alias("t_custkey"))
        .agg(
            F.sum((dec2("l_discount") * 100).cast("long")).alias("sd"),
            F.count(F.lit(1)).alias("ni"),
        )
        .filter(
            F.col("sd") > UPLIFT_MEAN_DISCOUNT_CENTS * F.col("ni")
        )
        .select("t_custkey")
        .withColumn("is_treated", F.lit(1))
    )
    outcome = orders.groupBy("o_custkey").agg(
        F.sum((dec2("o_totalprice") * 100).cast("long")).alias("cents")
    )
    w_rank = Window.partitionBy().orderBy("c_acctbal", "c_custkey")
    w_n = Window.partitionBy()
    strata = cust.select(
        "c_custkey",
        F.floor(
            (F.row_number().over(w_rank) - 1)
            * UPLIFT_STRATA
            / F.count(F.lit(1)).over(w_n)
        ).cast("long").alias("stratum"),
    )
    panel = (
        strata.join(outcome, strata.c_custkey == outcome.o_custkey)
        .join(treated, F.col("c_custkey") == treated.t_custkey, "left")
        .select(
            "stratum",
            F.coalesce("is_treated", F.lit(0)).alias("t"),
            "cents",
        )
    )
    per_stratum = panel.groupBy("stratum").agg(
        F.sum("t").cast("bigint").alias("n_treated"),
        F.sum(1 - F.col("t")).cast("bigint").alias("n_control"),
        F.sum(F.when(F.col("t") == 1, F.col("cents"))).cast("decimal(38,0)").alias("st"),
        F.sum(F.when(F.col("t") == 0, F.col("cents"))).cast("decimal(38,0)").alias("sc"),
    )
    d = lambda c: f"CAST({c} AS DOUBLE)"  # noqa: E731
    up = (
        f"(CASE WHEN n_treated = 0 OR n_control = 0 THEN NULL"
        f" ELSE {d('st')} / {d('n_treated')} - {d('sc')} / {d('n_control')}"
        f" END)"
    )
    # Display quantization uses floor(x*1e4 + 0.5)/1e4, NOT ROUND(x, 4):
    # the ATT denominator is a small integer (Σ n_treated), so the
    # 4-dp value lands on EXACT binary ties (e.g. W=80 → S·1.25) where
    # Spark's HALF_UP and DuckDB's round disagree on negatives (found
    # at sf0.001: -93213.23975 → -93213.2398 vs -93213.2397). floor is
    # exact on IEEE doubles in both engines.
    scored = per_stratum.selectExpr(
        "stratum",
        "n_treated",
        "n_control",
        # divide by a DOUBLE literal: Spark types a bare 10000.0 as
        # DECIMAL and BIGINT/DECIMAL -> DECIMAL (trailing-zero strings)
        f"CAST(floor({up} * 100 + 0.5) AS BIGINT)"
        f" / CAST(10000 AS DOUBLE) AS uplift_dollars",
        f"CAST(floor({up} + 0.5) AS BIGINT) AS up_cents",
    )
    w_all = Window.partitionBy()
    s_sum = F.sum(
        F.when(F.col("up_cents").isNotNull(), F.col("n_treated") * F.col("up_cents"))
    ).over(w_all)
    w_sum = F.sum(
        F.when(F.col("up_cents").isNotNull(), F.col("n_treated"))
    ).over(w_all)
    att_x1e4 = F.floor(
        s_sum.cast("double") * 100 / w_sum.cast("double") + F.lit(0.5)
    )
    return scored.select(
        "stratum",
        "n_treated",
        "n_control",
        "uplift_dollars",
        (att_x1e4 / F.lit(10000.0)).alias("att_dollars"),
    )


QUERIES["q_promo_uplift_matching"] = q_promo_uplift_matching

ORACLES["q_promo_uplift_matching"] = f"""
    WITH treated AS (
      SELECT o.o_custkey, 1 AS is_treated
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1
      HAVING SUM(CAST(CAST(l.l_discount AS DECIMAL(18,2)) * 100 AS BIGINT))
             > {UPLIFT_MEAN_DISCOUNT_CENTS} * COUNT(*)
    ),
    outcome AS (
      SELECT o_custkey,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS cents
      FROM orders GROUP BY 1
    ),
    strata AS (
      SELECT c_custkey,
             CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey)
                         - 1) * {UPLIFT_STRATA}
                        / CAST(COUNT(*) OVER () AS DOUBLE)) AS BIGINT)
               AS stratum
      FROM customer
    ),
    panel AS (
      SELECT s.stratum, COALESCE(t.is_treated, 0) AS t, o.cents
      FROM strata s
      JOIN outcome o ON s.c_custkey = o.o_custkey
      LEFT JOIN treated t ON s.c_custkey = t.o_custkey
    ),
    per_stratum AS (
      SELECT stratum,
             CAST(SUM(t) AS BIGINT) AS n_treated,
             CAST(SUM(1 - t) AS BIGINT) AS n_control,
             CAST(SUM(CASE WHEN t = 1 THEN cents END) AS HUGEINT) AS st,
             CAST(SUM(CASE WHEN t = 0 THEN cents END) AS HUGEINT) AS sc
      FROM panel GROUP BY 1
    ),
    scored AS (
      SELECT stratum, n_treated, n_control,
             CAST(floor((CASE WHEN n_treated = 0 OR n_control = 0 THEN NULL
                    ELSE CAST(st AS DOUBLE) / CAST(n_treated AS DOUBLE)
                         - CAST(sc AS DOUBLE) / CAST(n_control AS DOUBLE)
                    END) * 100 + 0.5) AS BIGINT) / 10000.0
               AS uplift_dollars,
             CAST(floor((CASE WHEN n_treated = 0 OR n_control = 0 THEN NULL
                    ELSE CAST(st AS DOUBLE) / CAST(n_treated AS DOUBLE)
                         - CAST(sc AS DOUBLE) / CAST(n_control AS DOUBLE)
                    END) + 0.5) AS BIGINT) AS up_cents
      FROM per_stratum
    )
    SELECT stratum, n_treated, n_control, uplift_dollars,
           floor(CAST(SUM(CASE WHEN up_cents IS NOT NULL
                          THEN n_treated * up_cents END) OVER () AS DOUBLE)
                 * 100
                 / CAST(SUM(CASE WHEN up_cents IS NOT NULL
                            THEN n_treated END) OVER () AS DOUBLE)
                 + 0.5) / 10000.0 AS att_dollars
    FROM scored
"""
