"""Distributed connected components: alternating large-star /
small-star (Kiveris et al. 2014, "Connected Components in MapReduce
and Beyond").

Why not plain min-label propagation? Propagation needs graph-DIAMETER
rounds — fine for shallow duplicate clusters, pathological for chained
near-dup families (docA~docB~docC~… chains are common in scraped
corpora: successive page revisions). The star operations contract
paths aggressively and converge in O(log² n) rounds regardless of
diameter, each round being two groupBy-min shuffles + two joins on the
edge list — no per-node adjacency gathers (no collect_list), so a
high-degree node never materializes its neighborhood in one task.

Per round (on the symmetric edge view):
  large-star(u): m = min(Γ(u) ∪ {u}); connect every STRICTLY LARGER
    neighbor v > u to m.
  small-star(u): over edges oriented v < u; m = min(Γ<(u) ∪ {u});
    connect u and every smaller neighbor to m.
Fixpoint = the edge set (canonical, deduped) stops changing; the graph
is then a star forest rooted at each component's minimum id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(e: DataFrame) -> DataFrame:
    """Undirected canonical form: (a, b) with a < b, deduped."""
    return (
        e.select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _checksum(e: DataFrame) -> tuple:
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # xor-fold: order-independent and cannot overflow (ANSI-safe)
        F.expr("bit_xor(xxhash64(a, b))").alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_rounds: int = 64
) -> DataFrame:
    """(node, component) for every node incident to an edge; component
    id = the minimum node id in the component."""
    nodes = (
        edges.select(F.col(src).cast("long").alias("node"))
        .unionByName(edges.select(F.col(dst).cast("long").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    e = _canon(
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
    ).localCheckpoint()
    prev = _checksum(e)
    converged = False
    for _ in range(max_rounds):
        sym = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        # large-star: every v > u attaches to min(Γ(u) ∪ {u})
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", F.col("u")).alias("m"))
        )
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        e1 = _canon(ls)
        # small-star: edges oriented big→small; u and all smaller
        # neighbors attach to the minimum
        o = e1.select(F.col("b").alias("u"), F.col("a").alias("v"))
        mins2 = o.groupBy("u").agg(F.min("v").alias("m"))
        ss = (
            o.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(
                mins2.select(F.col("u"), F.col("m").alias("v"))
            )
        )
        e = _canon(ss).localCheckpoint()
        cur = _checksum(e)
        if cur == prev:
            converged = True
            break
        prev = cur
    if not converged:
        # never silently emit labels from a non-star edge set
        raise RuntimeError(
            f"connected_components: no fixpoint within {max_rounds} rounds"
        )
    # star forest: canonical edges are (root, child); child → root
    child = e.select(F.col("b").alias("node"), F.col("a").alias("component"))
    return (
        nodes.join(child, "node", "left")
        .select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
    )
