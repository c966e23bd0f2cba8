"""Distributed graph analytics on pair tables: triangle counting with
degree-ordered orientation.

Triangles (three mutually co-occurring items) are the local-density
primitive behind clustering coefficients, community seeding, and
recommendation diversity checks. The naive count joins the edge list to
itself twice on raw node ids — fine until a hub node appears, then one
join key owns O(d_hub²) wedge rows and a single reducer melts.

The scale-safe formulation orients every undirected edge from its
lower-(degree, id) endpoint to its higher one. The orientation is
acyclic and total, every triangle keeps exactly ONE node with
out-degree 2 (its order-minimal vertex), and the wedge fan-out per node
is bounded by its ORIENTED out-degree — O(√m) for any graph with m
edges (a hub of degree d > √m points most of its edges inward, because
a neighbor with smaller degree sorts first). Wedges are then closed
with one hash join back to the oriented edges. Total work O(m^1.5)
worst-case, evenly hash-partitioned — the standard distributed triangle
recipe (cf. Suri & Vassilvitskii, "Counting Triangles and the Curse of
the Last Reducer", WWW'11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected edge list → deduped canonical (x < y) pairs; self
    loops dropped."""
    x, y = F.col(src), F.col(dst)
    return (
        edges.filter(x != y)
        .select(
            F.least(x, y).alias("x"),
            F.greatest(x, y).alias("y"),
        )
        .distinct()
    )


def count_triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """One row: (n_nodes, n_edges, n_triangles) for the undirected graph
    in ``edges`` (any orientation / duplication on input — canonicalized
    first).

    The canonical edge frame is ``cache()``d (it feeds the degree
    aggregate, the orientation join, and the edge count). The returned
    frame is lazy, so the cache CANNOT be dropped here — the CALLER owns
    its lifetime: after materializing the result in a long-lived
    session, release it with
    ``spark.catalog.clearCache()`` or by unpersisting via
    ``canonical_edges(edges, src, dst).unpersist()`` (same logical plan
    → same cache entry). One-shot query runs (the registry/bench path)
    drop it with the session."""
    e = canonical_edges(edges, src, dst).cache()

    deg = (
        e.select(F.col("x").alias("n"))
        .unionAll(e.select(F.col("y").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )

    # Orient each edge from its (deg, id)-smaller endpoint to the larger.
    dx = deg.select(F.col("n").alias("x"), F.col("deg").alias("_dx"))
    dy = deg.select(F.col("n").alias("y"), F.col("deg").alias("_dy"))
    oriented = (
        e.join(dx, "x")
        .join(dy, "y")
        .select(
            F.when(
                (F.col("_dx") < F.col("_dy"))
                | ((F.col("_dx") == F.col("_dy")) & (F.col("x") < F.col("y"))),
                F.struct(F.col("x").alias("s"), F.col("y").alias("t")),
            )
            .otherwise(F.struct(F.col("y").alias("s"), F.col("x").alias("t")))
            .alias("o")
        )
        .select("o.s", "o.t")
    )

    # Wedges from each node's oriented out-neighbors (t1 before t2 in the
    # orientation order == plain id order is NOT enough: use the same
    # (deg, id) order, carried by re-joining degrees on the endpoints).
    dt = deg.select(F.col("n").alias("t"), F.col("deg").alias("_dt"))
    out = oriented.join(dt, "t").select("s", "t", "_dt")
    w1 = out.select(F.col("s"), F.col("t").alias("b"), F.col("_dt").alias("_db"))
    w2 = out.select(F.col("s"), F.col("t").alias("c"), F.col("_dt").alias("_dc"))
    wedges = (
        w1.join(w2, "s")
        .filter(
            (F.col("_db") < F.col("_dc"))
            | ((F.col("_db") == F.col("_dc")) & (F.col("b") < F.col("c")))
        )
        .select(F.col("b").alias("s"), F.col("c").alias("t"))
    )

    tri = wedges.join(oriented, ["s", "t"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    counts = e.agg(F.count(F.lit(1)).alias("n_edges"))
    nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    return nodes.crossJoin(counts).crossJoin(tri)  # three 1-row frames
