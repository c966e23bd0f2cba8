"""Cluster formation over near-duplicate pairs: distributed connected
components, turning a pair list (from any of the dedup operators) into
(doc → cluster, canonical representative) assignments.

Why this exists: every near-dedup operator in :mod:`llmdata.dedup`
emits *pairs* (a, b, similarity). A real dedup pass must then pick ONE
survivor per transitively-connected group — A~B and B~C must collapse
to a single cluster even when A and C were never directly paired.
That is connected components on the pair graph.

Scale design:
- The algorithm is min-label propagation: every node starts labelled
  with itself; each round, a node adopts the smallest label among
  itself and its neighbours. One round = one equality join
  (edges ⋈ labels) + one hash aggregate (min per node) — both plain
  shuffles on the node id, no driver-side graph state, no all-pairs
  anything. Each round also pointer-jumps (component := its
  component's component — path halving), so convergence is
  O(log diameter)-ish rather than O(diameter); near-dup clusters are
  short-diameter anyway (members all overlap the same content), but
  the halving makes pathological chain graphs safe too. The
  star-contraction algorithm (Kiveris et al., "Connected Components
  in MapReduce and Beyond") is the further upgrade path for graphs
  with billions of edges per component.
- Iterative DataFrame loops grow lineage linearly; each round persists
  its labels and truncates lineage with ``localCheckpoint`` so the
  plan stays O(1) deep. (On a real cluster with fault-tolerance
  requirements, swap for ``checkpoint()`` + a checkpoint dir.)
- Convergence detection is an aggregate, not a diff-join: labels only
  ever decrease, so the exact sum of labels is strictly monotone and
  ``sum(old) == sum(new)`` iff the round changed nothing. The sum is
  taken in DECIMAL(38,0) so it is exact at any node count.

Reference parity: the reference notebook has no clustering step (it
dedups exact duplicates only, Sales_forecast_pyspark.py:296-316); this
is part of the LLM-data extension surface (SURVEY.md §7 step 9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _label_sum(labels: DataFrame) -> int:
    row = labels.agg(F.sum(F.col("component").cast("decimal(38,0)")).alias("s")).first()
    return int(row["s"]) if row["s"] is not None else 0


def connected_components(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of the undirected graph given by ``pairs``.

    Returns ``(node, component)`` where ``component`` is the smallest
    node id in the node's component — deterministic, so downstream
    canonical-survivor selection is reproducible run to run.

    Only nodes that appear in at least one pair are returned
    (singletons have no dedup decision to make).
    """
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )
    prev_sum = _label_sum(labels)
    for _ in range(max_iter):
        # Messages: each node offers its current label to every neighbour;
        # a node keeps the min of its own label and all offers.
        offers = edges.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "component")
        stepped = (
            labels.union(offers)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # Pointer jumping (path halving): follow the label one more hop —
        # component := label(component). Labels are monotone (label(x) ≤ x,
        # and every component value is itself a node), so this only ever
        # shrinks labels and turns O(diameter) convergence into O(log n):
        # each round both spreads labels one edge-hop AND halves the
        # remaining pointer chains. One extra self-join on the node id.
        parents = stepped.select(
            F.col("node").alias("component"), F.col("component").alias("parent")
        )
        new_labels = (
            stepped.join(parents, "component", "left")
            .select("node", F.coalesce("parent", "component").alias("component"))
            .localCheckpoint()
        )
        new_sum = _label_sum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "the pair graph has a longer diameter than dedup clusters "
            "should — raise max_iter or switch to star-contraction."
        )
    edges.unpersist()
    return labels


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """Cluster assignment for every doc in ``pairs``: the transitive
    closure of the near-dup relation, with the min-id member as the
    canonical survivor.

    Output: ``(doc_id, cluster_id, cluster_size, is_canonical)``,
    sorted — a drop-in "which docs do I keep / drop" table: keep rows
    with ``is_canonical``, drop the rest.
    """
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_canonical"),
        )
        .orderBy("cluster_id", "doc_id")
    )


def cluster_aware_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    val_pct: int = 10,
    salt: str = "split",
) -> DataFrame:
    """Leakage-free train/val assignment: every document is split by
    the md5 hash of its DEDUP CLUSTER id (its own id when unclustered),
    so a near-dup cluster lands wholly in one split. Splitting doc-wise
    instead would put near-copies of training documents in the
    validation set — the eval-contamination failure mode benchmark
    decontamination guards against, reproduced inside your own data.

    ``clusters`` is a ``dedup_clusters`` output (only clustered docs
    need rows; everything else splits by its own id). Deterministic and
    engine-reproducible (md5(salt:unit)); one left join on the doc id,
    no shuffle beyond it. Returns the input plus ``split_unit`` and
    ``split`` ('train' / 'val', ~``val_pct``% of UNITS in val)."""
    units = clusters.select(
        F.col(id_col), F.col("cluster_id").alias("_cl")
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col("split_unit").cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long") % 100
    return (
        df.join(units, id_col, "left")
        .withColumn("split_unit", F.coalesce(F.col("_cl"), F.col(id_col)))
        .drop("_cl")
        .withColumn(
            "split",
            F.when(bucket < val_pct, F.lit("val")).otherwise(F.lit("train")),
        )
    )
