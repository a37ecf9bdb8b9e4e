"""Connected components over an edge list — duplicate-cluster resolution.

The step between near-dup PAIR generation (MinHash-LSH + exact verify,
``queries/text.py``) and the corpus-level keep decision: pairs say "A ~ B",
but a training pipeline needs the transitive closure — "A, B, C are one
duplicate cluster; keep exactly one representative". Pairwise and cluster
semantics genuinely differ: on the pair set {(1,3), (2,3)} the pairwise
drop-higher rule keeps {1, 2} (both appear only as the lower id) while
cluster resolution keeps {1} (all three are one component). Both are used in
production dedup; this module provides the cluster form.

Algorithm: min-label propagation with pointer jumping, expressed as plain
DataFrame joins — per round, ``label(v) <- min(label(v), min of neighbor
labels)`` followed by one ``label <- label(label)`` hop. Labels are
monotonically non-increasing and bounded below by the component minimum, so
the fixpoint is exact (label constant across every edge => constant per
component, and each component's minimum keeps its own id). The pointer-jump
halves remaining path lengths, so convergence is O(log diameter) rounds
(the hash-to-min family, cf. Kiveris et al., "Connected Components in
MapReduce and Beyond", 2014) rather than O(diameter) for plain propagation.

Scale notes (100 TB / 1000 executors):
- The iteration runs on the derived PAIR graph — orders of magnitude smaller
  than the corpus (only verified near-dups appear), never on the documents.
- ``localCheckpoint()`` per round truncates join lineage; without it the
  plan doubles every round and analysis time blows up by round ~15.
- Each round is two shuffle-joins + one partial-aggregated groupBy on
  (id/label) longs — no payload columns ride through the loop.
- The convergence probe is a count on the already-materialized checkpoint,
  not a recomputation of the round's joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 50
) -> DataFrame:
    """Label every node reachable through ``edges`` with its component's
    minimum node id. Returns ``(id, label)`` — one row per distinct node.

    Edges are treated as undirected; self-loops and duplicate/reversed
    edges are tolerated. Raises ``RuntimeError`` if the fixpoint is not
    reached within ``max_iter`` rounds (pointer jumping makes the bound
    log-scale: 50 rounds covers any graph that fits on disk) — an explicit
    failure beats silently returning half-merged clusters.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d")).where(
        F.col("_s") != F.col("_d")
    )
    sym = e.union(e.select(F.col("_d").alias("_s"), F.col("_s").alias("_d"))).distinct()
    sym = sym.localCheckpoint()  # reused every round: materialize once
    labels = (
        sym.select(F.col("_s").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint()

    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "_s"), "_s")
            .select(F.col("_d").alias("id"), "label")
            .groupBy("id")
            .agg(F.min("label").alias("_nbr"))
        )
        prop = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("label").alias("_old"),
            F.least("label", F.coalesce("_nbr", "label")).alias("_mid"),
        )
        # pointer jump through the previous mapping: label values are always
        # node ids (inductively: mins of node ids), so the lookup always hits
        ptr = labels.select(F.col("id").alias("_mid"), F.col("label").alias("_jmp"))
        snap = (
            prop.join(ptr, "_mid", "left")
            .select("id", "_old", F.least("_mid", F.coalesce("_jmp", "_mid")).alias("label"))
            .localCheckpoint()
        )
        labels = snap.select("id", "label")
        if snap.where(F.col("label") != F.col("_old")).count() == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def triangle_stats(pairs: DataFrame, a: str = "doc_a", b: str = "doc_b") -> DataFrame:
    """Per-node triangle counts over the undirected graph given as
    deduplicated ``a < b`` pairs — distributed triangle enumeration by
    ORIENTED wedge join (Suri & Vassilvitskii, "Counting Triangles and the
    Curse of the Last Reducer", WWW'11).

    Each undirected edge is directed from the endpoint with smaller
    (degree, id) to the larger, so every triangle is enumerated exactly
    once at its lowest-degree corner and total wedge volume is
    Σ out-deg² = O(m^1.5) worst-case — a plain id-orientation would
    enumerate a k-star hub's k² wedges. Orientation choice never changes
    WHICH triangles exist, only the join volume, so an id-oriented oracle
    validates this implementation value-for-value.

    Returns ``(node, degree, triangles)`` with one row per node (triangles
    = 0 for nodes on no triangle). Three hash joins on fixed-width keys;
    callers should checkpoint ``pairs`` if deriving it is expensive.
    """
    sym = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst")).unionAll(
        pairs.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    keyed = (
        pairs.join(deg.select(F.col("src").alias(a), F.col("degree").alias("_da")), a)
        .join(deg.select(F.col("src").alias(b), F.col("degree").alias("_db")), b)
        .select(
            F.struct(F.col("_da").alias("d"), F.col(a).alias("n")).alias("ka"),
            F.struct(F.col("_db").alias("d"), F.col(b).alias("n")).alias("kb"),
        )
    )
    oriented = keyed.select(
        F.when(F.col("ka") < F.col("kb"), F.col("ka")).otherwise(F.col("kb")).alias("lo"),
        F.when(F.col("ka") < F.col("kb"), F.col("kb")).otherwise(F.col("ka")).alias("hi"),
    )
    w1 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
    w2 = oriented.select(F.col("lo").alias("u"), F.col("hi").alias("w"))
    wedges = w1.join(w2, "u").where(F.col("v") < F.col("w"))
    closing = oriented.select(F.col("lo").alias("v"), F.col("hi").alias("w"))
    tri = wedges.join(closing, ["v", "w"])
    corners = (
        tri.select(F.col("u.n").alias("node"))
        .unionAll(tri.select(F.col("v.n").alias("node")))
        .unionAll(tri.select(F.col("w.n").alias("node")))
    )
    pernode = corners.groupBy("node").agg(F.count(F.lit(1)).alias("triangles"))
    return (
        deg.select(F.col("src").alias("node"), "degree")
        .join(pernode, "node", "left")
        .select(
            "node",
            F.col("degree").cast("bigint").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("bigint").alias("triangles"),
        )
    )
