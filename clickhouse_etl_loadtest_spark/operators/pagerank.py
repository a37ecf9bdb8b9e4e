"""Fixed-point PageRank over a DataFrame edge list — iterative graph
centrality as a driver loop of joins + aggregates (the Pregel/GraphX shape
re-expressed in plain DataFrame ops, same family as operators/graph.py's
pointer-jumping connected components and operators/logreg.py's gradient
loop).

Bit-stability contract: every quantity is a BIGINT in fixed-point units of
1e-12 (``SCALE``), and every operation is integer multiply / integer divide
(``div`` in Spark ≡ ``//`` in DuckDB for non-negative operands) / integer
SUM. Floating point appears nowhere in the iteration, so the trajectory is
exactly order-independent and engine-identical — the property the
cross-engine value oracle needs, and stronger than the DECIMAL-sum
discipline (no decimal→double cast at any boundary). Truncation loses less
than one unit (1e-12) per div, so total rank mass stays within
``edges + 2·nodes`` units of SCALE per iteration (asserted in tests).

Per iteration: ONE shuffle — join ranks to the (src, dst, deg)-annotated
edge list on src (both sides hash-partitioned on a long key), then a
map-side-combined SUM by dst. State is (node, bigint): at 100 TB the edge
list is the near-dup candidate graph (band-geometry bounded, two longs per
row), never the corpus, and the rank table is one long per graph node. The
only driver-side scalar is the node count (one number, the logreg-``n``
precedent). For many more iterations you would checkpoint the rank table
every few rounds to cap lineage; at the fixed depth here the chain is
shallow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 1e12: rank unit = 1e-12
DAMPING_NUM, DAMPING_DEN = 85, 100  # d = 0.85 as an exact ratio


def pagerank_fixed_point(
    edges: DataFrame, iterations: int = 4, weight: str | None = None
) -> DataFrame:
    """PageRank on the UNDIRECTED graph given as symmetric ``(src, dst)``
    BIGINT edges (callers pass both directions; no dangling nodes exist in
    a symmetric graph so no mass-redistribution term is needed).

    r0(v)   = SCALE div N
    r_{t+1}(v) = (15·(SCALE div 100)) div N
               + (85 · Σ_{u∈nbrs(v)} (r_t(u)·w(u,v)) div W(u)) div 100

    where w ≡ 1 and W(u) = deg(u) in the unweighted form, or ``weight``
    names a positive BIGINT edge-weight column and W(u) = Σ_v w(u,v)
    (the strength). Each contribution is ≤ r_t(u), so the per-node sum is
    bounded by total rank mass (≤ SCALE) — no overflow at any graph size
    PROVIDED weights stay ≤ ~9e6: the intermediate ``r_t(u)·w`` product must
    fit int64, and r_t(u) can approach SCALE (1e12) on a star hub. In-repo
    callers pass milli-Jaccard weights ≤ 1000; callers with larger weights
    must pre-normalize (divide by gcd or rescale to ≤ 1e6).

    Returns (node, rank_fp BIGINT, rank DOUBLE = rank_fp/1e12); empty input
    yields an empty result with the same schema.
    """
    w = F.col(weight).cast("bigint") if weight else F.lit(1).cast("bigint")
    edges = edges.select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
        w.alias("w"),
    )
    wsum = edges.groupBy("src").agg(F.sum("w").alias("wsum"))
    # Annotate each edge with its source's total weight ONCE, and
    # checkpoint so the (possibly expensive) upstream edge derivation
    # never re-runs per iteration.
    ed = edges.join(wsum, "src").localCheckpoint()
    nodes = ed.select(F.col("src").alias("node")).distinct().localCheckpoint()
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node",
            F.lit(None).cast("bigint").alias("rank_fp"),
            F.lit(None).cast("double").alias("rank"),
        )
    base = (DAMPING_DEN - DAMPING_NUM) * (SCALE // DAMPING_DEN) // n
    r = nodes.withColumn("r", F.lit(SCALE // n).cast("bigint"))
    for _ in range(iterations):
        r = (
            ed.join(r.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr("(r * w) div wsum").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("node"),
                (F.lit(base) + F.expr(f"({DAMPING_NUM} * s) div {DAMPING_DEN}"))
                .cast("bigint")
                .alias("r"),
            )
        )
    return r.select(
        "node",
        F.col("r").alias("rank_fp"),
        (F.col("r").cast("double") / F.lit(float(SCALE))).alias("rank"),
    )
