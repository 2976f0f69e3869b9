"""Connected components over near-duplicate pair graphs.

Pair-producing dedup operators (minhash LSH, simhash, n-gram Jaccard,
embedding near-dup) emit EDGES; the dedup action needs GROUPS — every
doc labeled with its duplicate-cluster representative so one survivor
per cluster is kept. Components of the pair graph are exactly those
clusters (duplicate-of is transitively closed at web scale: A~B, B~C
usually means A,C are copies of the same artifact).

Algorithm: iterative min-label propagation with path halving — each
round every node takes the smallest component id among {itself, its
neighbors' labels, its label's label}. The pointer-jumping term halves
label-chain depth per round, so convergence is O(log n) rounds even on
path-shaped graphs (near-dup clusters are usually diameter <= 3 and
finish in 2-3). This is the standard MapReduce/GraphX CC shape
(Kiveris et al.'s large-star/small-star family) expressed as DataFrame
joins.

The 100 TB story: each round is two hash joins + one aggregation, all
keyed on node/label ids — balanced keys, broadcast-free, no global
structure. State between rounds is ONE (node, component) frame,
``localCheckpoint``-ed so the plan does not grow with iterations (the
classic iterative-DataFrame lineage explosion). Convergence is
detected by a changed-label count that rides the checkpoint job as an
``Observation`` — zero extra actions or joins per round. The result
is the TRUE components — a pure function of the edge set, independent
of iteration order, partitioning, or cluster size — which is what
makes a SQL oracle possible (DuckDB replays it as recursive-CTE
reachability and must agree bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_l",
    dst: str = "id_r",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected pair graph with its
    component representative (the component's smallest node id).

    Returns (``node``, ``component``) for every node with at least one
    edge to a DIFFERENT node. Self-loops are discarded before the node
    set is derived — a doc paired only with itself carries no duplicate
    evidence and is absent from the output, exactly like a doc in no
    pair at all. Raises if ``max_iter`` rounds do not converge (a
    pathological chain longer than 2^max_iter nodes — not a dedup
    graph).
    """
    spark = edges.sparkSession
    und = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    und = und.filter(F.col("u") != F.col("v")).distinct()
    und = und.localCheckpoint(eager=True)

    labels = und.select(F.col("u").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    labels = labels.localCheckpoint(eager=True)

    from pyspark.sql import Observation

    for it in range(max_iter):
        # smallest neighbor label per node; carry the old label so the
        # convergence check RIDES the checkpoint job (an Observation)
        # instead of costing a separate join+count action per round
        neigh = (
            und.join(labels, und["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("component").alias("_nc"))
            .withColumnRenamed("u", "node")
        )
        stepped = labels.join(neigh, "node", "left").select(
            "node",
            F.col("component").alias("_old"),
            F.least("component", "_nc").alias("component"),
        )
        # path halving: component <- label(component)
        parent = stepped.select(
            F.col("node").alias("_p_node"), F.col("component").alias("_p_comp")
        )
        halved = stepped.join(
            parent, stepped["component"] == parent["_p_node"], "left"
        ).select(
            "node",
            "_old",
            F.least("component", "_p_comp").alias("component"),
        )
        obs = Observation(f"cc_round_{it}")
        halved = halved.observe(
            obs,
            F.coalesce(
                F.sum((F.col("component") != F.col("_old")).cast("long")), F.lit(0)
            ).alias("changed"),
        )
        labels = halved.select("node", "component").localCheckpoint(eager=True)
        if int(obs.get["changed"]) == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )


def dedup_survivors(
    edges: DataFrame,
    src: str = "id_l",
    dst: str = "id_r",
) -> DataFrame:
    """Resolve a near-dup pair graph to per-doc verdicts: (``node``,
    ``component``, ``is_survivor``) for every doc in some pair —
    exactly one survivor (the smallest id) per duplicate cluster. Docs
    in no pair are absent (they trivially survive); anti-join the
    corpus against the non-survivors to apply the dedup."""
    cc = connected_components(edges, src=src, dst=dst)
    return cc.withColumn("is_survivor", F.col("node") == F.col("component"))
