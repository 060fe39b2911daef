"""Link-analysis over document graphs: deterministic PageRank.

Corpus pipelines rank documents by graph centrality — over hyperlink
graphs (the original use), near-duplicate similarity graphs (pick the
most-connected canonical), or citation graphs — and the operator is
the same power iteration everywhere.

Determinism contract (the repo-wide cross-engine rules): per-node
contributions ``rank / out_degree`` are single IEEE divisions; the
per-target mass sum casts every contribution to DECIMAL(30,15) and
adds EXACTLY (order-independent — parallel partial aggregation cannot
perturb it, the same design as ``kmeans_train``'s centroid update);
ranks round only at output. An oracle replays whole iterations as
chained SQL CTEs, bit-for-bit (x73).

Plan shape per iteration: one broadcast-friendly join of the rank
table (|V| rows) onto the edge list + one groupBy(dst) — the edge
list is the only corpus-sized table and it shuffles ONCE on dst per
iteration, fixed-width rows. Iterations are a bounded driver loop
(rank state lives in a DataFrame, never on the driver). At 100 TB
scale you checkpoint the rank table every few iterations exactly as
``dedup_clusters`` does its frontier.

Scope: nodes/edges of the GIVEN graph; every node is expected to have
at least one out-edge (feed undirected graphs as both directions —
then no dangling mass exists by construction). Dangling nodes raise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iters: int = 2,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Power-iteration PageRank over an edge list.

    Output: ``(node, rank)`` with ``rank`` rounded to 6 — ranks sum
    to ~1 over the graph's nodes.
    """
    if iters < 1:
        raise ValueError("pagerank: iters must be >= 1")
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()  # bounded: |V| of the given graph, a scalar
    if n == 0:
        raise ValueError("pagerank: empty edge list")
    deg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    if nodes.join(deg, nodes["node"] == deg["src"], "left_anti").limit(1).count():
        raise ValueError(
            "pagerank: dangling node (no out-edges) — feed undirected "
            "graphs as both directions"
        )
    base = (1.0 - damping) / float(n)

    ranks = nodes.select("node", F.lit(1.0 / float(n)).alias("rank"))
    for _ in range(iters):
        contribs = (
            e.join(deg, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("outdeg").cast("double")).alias("c"),
            )
        )
        gathered = contribs.groupBy("node").agg(
            F.expr(
                "CAST(SUM(CAST(c AS DECIMAL(30,15))) AS DOUBLE)"
            ).alias("mass")
        )
        # every node has an out-edge (checked) and, for undirected
        # inputs, an in-edge — but keep the left join + zero-mass
        # coalesce so a directed sink still receives its base rank
        ranks = nodes.join(gathered, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce("mass", F.lit(0.0))
            ).alias("rank"),
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))
