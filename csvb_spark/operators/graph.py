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

Scope: nodes/edges of the GIVEN graph. Dangling nodes (no out-edges —
directed sinks) get the standard treatment: their rank mass
redistributes uniformly over all nodes each iteration, via one extra
scalar aggregate (a 1-row DECIMAL-exact sum, broadcast onto the rank
update — never a driver collect). Undirected graphs fed as both
directions have no dangling mass; the term is exactly 0.0 and the
arithmetic is bit-identical to the mass-only update (x73's oracle
relies on this).
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
        # dangling (out-degree-less) nodes redistribute their rank
        # uniformly — a 1-row DECIMAL-exact scalar, broadcast into the
        # update. With no dangling nodes this is exactly 0.0 and
        # `mass + 0.0` is bit-identical to `mass` for the non-negative
        # masses PageRank produces — the oracle's mass-only arithmetic
        # still replays undirected graphs exactly.
        dang = (
            ranks.join(deg.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(
                F.expr(
                    "CAST(COALESCE(SUM(CAST(rank AS DECIMAL(30,15))), 0)"
                    " AS DOUBLE)"
                ).alias("dmass")
            )
        )
        ranks = (
            nodes.join(gathered, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("mass", F.lit(0.0))
                        + F.col("dmass") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        # the dangling scalar makes each iteration consume `ranks`
        # TWICE (contribs + dang), so unbroken lineage doubles per
        # iteration; checkpoint the |V|-row rank frontier like
        # dedup_clusters does its labels (lazy: materializes on first
        # use, one copy per iteration, plan stays constant-size)
        ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.round("rank", 6).alias("rank"))
