"""Graph operators over relational co-occurrence graphs (engine
extension; the reference has no graph analytics — SURVEY.md §2 covers
joins/aggregations, and this family generalizes them to iterative
message passing, the PageRank/label-propagation shape every large-scale
entity-resolution or link-analysis pipeline needs).

Everything is DataFrame-iterative: the per-iteration state lives in a
DataFrame, updates are keyed joins + aggregations (shuffle on the node
key), and nothing is collected to the driver — the GraphX/Pregel shape
without leaving Spark SQL. Ranks use the quantized-integer-sum trick
(FLOOR(x*1e12+0.5) summed as DECIMAL(38,0)) so every iteration is
bit-identical across engines/partitionings: float sums are
order-dependent, integer sums are not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Contribution quantum — 1e-12, same as the k-means centroid means.
_Q = 1e12


def cooccurrence_edges(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """Undirected co-occurrence edges: items sharing a group value (parts
    in the same order, docs with the same fingerprint, ...) get an edge.

    Self-join on the group key (one shuffle), deduplicated, then
    symmetrized — output has (src, dst) in BOTH directions, the layout
    message-passing wants. At scale, cap pathological group sizes first
    (a 10k-item group contributes 50M pairs) the same way the dedup
    operators cap posting lists.
    """
    a = df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("src"))
    b = df.select(F.col(group_col).alias("__g"), F.col(item_col).alias("dst"))
    pairs = (
        a.join(b, "__g")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    return pairs.unionByName(pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def pagerank(
    edges: DataFrame, iters: int = 2, damping: float = 0.85
) -> DataFrame:
    """PageRank on a symmetric edge list, ``iters`` synchronous
    iterations, uniform init 1/N.

    Per iteration: contribution r_u/deg_u flows along each edge,
    quantized to an integer number of 1e-12 quanta BEFORE the per-node
    sum (exact DECIMAL arithmetic — deterministic under any partitioning
    or engine), then r_v = (1-d)/N + d * (sum/1e12). A symmetric graph
    has no dangling nodes, so no dangling-mass redistribution term.

    Scale shape: state is one (node, rank) DataFrame; each iteration is
    one broadcast-free equi-join edges⋈ranks on src (pre-partition both
    by the node key to make it shuffle-free) + one groupBy dst. No
    driver-side state at any size.

    Output: (node, deg, pagerank).
    """
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("deg")
    )
    n = deg.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    ranks = deg.crossJoin(F.broadcast(n)).select(
        "node", "deg", "__n", (F.lit(1.0) / F.col("__n").cast("double")).alias("r")
    )
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .select(
                F.col("dst").alias("node"),
                F.floor(
                    (F.col("r") / F.col("deg").cast("double")) * F.lit(_Q)
                    + F.lit(0.5)
                ).cast("decimal(38,0)").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__s"))
        )
        ranks = (
            deg.join(contrib, "node")
            .crossJoin(F.broadcast(n))
            .select(
                "node",
                "deg",
                "__n",
                (
                    F.lit(1.0 - damping) / F.col("__n").cast("double")
                    + F.lit(damping) * (F.col("__s").cast("double") / F.lit(_Q))
                ).alias("r"),
            )
        )
    return ranks.select("node", "deg", F.col("r").alias("pagerank"))
