"""Graph algorithms over edge-list DataFrames.

Connected components (the dedup clustering step) lives in
``operators.dedup.resolve_clusters``; this module holds the weighted
message-passing family, represented the only way that scales: the graph
IS the edge DataFrame, one round = one join + one keyed aggregate, and
iteration unrolls into a single lazy plan (no driver-side adjacency).

Determinism discipline: ranks are FIXED-POINT BIGINTs (scale 1e12), so
every operation is integer multiply / integer divide / integer sum —
exact, order-independent, overflow-checked by construction, and
replayable in ANSI SQL with `//`. A float PageRank cannot be hash-gated
across engines (distributed double sums are summation-order dependent);
the fixed-point form loses nothing a ranking cares about (1e-12
resolution) and makes the oracle a mechanical CTE unroll.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

PR_SCALE = 1_000_000_000_000  # 1e12 fixed-point


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iters: int = 3,
    damping_pct: int = 85,
) -> DataFrame:
    """Weighted PageRank, ``iters`` fixed rounds, damping as an integer
    percentage (85 = 0.85).

    r_{t+1}(j) = (100-d)%·S/n + d%·Σ_i r_t(i)·w_ij ÷ out_i   (all integer)

    Scale shape per round: the rank table (|V| rows) joins the edge list
    on src — an equi-join co-partitioned with the contributions groupBy
    on dst; nothing wider than (node, bigint) ever shuffles. Dangling
    nodes (no out-edges) keep only their teleport share — the standard
    simple variant; redistributing dangling mass would add one scalar
    aggregate per round.

    Overflow: r ≤ S = 1e12 and integer weights w with Σw per source ≤
    9e6 keep r·w < 9.2e18 (bigint max); asserted via the weight sum.

    Returns (id, rank_fp bigint, rank double = rank_fp / S).
    """
    if not (0 < damping_pct < 100):
        raise ValueError("damping_pct must be in (0, 100)")
    # The edge projection is MATERIALIZED once (eager localCheckpoint):
    # the unrolled rounds, the node set, and the out-weight table all
    # reference this subplan, and without the checkpoint the whole
    # upstream edge pipeline is REPLICATED into the plan per reference —
    # nation_trade_pagerank's 3-round plan carried 264 parquet scans /
    # 316 exchanges across 816 operators, and Catalyst+AQE re-planned
    # all of it every action. Round-13 A/B at sf0.1: checkpointed 2.5 s
    # warm / 3.3 s cold vs 3.7 s / 9.7 s uncheckpointed. (An earlier
    # round measured the opposite on a much smaller plan; the barrier
    # only pays once the replicated subtree is nontrivial — which an
    # aggregated edge list always is.) The checkpoint is edge-aggregate
    # sized (|E| post-groupBy), the same table every iterative graph
    # engine materializes.
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"),
        F.col(weight).cast("bigint").alias("w"),
    ).localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    # the overflow precondition the docstring promises: r ≤ PR_SCALE and
    # w ≤ ow, so r*w stays under 2^63 iff PR_SCALE * ow does for every
    # source. assert_true embeds the check in the out-weight aggregate
    # itself — zero extra jobs, fails the action with this message
    # instead of silently corrupting every rank.
    _ow_limit = 2**63 // PR_SCALE
    # assert_true returns NULL on pass, so the filter keeps every row —
    # but unlike a projected-then-dropped column (which Catalyst prunes
    # away, silently disabling the check), a filter predicate always
    # executes
    outw = (
        e.groupBy("src").agg(F.sum("w").alias("ow"))
        .filter(F.assert_true(
            F.col("ow") <= F.lit(_ow_limit),
            F.lit(f"pagerank: per-source weight sum exceeds {_ow_limit}; "
                  f"PR_SCALE*sum(w) would overflow bigint — rescale weights"),
        ).isNull())
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    # 1-row broadcast scalar (constant-append; see q11's note)
    base = nodes.crossJoin(F.broadcast(nn))
    ranks = base.select(
        "id", "n", F.expr(f"CAST({PR_SCALE} AS BIGINT) DIV n").alias("r")
    )
    teleport = f"CAST({100 - damping_pct} AS BIGINT) * {PR_SCALE} DIV (100 * n)"
    for _ in range(iters):
        contrib = (
            e.join(ranks.select(F.col("id").alias("src"), "r"), on="src")
            .join(outw, on="src")
            .select("dst", F.expr("r * w DIV ow").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .withColumnRenamed("dst", "id")
        )
        ranks = (
            base.join(contrib, on="id", how="left")
            .select(
                "id", "n",
                F.expr(
                    f"{teleport} + CAST({damping_pct} AS BIGINT) * "
                    f"coalesce(s, CAST(0 AS BIGINT)) DIV 100"
                ).alias("r"),
            )
        )
    return ranks.select(
        "id",
        F.col("r").alias("rank_fp"),
        (F.col("r").cast("double") / F.lit(float(PR_SCALE))).alias("rank"),
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iters: int = 3,
) -> DataFrame:
    """Synchronous weighted label propagation (Raghavan et al. 2007) —
    community detection with the same plan anatomy as ``pagerank``:
    ``iters`` unrolled rounds of one equi-join + one keyed aggregate +
    one per-node window, nothing iterative on the driver.

    Determinism (what makes it oracle-replayable): the graph is
    symmetrized with summed weights; labels start as the node's own id;
    each round every node adopts the neighbor label with the greatest
    summed edge weight, ties broken by LEXICOGRAPHICALLY SMALLEST label
    (classic LPA breaks ties randomly, which can never hash-gate).
    Rounds grow with community diameter, not graph size — 3-5 suffice
    for the dense-cluster graphs LPA is good at.

    Returns (id, community): the label each node converged to after
    ``iters`` rounds. Isolated nodes (no edges) are absent from the
    input by construction and so from the output.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"),
        F.col(weight).cast("bigint").alias("w"),
    )
    # materialized once for the same reason as pagerank's edge
    # projection: every unrolled round references it, and the caller's
    # whole edge pipeline would otherwise replicate into the plan
    und = (
        e.union(e.select(F.col("dst").alias("src"),
                         F.col("src").alias("dst"), "w"))
        .groupBy("src", "dst").agg(F.sum("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    labels = und.select("src").distinct().select(
        F.col("src").alias("id"), F.col("src").alias("lbl"))
    per_node = Window.partitionBy("nid").orderBy(
        F.col("tw").desc(), F.col("lbl").asc())
    for _ in range(iters):
        scores = (
            und.join(labels, und.dst == labels.id)
            .groupBy(F.col("src").alias("nid"), "lbl")
            .agg(F.sum("w").alias("tw"))
        )
        labels = (
            scores.withColumn("rn", F.row_number().over(per_node))
            .filter(F.col("rn") == 1)
            .select(F.col("nid").alias("id"), "lbl")
        )
    return labels.select("id", F.col("lbl").alias("community"))
