"""Iterative graph analytics on DataFrames (beyond-reference surface,
companion to dedup.py's connected-components label propagation).

PageRank (Page, Brin, Motwani & Winograd 1999 — the public power-
iteration formulation) as pure DataFrame ops: no GraphX/GraphFrames
dependency, no RDDs. Each iteration is one join + one aggregation on the
edge list — the shape that scales to web-graph sizes because the shuffle
carries (node, contribution) pairs keyed by destination, with map-side
partial aggregation, and the rank vector is one row per NODE (orders of
magnitude smaller than the edge list it never re-shuffles with).

Lineage discipline: the rank frame is re-derived every iteration, so it
is ``localCheckpoint``'d on a cadence (same truncation as d6 / BPE) — a
50-iteration run must not analyze a 50-deep plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
    checkpoint_every: int = 1,
    ndigits: int = 8,
) -> DataFrame:
    """Power-iteration PageRank over an edge list; returns
    ``(node, rank)`` with ranks rounded to ``ndigits``.

    Semantics (the standard normalized formulation, sum(rank) == 1):

    - nodes = distinct(src) UNION distinct(dst); uniform init 1/N;
    - per iteration:
      ``r'(v) = (1-d)/N + d * (sum_{u->v} r(u)/outdeg(u)) + d * D/N``
      where ``D`` is the total rank mass of DANGLING nodes (no
      out-edges), redistributed uniformly — without it a bipartite or
      sink-heavy graph leaks mass every step.

    Plan shape per iteration: edges JOIN ranks on src (edge list never
    re-partitions — the rank side is the small one, broadcast by AQE
    when it fits), groupBy dst with partial aggregation, and the
    dangling mass as a map-only ``filter(dangling)`` + scalar
    aggregate over the rank vector itself — the dangling flag is
    computed ONCE at setup and rides the node frame, so no
    per-iteration join (and in particular no broadcast of the
    dangling-node set, which is O(N) on web graphs where 20-40% of
    nodes are sinks). The only broadcast frame is the 1-row dangling
    mass (the ml/metrics stat-frame idiom) — no scalar collect. Each
    iteration
    ends in a ``localCheckpoint`` materialization (the ONE driver
    action per iteration; default ``checkpoint_every=1``): deferring
    several iterations into one lazy wave stacks that many broadcast
    exchanges into a single plan, which measured WORSE (GC pressure
    from the nested broadcast tower) than paying one bounded job per
    iteration. Raise ``checkpoint_every`` only for tiny graphs.
    Deterministic up to float-sum order; compare rounded.

    Self-loops and parallel edges are honored as given (dedupe edges
    upstream if multiplicity is not meaningful). NULL endpoints are
    rejected — an unkeyed edge is a data bug, not a graph feature.
    """
    if not 0 < damping < 1:
        raise ValueError(f"pagerank: damping must be in (0,1), got {damping}")
    if n_iter < 1:
        raise ValueError(f"pagerank: n_iter must be >= 1, got {n_iter}")
    if checkpoint_every < 1:
        raise ValueError(
            f"pagerank: checkpoint_every must be >= 1, got {checkpoint_every}"
        )
    # hash-partition the edge list by src ONCE and cache: the cached
    # partitioning is what lets every iteration's edges-join-ranks run
    # with NO exchange on either side (ranks is node-partitioned below,
    # and cached/checkpointed frames keep their outputPartitioning)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).repartition(
        "src"
    ).cache()
    # the NULL check is the FIRST action, so it also fills the cache —
    # the (possibly expensive) upstream edge build is paid exactly once
    if e.filter(F.col("src").isNull() | F.col("dst").isNull()).limit(1).count():
        e.unpersist()
        raise ValueError("pagerank: NULL edge endpoints")
    # dangling flag computed ONCE and fused into the node frame: a
    # node is dangling iff it never appears as a src. One setup join
    # against the distinct-src set (plain shuffled join, unhinted —
    # both sides are O(N), so no forced broadcast); thereafter every
    # iteration reads the flag off the rank vector for free. The final
    # repartition("node") pins the partitioning every per-iteration
    # node-keyed join reuses exchange-free.
    srcs = e.select("src").distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .join(
            srcs.select(F.col("src").alias("node"), F.lit(False).alias("dangling")),
            "node",
            "left",
        )
        .select("node", F.coalesce("dangling", F.lit(True)).alias("dangling"))
        .repartition("node")
        .cache()
    )
    n = nodes.count()
    if n == 0:
        e.unpersist()
        nodes.unpersist()
        raise ValueError("pagerank: empty graph (edge frame has no rows)")
    outdeg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    # degree rides the cached edge list — src-partitioned groupBy and
    # join, so building ew adds no exchange; paid ONCE, not per iteration
    ew = e.join(outdeg, "src").select("src", "dst", "deg").cache()
    d = float(damping)
    base = (1.0 - d) / n
    # Loop-scoped session tuning (session.loop_session, the ml/bpe.py
    # idiom): every iteration is a FIXED-SHAPE micro-job — one
    # partial-aggregated shuffle keyed to the rank vector's own
    # partitioning, joins exchange-free by co-partitioning — so AQE's
    # per-stage re-planning only adds a driver job per exchange with
    # nothing left to re-plan, and the shuffle partition count is
    # pinned to the node frame's OWN partitioning (input-derived, not
    # a constant). Measured at sf0.1: 9.7s -> 7.7s for the g1 entry.
    from ..session import adopt_frame, loop_session

    base_sess = edges.sparkSession
    with loop_session(
        ew, nodes, shuffle_partitions=nodes.rdd.getNumPartitions()
    ) as (_sess, (ew_l, nodes_l)):
        ranks = nodes_l.select("node", "dangling", F.lit(1.0 / n).alias("r"))
        for it in range(n_iter):
            # dangling mass: map-only filter over the rank vector +
            # scalar agg — no join, nothing O(N) is broadcast (the
            # 1-row result is)
            dang = (
                ranks.filter(F.col("dangling"))
                .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("__dm"))
            )
            contribs = (
                ew_l.join(ranks, ew_l["src"] == ranks["node"])
                .select(
                    F.col("dst").alias("node"),
                    (F.col("r") / F.col("deg")).alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("contrib"))
            )
            nxt = (
                nodes_l.join(contribs, "node", "left")
                .crossJoin(F.broadcast(dang))
                .select(
                    "node",
                    "dangling",
                    (
                        F.lit(base)
                        + F.lit(d) * F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.lit(d) * F.col("__dm") / F.lit(float(n))
                    ).alias("r"),
                )
            )
            if (it + 1) % checkpoint_every == 0 or it == n_iter - 1:
                nxt = nxt.localCheckpoint(eager=True)
            ranks = nxt
        out = adopt_frame(
            base_sess, ranks.select("node", F.round("r", ndigits).alias("rank"))
        )
    e.unpersist()
    ew.unpersist()
    nodes.unpersist()
    return out
