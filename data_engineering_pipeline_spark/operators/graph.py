"""Iterative graph operators on DataFrames: connected components by
min-label propagation — the step that turns pairwise near-duplicate
PAIRS into duplicate CLUSTERS (pick one canonical doc per component).

Each iteration is one distributed join+aggregate (labels against the
bidirectional edge list); labels monotonically decrease to the
component's minimum vertex id, converging in O(component diameter)
iterations — near-dup clusters are shallow (stars/chains of a few
docs), so a handful of iterations suffices at any corpus size. The
driver loop only inspects a changed-row count per iteration, observed
as a metric on the materialization job itself (no data collected, no
extra job)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) with component = min vertex id reachable.
    `edges` may be directed pairs; they are symmetrized here. Vertices
    with no edges keep themselves as component."""
    both = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).unionByName(
        edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    ).distinct()
    # Materialize the edge list ONCE: it is joined every iteration, and
    # without truncation the (possibly expensive) pair-generation plan
    # upstream re-executes per round — measured 5.9 s -> 4.2 s on the
    # minhash-pair graph at sf0.1 (dedup-keep-best end to end).
    both = both.localCheckpoint(eager=True)

    labels = vertices.select(
        F.col(id_col).alias("v"), F.col(id_col).alias("component")
    )
    converged = False
    for i in range(max_iter):
        neighbor_min = (
            both.join(labels, both.a == labels.v)
            .groupBy(F.col("b").alias("v2"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.v == F.col("v2"), "left")
            .select(
                "v",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                (F.col("nbr_min") < F.col("component")).alias("__chg"),
            )
        )
        # Truncate lineage each iteration (localCheckpoint): without it
        # the plan doubles per round and analysis time, not compute,
        # becomes the bottleneck. On a cluster with a checkpoint dir,
        # checkpoint() gives the fault-tolerant variant.
        #
        # The convergence check rides the SAME materialization job via
        # observe() — one job per iteration, not a checkpoint job plus a
        # count job (CollectMetricsExec accumulates map-side during the
        # checkpoint's action; no extra pass, no data to the driver).
        obs = Observation(f"cc_changed_{i}")
        updated = updated.observe(
            obs, F.sum(F.col("__chg").cast("long")).alias("n_changed")
        ).localCheckpoint(eager=True)
        labels = updated.drop("__chg")
        if not obs.get["n_changed"]:  # None (all-null) or 0 -> converged
            converged = True
            break
    if not converged:
        # r9 review: exhausting max_iter without convergence means some
        # component's labels are only PARTIALLY propagated — the output
        # would silently split one component into several, which for
        # leakage_safe_split puts near-duplicates astride the
        # train/eval boundary (the exact bug the operator exists to
        # prevent). A component needs ~diameter iterations; fail loudly.
        raise ValueError(
            f"connected_components did not converge in {max_iter} "
            "iterations (a component's diameter exceeds max_iter); "
            "raise max_iter"
        )
    return labels.select(F.col("v").alias(id_col), "component")


def pagerank_quantized(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
    iters: int = 3,
    scale: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
) -> DataFrame:
    """Weighted PageRank with EXACT integer arithmetic: ranks are
    scaled longs, per-edge contributions use integer floor division,
    and the damping factor is a rational (85/100) — every step is
    exact int64 math, so a fixed-iteration run is bit-identical on
    any engine/partitioning and verifiable by a SQL oracle with the
    iterations unrolled as CTE layers. (Float PageRank sums are
    order-sensitive; quantization is the same device the LM
    cross-entropy oracle uses.)

    p0(v) = scale/N;  p_{t+1}(v) = base + damp * sum_u p_t(u)*w(u,v)/W(u)
    with base = (damp_den-damp_num)*scale/damp_den/N, all divisions
    floored. Nodes = every endpoint of an edge; dangling mass is not
    redistributed (documented contract — matches the oracle).

    Scale: each iteration is one broadcast/shuffle join of the rank
    frame (N rows) with the edge list plus a groupBy(dst) — the
    textbook distributed PR step. The edge list (with its out-weight
    join) is localCheckpointed ONCE so iterations reuse the
    materialized edges instead of re-running the upstream build
    (e.g. the co-purchase self-join) through lazy lineage every
    round — measured 18.9 s -> ~8 s at sf0.1 (the CC lesson)."""
    w = F.col(weight_col) if weight_col else F.lit(1)
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        w.cast("long").alias("w"),
    )
    out_w = e.groupBy("src").agg(F.sum("w").alias("wout"))
    e = e.join(out_w, "src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        # pinned like the edge list: every iteration left-joins the
        # node frame, and the count below materializes it anyway —
        # without this the union+distinct shuffle re-runs per round
        .localCheckpoint()
    )
    n_nodes = nodes.count()
    base = ((damp_den - damp_num) * scale // damp_den) // n_nodes
    pr = nodes.withColumn("p", F.lit(scale // n_nodes).cast("long"))
    for _ in range(iters):
        contrib = (
            e.join(pr, e["src"] == pr["node"])
            .select(
                "dst",
                F.expr("(p * w) div wout").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        pr = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({damp_num} * coalesce(s, 0L)) div {damp_den}"
                )
            ).cast("long").alias("p"),
        )
    return pr
