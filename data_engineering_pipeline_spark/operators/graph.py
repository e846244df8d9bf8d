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
            break
    return labels.select(F.col("v").alias(id_col), "component")
