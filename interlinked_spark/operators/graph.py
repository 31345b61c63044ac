"""Distributed graph operators (SURVEY.md §2b extensions).

``connected_components`` turns near-duplicate PAIRS into CLUSTERS — the
final stage of web-scale dedup (pick one canonical doc per component).
Hash-to-min label propagation: every vertex repeatedly adopts the
minimum label among itself and its neighbors.  Each iteration is one
join + one aggregate (both keyed shuffles); rounds needed = graph
diameter, which for near-dup graphs (dense clique-ish clusters) is tiny.
Each round is checkpointed so lineage stays flat and convergence is
checked with a cheap count — no driver-side graph materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpointing import materialize


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Label each vertex of the undirected graph with the MINIMUM vertex
    id reachable from it.  Returns ``(vertex, component)``.

    ``checkpoint_mode="reliable"`` writes each round's labels to the
    session checkpoint dir instead of executor-local storage — at 100 TB
    an executor loss under ``"local"`` replays every completed round
    (see ``operators/checkpointing.py``).

    Raises ``RuntimeError`` if not converged within ``max_iterations``
    (diameter bound; near-dup graphs converge in a handful)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    e = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    e = materialize(e.distinct(), checkpoint_mode)

    labels = materialize(
        e.select(F.col("a").alias("vertex"))
        .distinct()
        .withColumn("component", F.col("vertex")),
        checkpoint_mode,
    )
    # Convergence detection: labels are INTEGRAL doc/vertex ids in the
    # dedup pipelines, and min-propagation only ever DECREASES a label,
    # so sum(component) is strictly monotone until the fixed point —
    # equal sums <=> pointwise-equal labels.  That turns the per-round
    # convergence check into one aggregate over the freshly-checkpointed
    # labels instead of a self-join + filter + count (one fewer join
    # per round; the rounds ARE the cost of this operator).  ONLY
    # integral types qualify: the checksum casts to decimal(38,0), so a
    # fractional label change (1.4 -> 1.2) would be invisible and the
    # loop would exit a round early (review-caught bug).  Float/double/
    # decimal and non-numeric ids use the join-based check.
    numeric = labels.schema["component"].dataType.typeName() in (
        "byte", "short", "integer", "long"
    )

    def _checksum(lbl: DataFrame):
        return lbl.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s"),
        ).collect()[0]["s"]

    prev_sum = _checksum(labels) if numeric else None
    for _ in range(max_iterations):
        nbr_min = (
            e.join(labels.select(F.col("vertex").alias("a"), "component"), "a")
            .select(F.col("b").alias("vertex"), "component")
        )
        new_labels = materialize(
            labels.unionByName(nbr_min)
            .groupBy("vertex")
            .agg(F.min("component").alias("component")),
            checkpoint_mode,
            eager=True,  # flatten lineage before the convergence check
        )
        if numeric:
            new_sum = _checksum(new_labels)
            changed = new_sum != prev_sum
            prev_sum = new_sum
        else:
            changed = (
                new_labels.join(labels.withColumnRenamed("component", "old"), "vertex")
                .filter(F.col("component") != F.col("old"))
                .count()
            ) > 0
        labels = new_labels
        if not changed:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iterations} iterations")
