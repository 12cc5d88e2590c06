"""Distributed connected components (hash-min label propagation) — the
clustering step that turns near-duplicate candidate *pairs* into dedup
*groups* (keep one canonical document per component).

Algorithm: every node starts labeled with its own id; each iteration
propagates the minimum label across edges (both directions) and joins it
back; stop when no label changed. Min-propagation moves one hop per
iteration, so rounds ≈ component diameter — near-dup clusters are shallow
(a dup cluster is near-clique), so convergence is 2-3 rounds in practice;
``max_iters`` bounds the pathological chain case.

Scale notes: each round is one shuffle of (node, label) + one of the edge
join — all narrow-width rows; labels are re-checkpointed per round
(``localCheckpoint``) so the lineage doesn't grow unboundedly across
iterations (the classic iterative-algorithm footgun: O(iters)-deep plans
re-execute everything each action). Deterministic throughout (min), so
retries/backfills converge identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, *, max_iters: int = 25,
                         checkpoint: bool = True) -> DataFrame:
    """``edges(a, b)`` (undirected pairs) → ``(node, component)`` where
    ``component`` is the minimum node id in the node's component.
    Only nodes appearing in at least one edge are returned (singletons
    carry no dedup decision)."""
    sym = (edges.selectExpr("a AS src", "b AS dst")
           .unionByName(edges.selectExpr("b AS src", "a AS dst")))
    labels = (sym.select(F.col("src").alias("node")).distinct()
              .withColumn("component", F.col("node")))
    converged = False
    for _ in range(max_iters):
        # candidate labels from neighbors, keep the minimum
        prop = (sym.join(labels, sym["src"] == labels["node"])
                .select(F.col("dst").alias("node"),
                        F.col("component").alias("cand")))
        new_labels = (labels.select("node", F.col("component").alias("cand"))
                      .unionByName(prop)
                      .groupBy("node")
                      .agg(F.min("cand").alias("component")))
        if checkpoint:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (new_labels
                   .join(labels.withColumnRenamed("component", "prev"),
                         "node")
                   .filter(F.col("component") != F.col("prev"))
                   .count())
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # Silent partial propagation = wrong components; fail loud. A graph
        # needing more rounds has diameter > max_iters — raise, don't guess.
        raise ValueError(
            f"connected_components did not converge in {max_iters} rounds "
            f"(component diameter exceeds max_iters — raise it)")
    return labels


def component_stats(edges: DataFrame, **kw) -> DataFrame:
    """(component, n_members) rollup of :func:`connected_components` —
    the dedup-group inventory (canonical id = min member id)."""
    cc = connected_components(edges, **kw)
    return (cc.groupBy("component")
            .agg(F.count("*").alias("n_members")))


def components_oracle_sql(pairs_sql: str) -> str:
    """DuckDB twin: recursive min-label closure over the same pair set
    (``pairs_sql`` is any SELECT yielding columns a, b)."""
    return f"""
    WITH RECURSIVE pairs AS (SELECT * FROM ({pairs_sql}) t),
    sym AS (SELECT a AS src, b AS dst FROM pairs
            UNION SELECT b, a FROM pairs),
    reach(node, lbl) AS (
      SELECT src, src FROM sym
      UNION
      SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.node),
    comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
    SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members
    FROM comp GROUP BY component"""
