"""Dedup clustering: near-dup pairs → connected components →
canonical survivors (SURVEY Phase 6 — the step that turns pairwise
similarity into an actual deduplicated corpus).

The pair graph is the 3-gram Jaccard near-dup query (tx6); the
clustering is the distributed hash-min label propagation in
``operators/components.py``. The DuckDB oracle walks the same graph
with a recursive CTE — transitive closure by min-reachable-id — so
the parity check covers the *transitivity* that pairwise queries
can't see (A~B, B~C ⇒ one 3-doc cluster even though A~C was never
scored; the sf fixtures contain such chains).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import register
from .text import NEARDUP_ORACLE


DX4_ORACLE = f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({NEARDUP_ORACLE})
), edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION ALL
  SELECT doc_b AS u, doc_a AS v FROM pairs
), walk(node, comp) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, w.comp FROM walk w JOIN edges e ON e.u = w.node
), comps AS (
  SELECT node, min(comp) AS comp FROM walk GROUP BY node
)
SELECT CAST(node AS BIGINT) AS doc_id,
       CAST(comp AS BIGINT) AS cluster_id,
       CAST(count(*) OVER (PARTITION BY comp) AS BIGINT) AS cluster_size,
       node = comp AS is_canonical
FROM comps
"""


@register(
    "dx4_neardup_cluster_cc",
    DX4_ORACLE,
    doc="Dedup (clustering): connected components over the tx6 "
        "near-dup pair graph via distributed hash-min label "
        "propagation (operators/components.py) — pairs become "
        "transitive duplicate clusters with a keep-first canonical "
        "survivor (cluster_id = min doc id). Iterations are join + "
        "groupBy-min bounded by graph diameter, each localCheckpoint'd "
        "to truncate lineage; the oracle is an independent recursive-"
        "CTE transitive closure, so the check covers transitivity "
        "(the fixture graph has 3-doc chains with no direct edge)")
def neardup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import dedup_clusters
    from .text import ngram_jaccard_neardup

    pairs = ngram_jaccard_neardup(spark, sf_dir)
    return dedup_clusters(pairs, left="doc_a", right="doc_b")
