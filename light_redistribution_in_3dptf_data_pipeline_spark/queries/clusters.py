"""Dedup clustering: near-dup pairs → connected components →
canonical survivors (SURVEY Phase 6 — the step that turns pairwise
similarity into an actual deduplicated corpus).

The pair graph is the production near-dup decision path — MinHash+LSH
candidates verified by exact jaccard (the dx5 two-phase shape, never
all-pairs); the clustering is the distributed hash-min label
propagation in ``operators/components.py``. The DuckDB oracle builds
the SAME pair set from the exhaustive 3-gram Jaccard formulation
(equal by the canary-guarded banding-recall argument) and walks it
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
    doc="Dedup (clustering): connected components over the near-dup "
        "pair graph via distributed hash-min label propagation "
        "(operators/components.py) — pairs become transitive "
        "duplicate clusters with a keep-first canonical survivor "
        "(cluster_id = min doc id). The pair graph is the PRODUCTION "
        "path: LSH candidates → exact-jaccard verify (the dx5 "
        "decision, O(N·bands) — never all-pairs), equal to the "
        "exhaustive tx6 set the oracle walks because banding recall "
        "is 1 at the threshold (fixture-band canary in "
        "tests/test_operators.py guards the premise). Iterations are "
        "join + groupBy-min bounded by graph diameter, each "
        "localCheckpoint'd to truncate lineage; the oracle is an "
        "independent recursive-CTE transitive closure, so the check "
        "covers transitivity (the fixture graph has 3-doc chains "
        "with no direct edge)")
def neardup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import dedup_clusters
    from ..operators.dedup import lsh_verified_neardups
    from ..catalog import load_table
    from .text import JACCARD_THRESHOLD

    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_verified_neardups(docs, JACCARD_THRESHOLD, bands=16)
    return dedup_clusters(pairs, left="doc_a", right="doc_b")
