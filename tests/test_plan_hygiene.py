"""Whole-registry physical-plan hygiene: the properties every query
must keep to survive a 100 TB scale-up, asserted mechanically.

- No ``CartesianProduct`` anywhere: every pairwise workload must go
  through an equi-join (bucketed/banded candidates) or an explicit
  tiny-side broadcast.
- No row-at-a-time Python (``BatchEvalPython`` / ``PythonUDF``): the
  only Python allowed in any registered plan is Arrow-vectorized
  (mapInPandas / ArrowEvalPython), and the relational queries use
  none at all.
- ``BroadcastNestedLoopJoin`` only where a *deliberate* one-row or
  constant-size side is broadcast (query vector, corpus-size scalar,
  single-row stats join, the 125x25 generated lattice) — growing that
  whitelist requires justifying the new crossJoin's scale story here.
"""

from __future__ import annotations

import pytest

from light_redistribution_in_3dptf_data_pipeline_spark.queries import QUERIES

from conftest import SF_DIR

# Queries whose plan legitimately contains BroadcastNestedLoopJoin:
# every entry broadcasts a side that is one row or constant-size by
# construction, so the "nested loop" is a scalar attach, not a scan
# of a second big input.
BNLJ_OK = {
    "f14_pose_grid_generator",       # 125 x 25 generated lattice
    "tx9_tfidf_vocab",               # one-row corpus-size scalar
    "sim1_sim2_cosine_topk",         # one-row query vector
    "sim3_sim4_ivf_train_assign",    # one-row query vector / L centroids
    "sx1_sx2_ann_lsh_topk",          # one-row query vector
    "sx3_ivf_probe_topk",            # one-row query vector / L centroids
    "a6_a7_a8_global_stats",         # one-row x one-row stats join
}

BANNED_EVERYWHERE = ("CartesianProduct", "BatchEvalPython", "PythonUDF(")


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_hygiene(name, spark):
    plan = (QUERIES[name].builder(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    for marker in BANNED_EVERYWHERE:
        assert marker not in plan, f"{name}: banned node {marker}"
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected BroadcastNestedLoopJoin — if the "
            "crossJoin is a deliberate tiny-side broadcast, add the "
            "query to BNLJ_OK with its scale justification")
