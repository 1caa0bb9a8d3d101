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
    "f13_f14_pose_grid_rotation",    # 125 x 25 generated lattice
    "tx9_tfidf_vocab",               # one-row corpus-size scalar
    "sim1_sim2_cosine_topk",         # one-row query vector
    "sim3_sim4_ivf_train_assign",    # one-row query vector / L centroids
    "sx1_sx2_ann_lsh_topk",          # one-row query vector
    "sx3_ivf_probe_topk",            # one-row query vector / L centroids
    "a4_a6_a7_a8_a9_a11_stats",      # one-row x one-row stats joins
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


def _plan(name, spark):
    return (QUERIES[name].builder(spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())


def test_sim5_is_map_only(spark):
    """int8 quantization must stay a pure map stage: the only allowed
    'shuffle' is the final presentation sort — no aggregation or join
    exchange may creep in (at 100 TB this query is a single pass)."""
    plan = _plan("sim5_quantize_int8", spark)
    assert "Join" not in plan
    assert "HashAggregate" not in plan
    # exactly one Exchange: the rangepartitioning of the output sort
    import re
    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert all(e == "rangepartitioning" for e in exchanges), exchanges


def test_dx5_has_no_allpairs_join(spark):
    """The verified-LSH decision must keep the O(N·bands) bucket-join
    shape: every join is an equi-join (SortMerge/BroadcastHash), and
    the shingle side never self-joins without the band/bucket key."""
    plan = _plan("dx5_lsh_neardup_decision", spark)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_sx3_probe_is_broadcast_pruned(spark):
    """IVF probe: the nprobe cell filter must reach the candidate scan
    as a broadcast join (the partition-pruning analog), never a
    shuffle of the full corpus against 2 cell ids."""
    plan = _plan("sx3_ivf_probe_topk", spark)
    assert ("BroadcastHashJoin" in plan) or ("BroadcastExchange" in plan)
