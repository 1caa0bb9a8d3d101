"""Registry-budget guards.

The driver verifies only the FIRST 50 registered queries. In round 3
six new registrations silently pushed six SURVEY §2 queries past the
window (including one whose previous driver verdict was FAIL), leaving
operators without a hard correctness signal. These tests make that
class of regression impossible to land quietly:

1. the registry never exceeds the 50-query window;
2. every oracle-backed query sits inside the window (rows-only
   queries may close the tail — they only get the weaker rows check);
3. the SURVEY §2 inventory's covering queries are all registered.
"""

from __future__ import annotations

from light_redistribution_in_3dptf_data_pipeline_spark.queries import QUERIES

DRIVER_WINDOW = 50

# Every SURVEY §2 [Q] operator's covering registry row. A rename or
# consolidation must update this list in the same commit — that is the
# point: coverage changes become explicit diffs, not silent rotations.
SECTION2_COVERING = [
    "w_missing_pose_detection",      # flagship chain
    "w9_missing_pose_scalable",      # flagship, scale-out form
    "w1_rownumber_bucket",           # W1/W2/F7
    "w3_w6_lag_rank",                # W3/W6
    "w4_running_total",              # W4
    "w7_w8_time_windows",            # tumbling/sliding
    "w10_session_window_batch",      # session windows (batch=stream)
    "f13_f14_pose_grid_rotation",    # F13 + F14/W5 (merged r8 to
                                     # free the slot for dx6)
    "s1_scan_project_filter",        # S1/S3
    "s2_p1_glob_suffix_views",       # S2/P1
    "p3_p4_p5_predicate_views",      # P3/P4/P5
    "p7_try_cast_failure_filter",    # P7/F4
    "j1_fanout_broadcast_join",      # J1
    "j2_key_intersection_join",      # J2
    "j3_positional_index_join",      # J3
    "j4_j6_semi_anti_join",          # J4/J6
    "j7_j8_temporal_joins",          # +J7/+J8 (folded r5 to free the
                                     # slot for w11)
    "w11_exposure_groups_batch",     # exactly-5 exposure groups
                                     # (handlehdrgen.py:25-27)
    "a1_a2_collect_having",          # A1/A2
    "a4_a6_a7_a8_a9_a11_stats",      # A4/A6/A7/A8/A9/A11
    "a5_a10_pricing_cube",           # A3/A5 + cube/rollup
    "t1_global_sort_rank",           # T1
    "t2_t3_t5_topk_order_sample",    # T2/T3/T5
    "t4_argmin_argmax",              # T4/F8
    "x1_x2_x3_setops",               # X1/X2/X3
    "f5_f6_f9_s7_event_deltas",      # F5/F6/F9 + S7
    "f1_f3_f11_f15_string_array_ops",  # F1/F3/F11/F15
    "s4_robot_program_parse",        # S4/F2/P2/F12
]


def test_registry_fits_driver_window():
    assert len(QUERIES) <= DRIVER_WINDOW, (
        f"{len(QUERIES)} queries registered but the driver verifies "
        f"only the first {DRIVER_WINDOW}: consolidate composites "
        "instead of letting the tail rotate out of verification")


def test_oracle_queries_inside_window():
    names = list(QUERIES)
    outside = [n for i, n in enumerate(names)
               if i >= DRIVER_WINDOW and QUERIES[n].oracle is not None]
    assert not outside, (
        f"oracle-backed queries registered past the driver window "
        f"(would be silently unverified): {outside}")


def test_section2_inventory_registered():
    missing = [n for n in SECTION2_COVERING if n not in QUERIES]
    assert not missing, f"SURVEY §2 covering queries missing: {missing}"
    names = list(QUERIES)
    late = [n for n in SECTION2_COVERING
            if names.index(n) >= DRIVER_WINDOW]
    assert not late, f"§2 covering queries outside driver window: {late}"


def test_section2_queries_are_oracle_checked():
    weak = [n for n in SECTION2_COVERING if QUERIES[n].oracle is None]
    assert not weak, (
        f"§2 covering queries downgraded to rows-only: {weak}")
