"""ONE ranked maintenance advisory per vector-index root (VERDICT
r11 brief #4): the signals already exist — occupancy canaries
(``verify_ann_index``/``verify_ivf_index``), the measured recall
history (``recall.recall_history``), the live-batch ledger
(small-files debt), and pin pricing (``snapshots.pins_report``) —
but an operator had to join four reports mentally to decide
compact-vs-migrate-vs-retrain-vs-release. :func:`suggest_maintenance`
folds them into one ranked action list, each action citing the
triggering signal, so "what should I run on this root today" is one
call (and an optional section of ``linkage.verify_deployment``).

Ranking is by severity class, highest first:

1. ``retrain_migrate`` — the recall canary series ends below its
   floor: probe QUALITY is decaying with no structural invariant
   violated; the fix is a re-trained structure
   (``migration.migrate_index(train_k=..., train_metric="dot")``),
   not a rewrite of the existing one.
2. ``compact_hot`` — cell/bucket occupancy skew past threshold
   (max > skew·median): a hot partition makes every probe touching
   it scan disproportionately; size-aware compaction
   (``compact_*_batches(rows_per_file=...)``) splits its files. If
   skew persists across compactions the distribution has shifted —
   escalate to ``retrain_migrate`` (the advisory says so).
3. ``compact_batches`` — live-batch count past threshold: per-batch
   directory fan-out is small-files debt; plain compaction folds it.
4. ``release_pins`` — pins flagged aged/over-budget by the pricing
   policy: superseded bytes held by forgotten snapshots.

Everything here is control-plane: the occupancy/ledger numbers come
from the root's own fsck (one aggregate scan), recall from committed
JSON samples, pins from the pricing report — nothing row-wise.
Thresholds are caller policy with engineering defaults; ``now`` is
injectable for deterministic tests (same convention as
``pins_report``)."""

from __future__ import annotations

from pyspark.sql import SparkSession

SEVERITY = {"retrain_migrate": 90, "compact_hot": 70,
            "compact_batches": 50, "release_pins": 30}


def suggest_maintenance(spark: SparkSession, root: str,
                        occupancy_skew: float = 8.0,
                        max_live_batches: int = 32,
                        recall_floor: float | None = None,
                        max_pin_age_seconds: float | None = None,
                        max_pin_held_bytes: int | None = None,
                        now: float | None = None) -> dict:
    """The ranked maintenance advisory for one index root (module
    docstring). ``root`` may be a pointer/alias. ``recall_floor``
    re-grades the recall series against a caller floor (otherwise
    each sample's own recorded floor applies); the pin thresholds
    mirror ``pins_report``'s. Returns::

        {"root", "kind", "actions": [
            {"action", "severity", "reason", "signal": {...}}, ...],
         "fsck_violations": [...]}

    ``actions`` is sorted most-severe first; an empty list means the
    root needs nothing. Structural fsck violations are surfaced
    verbatim under ``fsck_violations`` — they are damage, not
    maintenance, and ``verify_deployment`` already alarms on them."""
    from .ann_index import verify_ann_index
    from .ivf_index import verify_ivf_index
    from .linkage import _index_kind
    from .migration import resolve_index_root
    from .recall import recall_history
    from .snapshots import pins_report

    root = resolve_index_root(spark, root)
    kind = _index_kind(spark, root)
    if kind == "ann_lsh_incremental":
        fsck = verify_ann_index(spark, root)
        occ = fsck["bucket_occupancy"]
        hot_key, hot = "hottest_bucket", occ.get("hottest_bucket")
        compact_call = ("compact_ann_batches(root, "
                        "rows_per_file=...)")
    else:
        fsck = verify_ivf_index(spark, root)
        occ = fsck["cell_occupancy"]
        hot_key, hot = "hottest_cell", occ.get("hottest_cell")
        compact_call = ("compact_ivf_batches(root, "
                        "rows_per_file=...)")

    actions: list[dict] = []

    # 1. quality decay → re-train the routing structure
    hist = recall_history(spark, root, floor=recall_floor)
    if hist["samples"] and hist["samples"][-1].get("below_floor"):
        last = hist["samples"][-1]
        actions.append({
            "action": "retrain_migrate",
            "severity": SEVERITY["retrain_migrate"],
            "reason": (
                f"recall canary ended below floor: recall@"
                f"{last['k']} {last['recall']} < {last['floor']} at "
                f"batch {last['batch_id']} "
                f"({len(hist['below_floor'])} below-floor sample(s))"
                f" — the frozen structure no longer routes the "
                f"current distribution; run migration.migrate_index("
                f"train_k=..., train_metric='dot') and cut over"),
            "signal": {"recall": last,
                       "below_floor": hist["below_floor"]}})

    # 2. occupancy skew → size-aware compaction (split the hot files)
    med = occ.get("median") or 0
    if med and occ.get("max", 0) > occupancy_skew * med:
        actions.append({
            "action": "compact_hot",
            "severity": SEVERITY["compact_hot"],
            "reason": (
                f"occupancy skew: max {occ['max']} rows vs median "
                f"{med} (> {occupancy_skew}×) in {hot_key}={hot} — "
                f"run {compact_call} to split the hot partition's "
                f"files; skew that returns after compaction means "
                f"the distribution shifted: escalate to "
                f"retrain_migrate"),
            "signal": {"occupancy": occ,
                       "threshold": occupancy_skew}})

    # 3. live-batch fan-out → plain compaction
    n_live = fsck["live_batches"]
    if n_live > max_live_batches:
        actions.append({
            "action": "compact_batches",
            "severity": SEVERITY["compact_batches"],
            "reason": (
                f"{n_live} live batches (> {max_live_batches}) — "
                f"per-batch directory fan-out is small-files debt on "
                f"every probe's listing; fold them "
                f"({compact_call.split('(')[0]})"),
            "signal": {"live_batches": n_live,
                       "threshold": max_live_batches}})

    # 4. pin hoarding → release the flagged holds
    prep = pins_report(spark, root,
                       max_age_seconds=max_pin_age_seconds,
                       max_held_bytes=max_pin_held_bytes, now=now)
    if prep["flagged_pins"]:
        flagged = {d: {"flags": prep["pins"][d]["flags"],
                       "age_seconds": prep["pins"][d]["age_seconds"],
                       "held_bytes": prep["pins"][d]["held_bytes"]}
                   for d in prep["flagged_pins"]}
        total = sum(v["held_bytes"] for v in flagged.values())
        actions.append({
            "action": "release_pins",
            "severity": SEVERITY["release_pins"],
            "reason": (
                f"pins {sorted(flagged)} break the lifecycle policy "
                f"(holding {total} superseded bytes) — "
                f"release_pin(...) the forgotten holds, then the "
                f"next prune reclaims the batches"),
            "signal": {"flagged": flagged}})

    actions.sort(key=lambda a: (-a["severity"], a["action"]))
    return {"root": root, "kind": kind, "actions": actions,
            "fsck_violations": list(fsck["violations"])}
