"""Cross-root corpus ⇆ embedding-index consistency (VERDICT r8
"What's missing" #4): documents and their vectors commit under
SEPARATE roots and leases, so by design there are windows where one
side is ahead of the other — a training join must be able to ASK
whether the two roots agree before it trusts them together.

Failure classes this fsck names:

- **coverage gap**: committed documents with no committed vector —
  the embedding job is behind (or its batch crashed pre-manifest). A
  doc⋈vector training join would silently drop these rows.
- **orphan vectors**: committed vectors whose document is gone —
  the corpus-side takedown ran (``delete_documents``) but the
  vector-side one (``delete_vectors``/``delete_ivf_vectors``)
  hasn't. For a RIGHT-TO-BE-FORGOTTEN takedown this is the
  dangerous direction: the embedding still leaks a representation
  of the removed text, so it is reported as a violation, not a lag.
- **stale provenance**: vector manifests whose recorded
  ``corpus_batch`` is unknown to the corpus root (never committed,
  or deleted without a superseding rewrite) — the lineage contract
  drifted even if the id sets happen to overlap.

The id contract is ``vec_id == doc_id`` (the embedding of document
D carries its id). Both scans are COLUMN-PRUNED to the single id
column — the fsck never reads text or vectors — and every check is
one distributed anti-join/aggregate; only bounded samples are
collected for the report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fs import path_exists
from .corpus import _load_manifests, _superseded, _visible_scan

ORPHAN_SAMPLE = 10


def _index_kind(spark: SparkSession, index_root: str) -> str:
    """The incremental vector-index family stored under a root, from
    its ``_meta.json`` — loud on anything that is not one."""
    import json

    from ..fs import read_text

    meta_path = f"{index_root}/_meta.json"
    if not path_exists(spark, meta_path):
        raise ValueError(
            f"{index_root} has no _meta.json — not an initialized "
            f"incremental vector index")
    kind = json.loads(read_text(spark, meta_path)).get("kind")
    if kind not in ("ann_lsh_incremental", "ivf_incremental"):
        raise ValueError(
            f"{index_root} holds index kind {kind!r} — not an "
            f"incremental vector index this fsck understands")
    return kind


def _committed_vec_ids(spark: SparkSession,
                       index_root: str) -> DataFrame:
    """(vec_id) of every committed vector under an incremental
    vector-index root, LSH or IVF — dispatched on the ``_meta.json``
    kind so the caller doesn't care which index family it links."""
    if _index_kind(spark, index_root) == "ann_lsh_incremental":
        from pyspark.sql import functions as F

        from .ann_index import _load_meta, _num_tables, read_ann_index

        scan = read_ann_index(spark, index_root)
        meta = _load_meta(spark, index_root)
        if _num_tables(meta) > 1:
            # one row per VECTOR: the table-0 partition (multi-table
            # roots store one copy per hyperplane table)
            scan = scan.filter(
                F.col("bucket") < (1 << meta["num_planes"]))
        return scan.select("vec_id")
    from .ivf_index import read_ivf_postings

    return read_ivf_postings(spark, index_root).select("vec_id")


def verify_deployment(spark: SparkSession, corpus_root: str,
                      index_roots: "list[str]",
                      max_pin_age_seconds: float | None = None,
                      max_pin_held_bytes: int | None = None,
                      advise: bool = False) -> dict:
    """The whole deployment's health in ONE call — what an operator
    runs before a critical training build or after maintenance:

    - :func:`corpus.verify_corpus` on the corpus root;
    - the kind-matched index fsck (``verify_ann_index`` /
      ``verify_ivf_index``) on every vector root;
    - :func:`verify_linked` corpus⇆vectors on every pair;
    - :func:`snapshots.pins_report` per root (held batches priced,
      age/byte-budget flags surfaced as violations when policy
      thresholds are passed);
    - :func:`snapshots.verify_pin` on EVERY pin of every root and
    - :func:`snapshots.verify_linked_pin` on every linked pin under
      the corpus root (VERDICT r9 missing #3: a pin with missing
      data or digest drift previously passed the deployment check
      because only the pricing report ran);
    - the RECALL CANARY series of every vector root
      (:func:`recall.recall_history` over ``_metrics/recall/``) —
      a below-floor sample the streaming canary recorded is a
      deployment violation, so quality decay surfaces in the same
      one-call health check as structural damage (r11; roots
      without samples cost nothing).

    ``advise=True`` (r11 brief #4) additionally runs
    :func:`advisory.suggest_maintenance` per index root and returns
    the ranked action lists under ``advice`` — health check and
    "what should I run on this root" in the same call (the advisory
    reuses this check's thresholds for the pin policy).

    Returns ``{"roots": {root: fsck}, "linked": {root: report},
    "pins": {root: report}, "pin_fscks": {root: {digest: report}},
    "linked_pin_fscks": {digest: report}, "recall": {root: history},
    "advice": {root: advisory} (advise=True only),
    "violations": [...]}`` — the flat ``violations`` list aggregates
    every sub-report's, each prefixed with its root, so "is
    everything consistent" is one empty-list check. Each sub-check
    stays independently callable; this adds no new invariants, only
    the composition."""
    from .ann_index import verify_ann_index
    from .corpus import verify_corpus
    from .ivf_index import verify_ivf_index
    from .migration import resolve_index_root
    from .snapshots import (list_linked_pins, list_pins, pins_report,
                            verify_linked_pin, verify_pin)

    # operators hand this the same locations their probes use — a
    # migration-cutover pointer resolves to its root (passthrough on
    # anything else; _index_kind stays the loud guard for garbage).
    # The corpus root resolves its own alias the same way (a corpus
    # re-shard pointer, migration.set_corpus_pointer)
    from .migration import resolve_corpus_root
    corpus_root = resolve_corpus_root(spark, corpus_root,
                                      strict=False)
    index_roots = [resolve_index_root(spark, r, strict=False)
                   for r in index_roots]
    out: dict = {"roots": {}, "linked": {}, "pins": {},
                 "pin_fscks": {}, "linked_pin_fscks": {},
                 "recall": {}, "violations": []}

    def _check_pins(root: str, table: str) -> None:
        rep = pins_report(spark, root,
                          max_age_seconds=max_pin_age_seconds,
                          max_held_bytes=max_pin_held_bytes)
        out["pins"][root] = rep
        for digest in rep["flagged_pins"]:
            flags = rep["pins"][digest]["flags"]
            out["violations"].append(
                f"{root}: pin {digest} breaks policy {flags} "
                f"(age {rep['pins'][digest]['age_seconds']:.0f}s, "
                f"held {rep['pins'][digest]['held_bytes']} bytes)")
        out["pin_fscks"][root] = {}
        for digest in sorted(list_pins(spark, root)):
            prep = verify_pin(spark, root, digest, table=table)
            out["pin_fscks"][root][digest] = prep
            out["violations"] += [f"{root}: pin {digest}: {v}"
                                  for v in prep["violations"]]

    rep = verify_corpus(spark, corpus_root)
    out["roots"][corpus_root] = rep
    out["violations"] += [f"{corpus_root}: {v}"
                          for v in rep["violations"]]
    _check_pins(corpus_root, "corpus")

    for iroot in index_roots:
        kind = _index_kind(spark, iroot)
        fsck = (verify_ann_index if kind == "ann_lsh_incremental"
                else verify_ivf_index)
        rep = fsck(spark, iroot)
        out["roots"][iroot] = rep
        out["violations"] += [f"{iroot}: {v}"
                              for v in rep["violations"]]
        linked = verify_linked(spark, corpus_root, iroot)
        out["linked"][iroot] = linked
        out["violations"] += [f"{corpus_root}⇆{iroot}: {v}"
                              for v in linked["violations"]]
        _check_pins(iroot, ("buckets" if kind == "ann_lsh_incremental"
                            else "postings"))
        from .recall import recall_history
        hist = recall_history(spark, iroot)
        out["recall"][iroot] = hist
        by_id = {d["batch_id"]: d for d in hist["samples"]}
        for bid in hist["below_floor"]:
            s = by_id[bid]
            out["violations"].append(
                f"{iroot}: recall canary below floor at batch {bid} "
                f"(recall@{s['k']} {s['recall']} < floor "
                f"{s['floor']})")

    if advise:
        from .advisory import suggest_maintenance
        # the fsck just computed above is handed in so advise=True
        # adds only the recall/pin reads, not a second aggregate
        # scan per root (ADVICE r12)
        out["advice"] = {
            iroot: suggest_maintenance(
                spark, iroot,
                max_pin_age_seconds=max_pin_age_seconds,
                max_pin_held_bytes=max_pin_held_bytes,
                fsck=out["roots"][iroot],
                # the deployment check knows the corpus root, so the
                # index advisories also watch FRESHNESS (r15 brief
                # #9: a lagging index fires stale_index here)
                corpus_root=corpus_root)
            for iroot in index_roots}
        # EVERY root kind carries advice (r12 brief #4): the corpus
        # root gets its own advisory, also fsck-reusing
        out["advice"][corpus_root] = suggest_maintenance(
            spark, corpus_root,
            max_pin_age_seconds=max_pin_age_seconds,
            max_pin_held_bytes=max_pin_held_bytes,
            fsck=out["roots"][corpus_root])

    linked_docs = list_linked_pins(spark, corpus_root)
    for ldigest in sorted(linked_docs):
        lrep = verify_linked_pin(spark, corpus_root, ldigest)
        out["linked_pin_fscks"][ldigest] = lrep
        out["violations"] += [f"linked pin {ldigest}: {v}"
                              for v in lrep["violations"]]
        # the age policy covers linked docs too (their holders carry
        # created_at like per-root pins)
        holders = linked_docs[ldigest].get("holders", {})
        if max_pin_age_seconds is not None and holders:
            import time

            age = time.time() - min(holders.values())
            if age > max_pin_age_seconds:
                out["violations"].append(
                    f"linked pin {ldigest} breaks policy ['aged'] "
                    f"(age {age:.0f}s, holders "
                    f"{sorted(holders)})")
    return out


def takedown_documents(spark: SparkSession, corpus_root: str,
                       index_roots: "list[str]",
                       doc_ids: "list[int] | DataFrame",
                       release_conflicting_pins: bool = False) -> dict:
    """Cross-root right-to-be-forgotten takedown: remove documents
    AND their embeddings (id contract ``vec_id == doc_id``) from the
    corpus and every linked vector index in ONE call — the manual
    ``delete_documents`` → ``delete_vectors``/``delete_ivf_vectors``
    sequence :func:`verify_linked`'s orphan report prescribes,
    ordered so a crash can only leave the BENIGN inconsistency.

    Vector indexes are cleaned FIRST, the corpus LAST: dying between
    roots leaves documents without vectors — a coverage *lag*
    :func:`verify_linked` reports without violation — never an
    orphan embedding that still encodes removed text. Each root's
    deletion is its own lease-held manifest-supersession commit
    (there is deliberately no cross-root transaction; the ordering IS
    the consistency story, and :func:`verify_linked` is the fsck for
    the crash window).

    A root where none of the ids remain is recorded under
    ``skipped`` instead of raising, so a replayed takedown notice —
    or a re-run after a mid-sequence crash — is idempotent: already-
    clean roots no-op, the rest are cleaned. Unknown/uninitialized
    index roots still raise (a typo'd root must not silently "pass"),
    and so does a snapshot-pin conflict
    (:class:`snapshots.PinConflictError` is NOT a ValueError,
    precisely so this cascade cannot mistake "still pinned" for
    "already clean") unless ``release_conflicting_pins=True``
    releases the covering pins per root.

    Returns ``{"indexes": {root: retain-batch-id | None},
    "corpus": retain-batch-id | None, "skipped": [reason, ...]}``.
    """
    from .migration import resolve_corpus_root, resolve_index_root

    corpus_root = resolve_corpus_root(spark, corpus_root,
                                      strict=False)
    report: dict = {"indexes": {}, "corpus": None, "skipped": []}
    for iroot in index_roots:
        iroot = resolve_index_root(spark, iroot, strict=False)
        kind = _index_kind(spark, iroot)   # loud on a bad root
        try:
            if kind == "ivf_incremental":
                from .ivf_index import delete_ivf_vectors

                report["indexes"][iroot] = delete_ivf_vectors(
                    spark, iroot, doc_ids,
                    release_conflicting_pins=release_conflicting_pins)
            else:
                from .ann_index import delete_vectors

                report["indexes"][iroot] = delete_vectors(
                    spark, iroot, doc_ids,
                    release_conflicting_pins=release_conflicting_pins)
        except ValueError as e:   # no live batch holds any target
            report["indexes"][iroot] = None
            report["skipped"].append(f"{iroot}: {e}")
    try:
        from .corpus import delete_documents

        report["corpus"] = delete_documents(
            spark, corpus_root, doc_ids,
            release_conflicting_pins=release_conflicting_pins)
    except ValueError as e:
        report["skipped"].append(f"{corpus_root}: {e}")
    return report


def verify_linked(spark: SparkSession, corpus_root: str,
                  index_root: str) -> dict:
    """Cross-root fsck. Returns a report dict:

    - ``n_docs`` / ``n_vectors`` — committed id counts per root;
    - ``docs_without_vectors`` — coverage-gap count (+ sample);
    - ``orphan_vectors`` — count of vectors whose doc is gone
      (+ sample), each also listed in ``violations``;
    - ``stale_provenance`` — vector batches whose ``corpus_batch``
      the corpus root does not know;
    - ``violations`` — human-readable list; empty = linked."""
    violations: list[str] = []

    cms = _load_manifests(spark, corpus_root)
    committed_docs = sorted(b for b in cms
                            if b not in _superseded(cms))
    corpus_path = f"{corpus_root}/corpus"
    if committed_docs and path_exists(spark, corpus_path):
        doc_ids = (_visible_scan(spark, corpus_path, committed_docs)
                   .select("doc_id"))
    else:
        doc_ids = spark.createDataFrame([], "doc_id BIGINT")
    vec_ids = _committed_vec_ids(spark, index_root)

    n_docs = doc_ids.count()
    n_vectors = vec_ids.count()

    gap = doc_ids.join(vec_ids,
                       doc_ids.doc_id == vec_ids.vec_id, "left_anti")
    n_gap = gap.count()
    gap_sample = ([int(r.doc_id) for r in
                   gap.orderBy("doc_id").limit(ORPHAN_SAMPLE)
                   .collect()] if n_gap else [])

    orphans = vec_ids.join(doc_ids,
                           vec_ids.vec_id == doc_ids.doc_id,
                           "left_anti")
    n_orphans = orphans.count()
    orphan_sample = ([int(r.vec_id) for r in
                      orphans.orderBy("vec_id").limit(ORPHAN_SAMPLE)
                      .collect()] if n_orphans else [])
    if n_orphans:
        violations.append(
            f"orphan_vectors: {n_orphans} committed vectors have no "
            f"committed document (sample vec_ids {orphan_sample}) — "
            f"a corpus takedown has not reached the vector index; "
            f"run delete_vectors/delete_ivf_vectors")

    # provenance: every corpus_batch a vector manifest records must
    # be KNOWN to the corpus root — committed, or superseded by a
    # rewrite that remembers it (compaction/retention identity
    # memory). An id known to neither was never committed or was
    # batch-deleted outright.
    vms = _load_manifests(spark, index_root)
    live_vec_batches = sorted(b for b in vms
                              if b not in _superseded(vms))
    corpus_known = set(cms) | _superseded(cms)

    def _provs(b: str) -> list[str]:
        # manifests record one corpus batch (str) or several (list —
        # a streaming micro-batch can span corpus batches)
        v = vms[b].get("corpus_batch")
        return v if isinstance(v, list) else [v] if v is not None \
            else []

    stale = sorted(
        (b, p) for b in live_vec_batches
        for p in _provs(b) if p not in corpus_known)
    if stale:
        violations.append(
            f"stale_provenance: vector batches {stale} record a "
            f"corpus_batch unknown to {corpus_root}")

    return {"n_docs": n_docs, "n_vectors": n_vectors,
            "docs_without_vectors": n_gap,
            "docs_without_vectors_sample": gap_sample,
            "orphan_vectors": n_orphans,
            "orphan_vectors_sample": orphan_sample,
            "stale_provenance": [list(t) for t in stale],
            "violations": violations}
