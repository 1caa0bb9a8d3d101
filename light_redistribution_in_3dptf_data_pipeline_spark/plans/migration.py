"""Vector-index MIGRATION: the escape hatch the frozen-quantizer
contract deliberately lacks (VERDICT r9 missing #1).

Both incremental index families freeze their routing structure at
initialization — IVF centroids (plans/ivf_index.py:8-12) and LSH
hyperplanes (plans/ann_index._check_meta) — because re-training per
delta would move cell/bucket boundaries under already-written
postings. Correct, but when the embedding DISTRIBUTION shifts (new
model, new domain mix), the old structure routes new vectors into a
few hot cells and recall decays with no invariant violated. At 100 TB
"build a new root to re-train" must not mean re-EMBEDDING the corpus:
the vectors are already stored in the old root's postings.

:func:`migrate_index` is that path:

1. **Initialize the NEW root** with the re-trained structure — a
   fresh coarse quantizer (IVF, from a caller-supplied labeled
   training sample) or fresh hyperplane parameters (LSH).
2. **Backfill by RE-ROUTING committed postings**: every committed
   old batch is read once (vec_id + embedding — never re-embedded)
   and ingested into the new root under ``migrate-{old_batch_id}``,
   where the new structure assigns cells/buckets. Each backfill
   batch is the standard manifest-last commit, so the new root is
   invisible to readers until its manifests land, and a crashed
   migration RESUMES: already-committed ``migrate-*`` batches no-op
   by identity (``BatchAlreadyIngested``), the rest run. Provenance
   (``corpus_batch``) rides along, so the cross-root fsck holds on
   the new root too.
3. **Verify counts**: the new root must hold exactly the old root's
   committed vectors (the migration ledger check) and pass the
   kind-matched fsck before any cutover.
4. **Cut over via an atomic POINTER file** readers resolve
   (:func:`resolve_index_root`): one ``write_text_atomic`` PUT flips
   every reader to the new root; the old root is untouched — a pin
   taken on it before the migration keeps serving bit-identical
   pinned probes (snapshots.ann_pinned_topk / ivf_pinned_topk).

The reference has no incremental index at all (it rebuilds per run —
operators/similarity.write_ivf_index restates that); this module is
the production completion of the incremental shape, like
plans/ann_index.py and plans/ivf_index.py before it.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fs import path_exists, read_text, write_text_atomic
from .corpus import (BatchAlreadyIngested, _load_manifests,
                     _superseded)

MIGRATE_PREFIX = "migrate-"


def set_index_pointer(spark: SparkSession, alias: str,
                      root: str, note: str | None = None) -> dict:
    """Point the alias file at ``root`` — ONE atomic PUT, the whole
    cutover. Readers that resolve the alias before the PUT see the
    old root, after it the new one; there is no torn state
    (fs.write_text_atomic's contract)."""
    doc = {"root": root}
    if note is not None:
        doc["note"] = note
    write_text_atomic(spark, alias, json.dumps(doc, sort_keys=True))
    return doc


def resolve_index_root(spark: SparkSession, alias_or_root: str,
                       strict: bool = True) -> str:
    """An index location a reader was handed: either a root itself
    (has ``_meta.json``) or a pointer file written by
    :func:`set_index_pointer` — resolved one level, loudly on
    anything else (a typo'd location must not silently read as an
    empty index). ``strict=False`` passes an unresolvable location
    through unchanged — for write paths where a not-yet-initialized
    fresh root is legitimate (e.g. a stream's first micro-batch)."""
    if path_exists(spark, f"{alias_or_root}/_meta.json"):
        return alias_or_root
    if path_exists(spark, alias_or_root):
        try:
            doc = json.loads(read_text(spark, alias_or_root))
        except Exception:   # a directory / non-JSON: not a pointer
            doc = {}
        root = doc.get("root")
        if root and path_exists(spark, f"{root}/_meta.json"):
            return root
        if strict:
            raise ValueError(
                f"pointer {alias_or_root} names {root!r}, which is "
                f"not an initialized index root")
        if root:
            # a well-formed pointer at a NOT-YET-INITIALIZED root:
            # write paths (strict=False) must target the named root —
            # falling back to the alias would build an index AT the
            # pointer file's path (r11; a stream can now be aimed at
            # a fresh root through its alias from day one)
            return root
        return alias_or_root
    if strict:
        raise ValueError(
            f"{alias_or_root} is neither an initialized index root "
            f"nor an index pointer file")
    return alias_or_root


class IndexPointerHandle:
    """CACHED pointer resolution for high-QPS probe serving (VERDICT
    r10 brief #7): :func:`resolve_index_root` costs 1–2 small FS
    reads per call — nothing for a batch job, real latency and
    metadata-service load at thousands of probes per second. A
    handle resolves the location ONCE and serves every probe from
    the cached root until ``ttl_seconds`` elapses (or
    :meth:`refresh` forces it), so a migration cutover is picked up
    within one TTL window instead of on every probe. Probes accept a
    handle anywhere they accept a root/pointer string
    (``ivf_incremental_topk`` / ``ann_incremental_topk``).

    ``clock`` is injectable for deterministic tests; TTL 0 disables
    caching (every probe re-resolves — handy as a drop-in during a
    staged cutover). ``n_resolutions`` counts actual FS
    resolutions, the observable the probe test pins. NOT
    thread-safe by design (per-session driver object; a racing
    double-resolve is harmless — both get a valid root)."""

    def __init__(self, spark: SparkSession, location: str,
                 ttl_seconds: float = 30.0, clock=None):
        import time

        self._spark = spark
        self.location = location
        self.ttl_seconds = float(ttl_seconds)
        self._clock = clock if clock is not None else time.time
        self._root: str | None = None
        self._expires_at = float("-inf")
        self.n_resolutions = 0

    def root(self) -> str:
        """The resolved root — cached until the TTL lapses."""
        now = self._clock()
        if self._root is None or now >= self._expires_at:
            self._root = resolve_index_root(self._spark,
                                            self.location)
            self._expires_at = now + self.ttl_seconds
            self.n_resolutions += 1
        return self._root

    def refresh(self) -> str:
        """Drop the cache and re-resolve now — the explicit pickup
        after an operator-driven cutover."""
        self._expires_at = float("-inf")
        return self.root()


def resolve_probe_location(spark: SparkSession,
                           location: "str | IndexPointerHandle"
                           ) -> str:
    """What every probe entry point calls: a plain root/pointer
    string resolves per-call (strict — probing an uninitialized
    location must be loud), a :class:`IndexPointerHandle` serves its
    cached resolution."""
    if isinstance(location, IndexPointerHandle):
        return location.root()
    return resolve_index_root(spark, location)


def set_corpus_pointer(spark: SparkSession, alias: str,
                       root: str, note: str | None = None) -> dict:
    """The corpus-root alias (VERDICT r10 brief #4): one atomic PUT
    flips every corpus reader/writer that resolves the alias —
    ``read_corpus``/``ingest_delta``/``verify_corpus``/
    ``takedown_documents`` all do — to a new root, enabling the
    re-shard/relocation cutover :func:`migrate_corpus` performs.
    Same file format and atomicity contract as
    :func:`set_index_pointer`."""
    return set_index_pointer(spark, alias, root, note=note)


def resolve_corpus_root(spark: SparkSession, alias_or_root: str,
                        strict: bool = True) -> str:
    """The corpus analog of :func:`resolve_index_root`: a location is
    a corpus root if it has a ``_manifests`` directory (the
    manifest-protocol marker — corpus roots have no ``_meta.json``),
    else a pointer file naming one, resolved one level.
    ``strict=False`` passes an unresolvable location through for
    write paths where a fresh root is legitimate (a first
    ``ingest_delta``)."""
    from .corpus import MANIFEST_DIR

    if path_exists(spark, f"{alias_or_root}/{MANIFEST_DIR}"):
        return alias_or_root
    if path_exists(spark, alias_or_root):
        try:
            doc = json.loads(read_text(spark, alias_or_root))
        except Exception:   # a directory / non-JSON: not a pointer
            doc = {}
        root = doc.get("root")
        if root and path_exists(spark, f"{root}/{MANIFEST_DIR}"):
            return root
        if strict:
            raise ValueError(
                f"pointer {alias_or_root} names {root!r}, which has "
                f"no committed-manifest directory — not a corpus "
                f"root")
        if root:
            # pointer at a fresh (no commits yet) corpus root: write
            # paths target the NAMED root, never the alias file path
            # (mirrors resolve_index_root's strict=False rule)
            return root
        return alias_or_root
    if strict:
        raise ValueError(
            f"{alias_or_root} is neither a corpus root with "
            f"committed manifests nor a corpus pointer file")
    return alias_or_root


def migrate_corpus(spark: SparkSession, old_root: str, new_root: str,
                   partitions_per_batch: int | None = None,
                   pointer: str | None = None) -> dict:
    """RE-SHARD / RELOCATE a corpus root (VERDICT r10 brief #4):
    copy every live batch VERBATIM — corpus rows plus the derived
    dedup-index tables, content byte-identical, manifests copied
    unchanged so batch identity (and the content-addressed pin
    digests over it) transfers — into ``new_root``, optionally
    re-laid-out (``partitions_per_batch`` re-partitions each batch's
    files: the small-files / relocation move), then atomically cut
    readers over via ``pointer`` (:func:`set_corpus_pointer`).

    Unlike :func:`migrate_index` nothing is re-derived: a corpus
    re-shard changes LAYOUT, not content, so the honest operation is
    a copy under the same commit protocol — per-batch data first,
    manifest LAST, so a crash resumes by batch identity (committed
    batches skip; the rest re-copy). The new root's writer lease is
    held across the whole build; the old root is never written — a
    pin taken on it before the migration keeps serving bit-identical
    pinned reads after cutover.

    Pre-cutover checks, mirroring the index migration: the new
    root's live set must equal the old live set exactly (a dirty
    build root fails loudly), the ledger must re-count
    (verify_corpus fsck), and the OLD root must not have moved while
    we copied — quiesce old-root writers first, and restart any
    ingest loop against the alias after cutover. Pin files are NOT
    copied: holds are per-root by design (the old root's pins keep
    ITS files alive; re-pin the new root after cutover if needed).

    Returns ``{"old_root", "new_root", "batches_copied",
    "batches_skipped", "n_rows", "fsck", "pointer"}``."""
    from .corpus import (INGEST_TABLES, _manifest_path,
                         _write_snapshot, corpus_writer_lock,
                         verify_corpus)

    oms = _load_manifests(spark, old_root)
    old_live = sorted(b for b in oms if b not in _superseded(oms))
    if not old_live:
        raise ValueError(f"nothing to migrate: no committed batches "
                         f"under {old_root}")

    with corpus_writer_lock(spark, new_root,
                            op="migrate_corpus") as lease:
        nms = _load_manifests(spark, new_root)
        foreign = sorted(set(nms) - set(old_live))
        if foreign:
            raise RuntimeError(
                f"new root {new_root} already holds batches "
                f"{foreign} that are not live under {old_root} — a "
                f"reused build root would serve alien or duplicate "
                f"documents after cutover; start a fresh new_root")
        copied, skipped = [], []
        for b in old_live:
            if b in nms:
                skipped.append(b)   # resume path: committed last run
                continue
            for table in INGEST_TABLES:
                src = f"{old_root}/{table}/batch_id={b}"
                if not path_exists(spark, src):
                    continue   # optional table / all-gated batch
                dst = f"{new_root}/{table}/batch_id={b}"
                from ..fs import delete_path
                delete_path(spark, dst)   # crashed partial copy
                df = spark.read.parquet(src)
                if partitions_per_batch is not None:
                    df = df.repartition(partitions_per_batch)
                df.write.mode("overwrite").parquet(dst)
            lease.fence()
            # manifest content copied VERBATIM: identity, counts,
            # replaces-memory, and provenance survive unchanged
            write_text_atomic(spark, _manifest_path(new_root, b),
                              json.dumps(oms[b], sort_keys=True))
            copied.append(b)
        _write_snapshot(spark, new_root,
                        {b: oms[b] for b in old_live})

    fsck = verify_corpus(spark, new_root)
    if fsck["violations"]:
        raise RuntimeError(
            f"new root {new_root} fails its fsck — refusing to cut "
            f"over: {fsck['violations']}")
    nms = _load_manifests(spark, new_root)
    live_new = sorted(b for b in nms if b not in _superseded(nms))
    if live_new != old_live:
        raise RuntimeError(
            f"new root {new_root} holds live batches {live_new}, "
            f"expected exactly {old_live}")

    # the old root must not have moved during the copy — same
    # guard (and operational rule) as migrate_index's step 4
    oms2 = _load_manifests(spark, old_root)
    old_live2 = sorted(b for b in oms2 if b not in _superseded(oms2))
    if old_live2 != old_live or any(oms2[b] != oms[b]
                                    for b in old_live):
        raise RuntimeError(
            f"old root {old_root} changed during the copy (live set "
            f"was {old_live}, is now {old_live2}) — quiesce old-root "
            f"writers and re-run (copied batches resume by identity) "
            f"before cutting over")

    report = {"old_root": old_root, "new_root": new_root,
              "batches_copied": copied, "batches_skipped": skipped,
              "n_rows": fsck["corpus_rows"], "fsck": fsck,
              "pointer": pointer}
    if pointer is not None:
        set_corpus_pointer(spark, pointer, new_root,
                           note=f"migrated from {old_root}")
    return report


def migrate_index(spark: SparkSession, old_root: str, new_root: str,
                  train: DataFrame | None = None,
                  num_planes: int | None = None,
                  dim: int | None = None,
                  num_tables: int | None = None,
                  pointer: str | None = None,
                  cell_col: str = "label",
                  train_k: "int | str | None" = None,
                  train_iters: int | None = None,
                  train_metric: str = "l2",
                  train_normalize: bool = False,
                  storage: str | None = None,
                  max_batches_per_commit: int | None = None,
                  target_cell_rows: int | None = None) -> dict:
    """Re-train the routing structure into ``new_root`` and backfill
    it from ``old_root``'s COMMITTED postings (module docstring for
    the why and the crash/cutover story).

    - IVF: the new coarse quantizer comes from ``train`` (a labeled
      frame for :func:`ivf_index.init_ivf_index`), or — the
      no-labels path (VERDICT r10 brief #1) — from ``train_k``: the
      deterministic k-means trainer (:func:`plans.kmeans.
      train_centroids`) runs over ``train`` if given (an unlabeled
      (vec_id, embedding) sample), else over the OLD ROOT'S OWN
      committed postings — the vectors are already stored, so a
      distribution-shift re-train needs nothing from the caller but
      k (or ``train_k="auto"``, sized by √N). ``train_metric="dot"``
      trains with the quantizer's own placement rule (r11 brief #1
      — recommended for re-trains chasing recall);
      ``train_normalize=True`` makes that true spherical k-means
      (r12 brief #3 — unit-normed training, norm-bias-free
      centroids; recorded in the new root's ``_meta``).
    - LSH: ``num_planes``/``dim``/``num_tables`` parameterize the
      new hyperplanes (defaults = the old meta's, i.e. a pure
      re-bucketing; ``num_tables=L`` re-buckets a single-table root
      into L independent tables — the recall-ceiling escape, r13
      VERDICT #3). A multi-table OLD root backfills from its
      table-0 copies (one row per vector — the other copies are the
      same bytes).
    - ``pointer``: optional alias file to atomically cut over AFTER
      the count verification passes.
    - ``storage``: the NEW root's posting layout ("float"/"int8" —
      r11 brief #3); defaults to the old root's on a fresh build, or
      to the new root's OWN committed meta on a resume (ADVICE r12 —
      an interrupted float→int8 migration re-runs without re-passing
      storage=; an explicit conflicting value raises). int8→int8 carries
      the stored codes VERBATIM (re-routing still re-derives
      cells/buckets from the dequantized embedding under the new
      structure — no double-quantization of the stored codes);
      float→int8 quantizes at ingest; int8→float stores the
      dequantized floats (lossy source, said loudly here).
    - ``max_batches_per_commit`` (VERDICT r10 brief #5): COALESCE the
      backfill — up to N consecutive old batches fold into ONE
      ``migrate-first--last`` commit whose manifest records the
      folded ids (``migrated_batches``, the compaction ``replaces``
      pattern) and the union of their provenance. The per-old-batch
      loop is one serial driver job per commit, so at 10k small old
      batches the default (1:1) is a driver-side bottleneck; N=100
      makes it 100 commits. Chunking is deterministic (sorted old
      live set, fixed N), so resume-by-identity still holds — but a
      resume MUST use the SAME N (the live-set check fails loudly on
      a mismatch, it cannot silently double-migrate).

    Idempotent/resumable: a re-run after a crash skips
    already-committed ``migrate-*`` batches and continues. Returns
    ``{"old_root", "new_root", "kind", "batches_migrated",
    "batches_skipped", "n_vectors", "pointer"}``."""
    from .linkage import _index_kind

    kind = _index_kind(spark, old_root)
    oms = _load_manifests(spark, old_root)
    old_live = sorted(b for b in oms if b not in _superseded(oms))
    if not old_live:
        raise ValueError(f"nothing to migrate: no committed batches "
                         f"under {old_root}")

    if kind == "ivf_incremental":
        from .ivf_index import (IVF_TABLE, _load_meta, init_ivf_index,
                                ivf_ingest_delta, ivf_vectors,
                                read_ivf_postings)
        ometa = _load_meta(spark, old_root)
        old_storage = ometa.get("storage", "float")
        if path_exists(spark, f"{new_root}/_meta.json"):
            # RESUME (ADVICE r12): the new root's own meta is the
            # layout authority — an interrupted float→int8 migration
            # re-run WITHOUT storage= must keep the new layout, not
            # fall back to the old root's (the ingest would refuse
            # loudly, but avoidably). An explicit conflicting
            # storage= is a caller error, said here not mid-backfill.
            new_storage = _load_meta(spark, new_root).get(
                "storage", "float")
            if storage is not None and storage != new_storage:
                raise ValueError(
                    f"new root {new_root} is already initialized "
                    f"with storage={new_storage!r}; resuming with "
                    f"storage={storage!r} would mix layouts — drop "
                    f"the argument or start a fresh new_root")
        else:
            new_storage = storage or old_storage
            n_dim = dim or ometa["dim"]
            if train_k is not None:
                # unlabeled path: re-train on the given sample, or on
                # the old root's own committed vectors (one pruned
                # scan per Lloyd iteration — never a re-embedding;
                # for an int8 old root the sample is the DEQUANTIZED
                # view — quantizer training is statistical, the sim5
                # reconstruction error is noise at that altitude)
                sample = (train if train is not None
                          else ivf_vectors(spark, old_root))
                if train_k == "auto" and target_cell_rows is not None:
                    # CLOSED-LOOP sizing (r12 brief #5): k from the
                    # old root's MEASURED occupancy skew, not √N —
                    # the retrain targets the configured posting-scan
                    # budget on the actual distribution
                    from .ivf_index import verify_ivf_index
                    from .kmeans import suggest_k_feedback
                    ofsck = verify_ivf_index(spark, old_root)
                    train_k = suggest_k_feedback(
                        ofsck["index_rows"],
                        ofsck["cell_occupancy"], target_cell_rows)
                init_ivf_index(spark, new_root, sample, dim=n_dim,
                               train_k=train_k,
                               train_iters=train_iters,
                               train_metric=train_metric,
                               train_normalize=train_normalize,
                               storage=new_storage)
            elif train is not None:
                init_ivf_index(spark, new_root, train,
                               cell_col=cell_col, dim=n_dim,
                               storage=new_storage)
            else:
                raise ValueError(
                    "IVF migration re-trains the coarse quantizer — "
                    "pass `train` (a labeled sample for "
                    "init_ivf_index) or `train_k` (deterministic "
                    "k-means over `train`/the old root's postings)")
        old_scan = read_ivf_postings(spark, old_root)

        def ingest(delta, bid, prov, extra):
            return ivf_ingest_delta(spark, new_root, delta, bid,
                                    dedup_ids=False,
                                    corpus_batch=prov,
                                    manifest_extra=extra)
    else:
        from .ann_index import (ann_ingest_delta, _load_meta,
                                read_ann_index)
        ometa = _load_meta(spark, old_root)
        old_storage = ometa.get("storage", "float")
        if path_exists(spark, f"{new_root}/_meta.json"):
            # RESUME: same layout-authority rule as the IVF branch
            # (ADVICE r12) — the new root's first ingest froze its
            # storage; a resume must not re-derive it from the old
            # root (the per-ingest guard would refuse, avoidably)
            new_storage = _load_meta(spark, new_root).get(
                "storage", "float")
            if storage is not None and storage != new_storage:
                raise ValueError(
                    f"new root {new_root} is already initialized "
                    f"with storage={new_storage!r}; resuming with "
                    f"storage={storage!r} would mix layouts — drop "
                    f"the argument or start a fresh new_root")
        else:
            new_storage = storage or old_storage
        n_planes = num_planes if num_planes is not None \
            else ometa["num_planes"]
        n_dim = dim if dim is not None else ometa["dim"]
        from .ann_index import _num_tables
        n_tables = (num_tables if num_tables is not None
                    else _num_tables(ometa))
        old_scan = read_ann_index(spark, old_root)
        if _num_tables(ometa) > 1:
            # one copy per vector: the table-0 partition (a static
            # bucket filter, not a dedup shuffle) — counts below
            # stay in vectors, matching the manifests
            old_scan = old_scan.filter(
                F.col("bucket") < (1 << ometa["num_planes"]))

        def ingest(delta, bid, prov, extra):
            return ann_ingest_delta(spark, new_root, delta, bid,
                                    num_planes=n_planes, dim=n_dim,
                                    dedup_ids=False,
                                    corpus_batch=prov,
                                    manifest_extra=extra,
                                    storage=new_storage,
                                    num_tables=n_tables)

    # per-chunk backfill: batch granularity (and provenance)
    # survives — the default is 1:1, ``max_batches_per_commit``
    # coalesces (docstring) — each commit is manifest-last, and the
    # DETERMINISTIC chunk identity makes a crashed migration
    # resumable. Each chunk's read is a first-level partition-pruned
    # scan of the old root — one pass over the old postings total,
    # never a re-embedding. The new root's prior manifests are
    # loaded ONCE: a skipped chunk was committed by an earlier run,
    # so the pre-loop snapshot has it.
    from .corpus import _union_provenance

    nonzero = [b for b in old_live if oms[b].get("n_admitted", 0)]
    step = (max_batches_per_commit
            if max_batches_per_commit and max_batches_per_commit > 1
            else 1)
    chunks = [nonzero[i:i + step] for i in range(0, len(nonzero),
                                                 step)]

    def _chunk_id(chunk: list[str]) -> str:
        return (f"{MIGRATE_PREFIX}{chunk[0]}" if len(chunk) == 1
                else f"{MIGRATE_PREFIX}{chunk[0]}--{chunk[-1]}")

    prior = _load_manifests(spark, new_root)
    # refuse BEFORE any ingest if the new root already holds live
    # batches outside this run's chunk set — a dirty build root, or
    # a resume under a different max_batches_per_commit, must not
    # pollute the root with overlapping migrate commits first and
    # fail only at the final check
    expected = sorted(_chunk_id(c) for c in chunks)
    stale = sorted(b for b in prior if b not in _superseded(prior)
                   and b not in set(expected))
    if stale:
        raise RuntimeError(
            f"new root {new_root} holds live batches {stale}, "
            f"expected exactly (a subset of) {expected} — a reused "
            f"build root, or a resume under a different "
            f"max_batches_per_commit, would serve duplicate vectors; "
            f"start a fresh new_root or re-run with the original "
            f"chunking")
    # storage-aware backfill columns: the embedding (stored, or
    # dequantized from codes) always rides for RE-ROUTING under the
    # new structure; int8→int8 additionally carries the codes
    # VERBATIM so the stored payload is never quantized twice
    if old_storage == "int8":
        from .codes import dequant_embedding
        old_scan = old_scan.withColumn(
            "embedding",
            dequant_embedding(F.col("code"), F.col("scale")))
    delta_cols = ["vec_id", "embedding"]
    if old_storage == "int8" and new_storage == "int8":
        delta_cols += ["code", "scale"]

    migrated, skipped, n_vectors = [], [], 0
    for chunk in chunks:
        want = sum(oms[b]["n_admitted"] for b in chunk)
        bid = _chunk_id(chunk)
        delta = (old_scan.filter(F.col("batch_id").isin(chunk))
                 .select(*delta_cols))
        extra = ({"migrated_batches": chunk} if len(chunk) > 1
                 else None)
        try:
            m = ingest(delta, bid, _union_provenance(oms, chunk),
                       extra)
        except BatchAlreadyIngested:
            skipped.append(bid)   # resume path: committed last run
            # .get twice (ADVICE r10): a migrate-* batch committed by
            # a CONCURRENT writer after the pre-loop snapshot, or one
            # superseded out from under us, is absent from `prior` —
            # count it as 0 and let the want_total / live_new checks
            # below report the mismatch loudly instead of a KeyError
            n_vectors += prior.get(bid, {}).get("n_admitted", 0)
            continue
        if m["n_admitted"] != want:
            raise RuntimeError(
                f"migration ledger mismatch on batches {chunk}: old "
                f"manifests say {want} vectors, re-routed ingest "
                f"admitted {m['n_admitted']}")
        migrated.append(bid)
        n_vectors += m["n_admitted"]

    # migration-wide checks BEFORE anyone cuts over:
    # 1. this run's batches hold exactly the old root's rows;
    # 2. the new root's LIVE batch set is exactly the expected
    #    migrate-set — a dirty/reused new_root, or an old root that
    #    was compacted between a crash and the resume (leaving stale
    #    migrate-* siblings live alongside the re-migrated compact
    #    batch), fails loudly instead of cutting over with every
    #    vector twice;
    # 3. the kind-matched fsck is clean.
    want_total = sum(oms[b].get("n_admitted", 0) for b in old_live)
    if n_vectors != want_total:
        raise RuntimeError(
            f"migration of {old_root} -> {new_root} holds "
            f"{n_vectors} vectors, old root has {want_total}")
    nms = _load_manifests(spark, new_root)
    live_new = sorted(b for b in nms if b not in _superseded(nms))
    if live_new != expected:
        raise RuntimeError(
            f"new root {new_root} holds live batches {live_new}, "
            f"expected exactly {expected} — a reused build root or "
            f"an old root compacted mid-migration would serve "
            f"duplicate vectors; start a fresh new_root")
    if kind == "ivf_incremental":
        from .ivf_index import verify_ivf_index
        fsck = verify_ivf_index(spark, new_root)
    else:
        from .ann_index import verify_ann_index
        fsck = verify_ann_index(spark, new_root)
    if fsck["violations"]:
        raise RuntimeError(
            f"new root {new_root} fails its fsck — refusing to cut "
            f"over: {fsck['violations']}")

    # 4. the OLD root must not have moved during the backfill (ADVICE
    # r10, medium): a batch committed to old_root while we re-routed —
    # e.g. by a still-running ingestion stream, which resolves its
    # pointer once at stream START and keeps writing to the old root —
    # would be silently absent from the new root after cutover. The
    # backfill verified the SNAPSHOT; re-load the old manifests and
    # abort before anyone (us via `pointer`, or the caller manually)
    # flips readers. Operationally: quiesce/stop writers on the old
    # root before migrating, and RESTART streams after the cutover so
    # they re-resolve the pointer.
    oms2 = _load_manifests(spark, old_root)
    old_live2 = sorted(b for b in oms2 if b not in _superseded(oms2))
    if old_live2 != old_live or any(oms2[b] != oms[b]
                                    for b in old_live):
        raise RuntimeError(
            f"old root {old_root} changed during the backfill (live "
            f"set was {old_live}, is now {old_live2}) — a writer is "
            f"still committing to it; its post-snapshot batches are "
            f"NOT in {new_root}. Quiesce old-root writers and re-run "
            f"the migration (committed migrate-* batches resume by "
            f"identity) before cutting over")

    # carry the committed recall series (r15 brief #3): the samples
    # are the root's QUALITY PROVENANCE — tune_tables prices
    # num_tables settings from samples that span a migration (each
    # sample records the num_tables/scan_frac it was measured
    # under). Each carried doc is TAGGED ``migrated_from``: it graded
    # the OLD structure — the very one this migration replaced — so
    # recall_history excludes carried samples from the new root's
    # below-floor accounting and the advisory's retrain trigger
    # skips them (a fresh post-retrain root must not re-alarm on the
    # decay it was built to fix). Small control-plane JSON;
    # resume-safe (skip existing).
    import json as _json

    from ..fs import list_dir as _ls
    from ..fs import path_exists as _pe
    from ..fs import read_text as _rt
    from ..fs import write_text_atomic as _wta
    from .recall import METRICS_DIR
    for n in _ls(spark, f"{old_root}/{METRICS_DIR}"):
        if not n.endswith(".json") or ".tmp-" in n:
            continue
        dst = f"{new_root}/{METRICS_DIR}/{n}"
        if not _pe(spark, dst):
            doc = _json.loads(
                _rt(spark, f"{old_root}/{METRICS_DIR}/{n}"))
            doc.setdefault("migrated_from", old_root)
            _wta(spark, dst, _json.dumps(doc, sort_keys=True))

    report = {"old_root": old_root, "new_root": new_root,
              "kind": kind, "batches_migrated": migrated,
              "batches_skipped": skipped, "n_vectors": n_vectors,
              "fsck": fsck, "pointer": pointer}
    if pointer is not None:
        set_index_pointer(spark, pointer, new_root,
                          note=f"migrated from {old_root}")
    return report
