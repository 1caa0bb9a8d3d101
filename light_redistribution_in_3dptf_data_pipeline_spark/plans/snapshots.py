"""Content-addressed snapshot PINS: reproducible reads over the
manifest-committed tables (plans/corpus.py and the vector indexes
sharing its protocol).

A training run that reports a loss curve must be able to name — and
later RE-READ — the exact corpus it saw. The committed view alone
cannot do that: compaction and retention supersede batches, and
``_prune_superseded`` (invoked eagerly at the end of both) deletes
their files. A PIN closes the gap:

- :func:`pin_snapshot` captures the current committed batch set plus
  a digest over the batches' manifest contents, and persists it as
  ``{root}/_pins/{digest}.json``. The digest is the snapshot's
  identity: two pins taken over identical committed content collide
  onto the SAME file (idempotent), any committed change yields a new
  digest — so "did these two runs train on the same data?" is a
  string comparison, not a data diff.
- While a pin exists, garbage collection HONORS it:
  ``corpus._prune_superseded`` skips pinned batch ids (manifest and
  data files both), so a pinned batch superseded by later compaction
  remains readable. Normal readers are unaffected — superseded means
  invisible to them regardless of whether files remain.
- :func:`read_pinned_table` re-reads exactly the pinned batch set by
  SELECTING THE PINNED PARTITION DIRECTORIES as read paths (with
  ``basePath`` so ``batch_id`` stays a column). No growing
  ``batch_id IN (...)`` literal and no dependence on the live
  committed set: the cost is O(|pin|) at plan time, however many
  batches land after the pin.
- :func:`release_pin` + the next prune reclaims the space.

Pins versus takedown: a right-to-be-forgotten deletion
(``corpus.delete_documents``) must WIN over reproducibility — a pin
that kept the pre-retention batches readable would keep the deleted
document readable too. ``delete_documents`` therefore refuses while
a pin covers any affected batch, unless told to release the
conflicting pins (recorded in the retain manifest for audit).

Everything here is control-plane: pin files are small JSON listings,
all validation is driver-side file existence + digest checks sized
by the pin (never a data scan), and the read path is a plain
partition-pruned Parquet scan.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession

from ..fs import delete_path, list_dir, path_exists, read_text, \
    write_text_atomic
from .corpus import (_load_manifests, _superseded, corpus_writer_lock)

PIN_DIR = "_pins"


class PinConflictError(RuntimeError):
    """A destructive retention op would leave deleted content
    readable through a snapshot pin. Deliberately NOT a ValueError:
    the takedown cascade treats ValueError as the benign
    "nothing left to remove here" no-op, and a pin conflict is the
    opposite — the content is still there and still pinned."""


def _pin_path(root: str, digest: str) -> str:
    return f"{root}/{PIN_DIR}/{digest}.json"


def _snapshot_digest(manifests: dict[str, dict],
                     batches: list[str]) -> str:
    """sha256 over the pinned batches' manifest CONTENTS (canonical
    JSON, sorted ids). Manifests are written once and never mutated,
    so equal digests ⇔ equal committed content + equal ledgers."""
    canon = json.dumps([[b, manifests[b]] for b in sorted(batches)],
                       sort_keys=True)
    return hashlib.sha256(canon.encode("utf-8")).hexdigest()[:32]


DEFAULT_PIN_OWNER = "anonymous"


def pin_snapshot(spark: SparkSession, root: str,
                 note: str | None = None,
                 owner: str = DEFAULT_PIN_OWNER,
                 created_at: float | None = None) -> dict:
    """Pin the CURRENT committed view of a manifest-protocol root.
    Returns the pin document (also persisted under
    ``{root}/_pins/``). Takes the writer lease: pinning mutates
    GC-relevant state, and racing an in-flight prune could otherwise
    pin a batch whose files were just swept.

    LIFECYCLE METADATA (VERDICT r9 missing #4 + ADVICE refcounting):
    the pin doc carries ``holders`` — ``{owner: created_at_epoch_sec}``
    — OUTSIDE the content address (the digest hashes manifests only,
    so metadata can never fork two pins over identical content). Two
    independent consumers pinning the same committed view land on the
    SAME file with BOTH holders recorded; ``release_pin(owner=...)``
    drops only that hold, and the file survives until the last holder
    releases — one consumer's release can no longer destroy
    another's. Re-pinning by the same owner REFRESHES their
    ``created_at`` (a renewed hold is not a forgotten one — the age
    flag in :func:`pins_report` keys off this). ``created_at``
    defaults to now; caller-suppliable for deterministic tests."""
    import time

    with corpus_writer_lock(spark, root, op="pin_snapshot") as lease:
        ms = _load_manifests(spark, root)
        gone = _superseded(ms)
        batches = sorted(b for b in ms if b not in gone)
        if not batches:
            raise ValueError(f"nothing to pin: no committed batches "
                             f"under {root}")
        digest = _snapshot_digest(ms, batches)
        holders = {}
        if path_exists(spark, _pin_path(root, digest)):
            prev = json.loads(read_text(spark,
                                        _pin_path(root, digest)))
            holders = dict(prev.get("holders", {}))
        holders[owner] = (float(created_at) if created_at is not None
                          else time.time())
        pin = {"snapshot_digest": digest, "batches": batches,
               "manifest_digests": {
                   b: hashlib.sha256(
                       json.dumps(ms[b], sort_keys=True)
                       .encode("utf-8")).hexdigest()[:32]
                   for b in batches},
               "holders": holders}
        if note is not None:
            pin["note"] = note
        lease.fence()
        # content-addressed name ⇒ re-pinning identical content
        # rewrites the same file (merging holders), not a second pin
        write_text_atomic(spark, _pin_path(root, digest),
                          json.dumps(pin, sort_keys=True))
        return pin


def list_pins(spark: SparkSession, root: str) -> dict[str, dict]:
    """All persisted pins, keyed by snapshot digest."""
    pins: dict[str, dict] = {}
    for n in list_dir(spark, f"{root}/{PIN_DIR}"):
        if n.endswith(".json") and ".tmp-" not in n:
            doc = json.loads(read_text(spark, f"{root}/{PIN_DIR}/{n}"))
            pins[doc["snapshot_digest"]] = doc
    return pins


def pinned_batches(spark: SparkSession, root: str) -> set[str]:
    """Union of every persisted pin's batch ids — the set GC must
    not touch. O(pins) small JSON reads, no data access."""
    out: set[str] = set()
    for pin in list_pins(spark, root).values():
        out |= set(pin["batches"])
    return out


def pins_report(spark: SparkSession, root: str,
                tables: "tuple[str, ...] | None" = None,
                max_age_seconds: float | None = None,
                max_held_bytes: int | None = None,
                now: float | None = None) -> dict:
    """What is each pin COSTING? Per pin: its batches split into
    still-live vs held-only (batches that exist on disk purely
    because the pin holds them — superseded, would be swept on
    release), and the held bytes across the root's batch tables.
    The operator's answer to "which forgotten pin is retaining a
    year of superseded batches". All control-plane: one
    ``getContentSummary`` per held batch directory, no data scan.

    LIFECYCLE policy (VERDICT r9 missing #4): each pin also reports
    its ``holders``, ``created_at`` (the OLDEST holder's — a pin is
    as forgotten as its most-stale holder; legacy pins without
    holders fall back to the pin file's mtime) and ``age_seconds``;
    ``max_age_seconds`` / ``max_held_bytes`` add per-pin ``flags``
    (``aged`` / ``over_budget``) and the top-level ``flagged_pins``
    list — the alarm feed for forgotten or oversized holds.

    ``tables`` defaults to the corpus ingest tables when the root has
    no ``_meta.json`` (a corpus root), else the vector table of the
    stored kind."""
    import time

    from ..fs import dir_bytes, file_mtime_ms
    from .corpus import _load_manifests, _superseded

    if tables is None:
        if path_exists(spark, f"{root}/_meta.json"):
            from .linkage import _index_kind

            tables = (("buckets"
                       if _index_kind(spark, root)
                       == "ann_lsh_incremental" else "postings"),)
        else:
            from .corpus import INGEST_TABLES
            tables = INGEST_TABLES

    ms = _load_manifests(spark, root)
    gone = _superseded(ms)
    t_now = time.time() if now is None else float(now)
    out: dict = {"pins": {}, "held_batches": [], "held_bytes": 0,
                 "flagged_pins": []}
    held_all: set[str] = set()
    for digest, pin in sorted(list_pins(spark, root).items()):
        held = sorted(set(pin["batches"]) & gone)
        live = sorted(set(pin["batches"]) - gone)
        held_all |= set(held)
        holders = pin.get("holders", {})
        created = (min(holders.values()) if holders
                   else file_mtime_ms(spark,
                                      _pin_path(root, digest)) / 1000)
        held_bytes = sum(
            dir_bytes(spark, f"{root}/{t}/batch_id={b}")
            for b in held for t in tables)
        flags = []
        if (max_age_seconds is not None
                and t_now - created > max_age_seconds):
            flags.append("aged")
        if max_held_bytes is not None and held_bytes > max_held_bytes:
            flags.append("over_budget")
        out["pins"][digest] = {
            "note": pin.get("note"),
            "n_batches": len(pin["batches"]),
            "live_batches": live,
            "held_batches": held,
            "held_bytes": held_bytes,
            "holders": dict(sorted(holders.items())),
            "created_at": created,
            "age_seconds": round(t_now - created, 3),
            "flags": flags,
        }
        if flags:
            out["flagged_pins"].append(digest)
    out["held_batches"] = sorted(held_all)
    out["held_bytes"] = sum(
        dir_bytes(spark, f"{root}/{t}/batch_id={b}")
        for b in held_all for t in tables)
    return out


def linked_pins_report(spark: SparkSession, corpus_root: str,
                       max_age_seconds: float | None = None,
                       max_held_bytes: int | None = None,
                       now: float | None = None) -> dict:
    """What does each LINKED pin cost, as ONE number (VERDICT r10
    brief #6): :func:`pins_report` prices per-root pins, but a
    multimodal snapshot holds batches on SEVERAL roots at once —
    this rolls every linked pin up to its total held bytes across
    member roots, the per-root split, and the OLDEST holder (a
    linked view is as forgotten as its most-stale hold, whether that
    hold is on the linked doc or a member pin). ``max_age_seconds``/
    ``max_held_bytes`` flag ``aged``/``over_budget`` against the
    ROLLED-UP numbers — the per-root reports can each sit under a
    budget while the linked total blows it.

    All control-plane: one :func:`pins_report` per distinct member
    root (cached across linked pins), small JSON reads otherwise.
    Member pins already released (e.g. by a takedown) are listed
    under ``missing_member_pins`` and price as 0 —
    :func:`verify_linked_pin` is the fsck that calls that state a
    violation."""
    import time

    t_now = time.time() if now is None else float(now)
    linked = list_linked_pins(spark, corpus_root)
    root_reports: dict[str, dict] = {}

    def _root_report(root: str) -> dict:
        if root not in root_reports:
            root_reports[root] = pins_report(spark, root)
        return root_reports[root]

    out: dict = {"linked": {}, "flagged_linked_pins": []}
    for ldigest, doc in sorted(linked.items()):
        members = {corpus_root: doc["corpus_pin"],
                   **doc["index_pins"]}
        per_root: dict = {}
        missing: list[str] = []
        total = 0
        oldest = min(doc.get("holders", {}).values(), default=None)
        for root, d in sorted(members.items()):
            entry = _root_report(root)["pins"].get(d)
            if entry is None:
                missing.append(f"{root}:{d}")
                continue
            per_root[root] = {"pin": d,
                              "held_bytes": entry["held_bytes"],
                              "held_batches": entry["held_batches"],
                              "created_at": entry["created_at"]}
            total += entry["held_bytes"]
            oldest = (entry["created_at"] if oldest is None
                      else min(oldest, entry["created_at"]))
        flags = []
        if (max_age_seconds is not None and oldest is not None
                and t_now - oldest > max_age_seconds):
            flags.append("aged")
        if max_held_bytes is not None and total > max_held_bytes:
            flags.append("over_budget")
        out["linked"][ldigest] = {
            "note": doc.get("note"),
            "holders": dict(sorted(doc.get("holders", {}).items())),
            "roots": per_root,
            "missing_member_pins": missing,
            "held_bytes": total,
            "oldest_created_at": oldest,
            "age_seconds": (round(t_now - oldest, 3)
                            if oldest is not None else None),
            "flags": flags,
        }
        if flags:
            out["flagged_linked_pins"].append(ldigest)
    return out


def release_pin(spark: SparkSession, root: str, digest: str,
                owner: str | None = DEFAULT_PIN_OWNER) -> bool:
    """Release a pin. With ``owner`` given, drop only that holder's
    hold (the refcounted path — ADVICE r9: shared content-addressed
    pins must not let one consumer's release destroy another's); the
    file — and with it the GC hold — is deleted only when the LAST
    holder releases. ``owner=None`` is the GLOBAL release: the file
    is deleted regardless of other holders — the takedown-cascade /
    operator escape hatch, and it must be REQUESTED explicitly
    (ADVICE r10: the default is :data:`DEFAULT_PIN_OWNER`, matching
    ``pin_snapshot``'s, so pin-with-defaults + release-with-defaults
    releases exactly the anonymous hold instead of destroying every
    other consumer's by accident). Batches become reclaimable by the
    NEXT ``prune_superseded`` (release never deletes data itself).
    Returns True iff the pin file is gone after this call; False
    when it never existed or other holders keep it alive."""
    with corpus_writer_lock(spark, root,
                            op=f"release_pin:{digest}") as lease:
        path = _pin_path(root, digest)
        if not path_exists(spark, path):
            return False
        if owner is not None:
            doc = json.loads(read_text(spark, path))
            holders = dict(doc.get("holders", {}))
            if owner not in holders:
                # not a holder (incl. legacy pins without a holders
                # dict): an owner-scoped release must never destroy
                # someone else's hold — release those ownerless
                return False
            holders.pop(owner)
            if holders:
                doc["holders"] = holders
                lease.fence()
                write_text_atomic(spark, path,
                                  json.dumps(doc, sort_keys=True))
                return False
        lease.fence()
        return delete_path(spark, path)


def _resolve_pin(spark: SparkSession, root: str,
                 pin: "dict | str") -> dict:
    if isinstance(pin, str):
        path = _pin_path(root, pin)
        if not path_exists(spark, path):
            raise ValueError(f"no pin {pin!r} under {root}/{PIN_DIR}")
        return json.loads(read_text(spark, path))
    return pin


def read_pinned_table(spark: SparkSession, root: str,
                      pin: "dict | str", table: str,
                      schema: str | None = None) -> DataFrame:
    """Read one batch-partitioned table EXACTLY as the pin saw it:
    the read paths are the pinned partition directories themselves
    (``basePath`` keeps ``batch_id`` as a column), so the plan never
    depends on what was committed, compacted, or ingested since.
    Batches whose manifest admitted zero rows have no directory and
    are skipped by construction. Raises — naming the batches — when
    pinned data has been swept (pin released then pruned, or an
    out-of-band delete): a reproducibility claim must fail loudly,
    not silently shrink."""
    doc = _resolve_pin(spark, root, pin)
    base = f"{root}/{table}"
    ms = _load_manifests(spark, root)
    paths, missing = [], []
    for b in doc["batches"]:
        p = f"{base}/batch_id={b}"
        if path_exists(spark, p):
            paths.append(p)
        elif ms.get(b, {}).get("n_admitted", None) == 0:
            continue    # an all-gated batch never had a directory
        else:
            missing.append(b)
    if missing:
        raise FileNotFoundError(
            f"pin {doc['snapshot_digest']} is no longer readable "
            f"under {base}: batches {missing} have been removed "
            f"(released+pruned, or deleted out-of-band). "
            f"verify_pin(...) reports per-batch state.")
    if not paths:
        raise FileNotFoundError(
            f"pin {doc['snapshot_digest']} references no non-empty "
            f"batches in {base}")
    reader = spark.read.option("basePath", base)
    if schema:
        reader = reader.schema(schema)
    return reader.parquet(*paths)


def read_corpus_pinned(spark: SparkSession, root: str,
                       pin: "dict | str") -> DataFrame:
    """The pinned corpus — :func:`read_pinned_table` over the
    ``corpus`` table (document rows; the dedup-index tables pin the
    same way when needed)."""
    return read_pinned_table(spark, root, pin, "corpus")


LINKED_PIN_DIR = "_linked_pins"


def read_vectors_pinned(spark: SparkSession, index_root: str,
                        pin: "dict | str") -> DataFrame:
    """The pinned committed vectors of an incremental index root —
    :func:`read_pinned_table` over the kind's data table (LSH
    ``buckets`` / IVF ``postings``, dispatched on ``_meta.json``
    like every other cross-family entry point). int8-storage roots
    (r12, plans/codes.py) additionally carry a DEQUANTIZED
    ``embedding`` column next to the stored code/scale, so linked
    multimodal training reads (``read_linked_pinned``) are
    storage-independent — lossy by exactly the sim5 reconstruction
    error, like every other dequantizing view."""
    import json as _json

    from ..fs import read_text
    from .linkage import _index_kind

    table = ("buckets"
             if _index_kind(spark, index_root) == "ann_lsh_incremental"
             else "postings")
    scan = read_pinned_table(spark, index_root, pin, table)
    meta = _json.loads(read_text(spark, f"{index_root}/_meta.json"))
    if meta.get("storage", "float") == "int8":
        from pyspark.sql import functions as F

        from .codes import dequant_embedding
        scan = scan.withColumn(
            "embedding",
            dequant_embedding(F.col("code"), F.col("scale")))
    return scan


def pin_linked(spark: SparkSession, corpus_root: str,
               index_roots: "list[str]",
               note: str | None = None,
               owner: str = DEFAULT_PIN_OWNER,
               created_at: float | None = None) -> dict:
    """Pin a corpus AND its vector indexes as one linked training
    view: each root gets its own pin (GC on every root holds its
    batches), and the linked document — content-addressed over the
    per-root digests — lands under ``{corpus_root}/_linked_pins/``.
    Two linked pins with equal digests saw identical documents AND
    identical vectors on every root: the reproducibility contract a
    multimodal training join needs, since the roots commit under
    separate leases.

    The roots are pinned sequentially (there is deliberately no
    cross-root transaction — same design as the takedown cascade), so
    a writer landing between two pins can leave the linked view with
    a coverage gap; :func:`verify_linked_pin` measures exactly that
    instead of pretending atomicity."""
    import time

    cpin = pin_snapshot(spark, corpus_root, note=note, owner=owner,
                        created_at=created_at)
    ipins = {r: pin_snapshot(spark, r, note=note, owner=owner,
                             created_at=created_at)
             for r in index_roots}
    ident = {"corpus": cpin["snapshot_digest"],
             "indexes": {r: p["snapshot_digest"]
                         for r, p in ipins.items()}}
    digest = hashlib.sha256(
        json.dumps(ident, sort_keys=True)
        .encode("utf-8")).hexdigest()[:32]
    # linked docs refcount holders exactly like the per-root pins:
    # two consumers linking identical content collide onto one
    # content-addressed doc with BOTH holds recorded (a last-writer-
    # wins single owner field would let either release destroy the
    # other's view). The read→merge→write runs under the corpus
    # root's writer lease (ADVICE r10) — the same protocol the
    # per-root pin RMW already follows — so two consumers racing
    # pin_linked/release_linked_pin on the same content serialize
    # instead of last-writer-winsing a holder away. Taken AFTER the
    # per-root pin_snapshot calls above (each takes-and-releases the
    # same lease; it is not re-entrant).
    lpath = f"{corpus_root}/{LINKED_PIN_DIR}/{digest}.json"
    with corpus_writer_lock(spark, corpus_root,
                            op=f"pin_linked:{digest}") as lease:
        holders: dict = {}
        if path_exists(spark, lpath):
            holders = dict(json.loads(read_text(spark, lpath))
                           .get("holders", {}))
        holders[owner] = (float(created_at) if created_at is not None
                          else time.time())
        doc = {"linked_digest": digest, "corpus_root": corpus_root,
               "corpus_pin": cpin["snapshot_digest"],
               "index_pins": ident["indexes"],
               "holders": holders}
        if note is not None:
            doc["note"] = note
        lease.fence()
        write_text_atomic(spark, lpath, json.dumps(doc, sort_keys=True))
    return doc


def list_linked_pins(spark: SparkSession,
                     corpus_root: str) -> dict[str, dict]:
    """All persisted linked pins under a corpus root, keyed by
    linked digest — the enumeration the deployment fsck walks."""
    out: dict[str, dict] = {}
    for n in list_dir(spark, f"{corpus_root}/{LINKED_PIN_DIR}"):
        if n.endswith(".json") and ".tmp-" not in n:
            doc = json.loads(read_text(
                spark, f"{corpus_root}/{LINKED_PIN_DIR}/{n}"))
            out[doc["linked_digest"]] = doc
    return out


def _resolve_linked(spark: SparkSession, corpus_root: str,
                    linked: "dict | str") -> dict:
    if isinstance(linked, str):
        path = f"{corpus_root}/{LINKED_PIN_DIR}/{linked}.json"
        if not path_exists(spark, path):
            raise ValueError(
                f"no linked pin {linked!r} under "
                f"{corpus_root}/{LINKED_PIN_DIR}")
        return json.loads(read_text(spark, path))
    return linked


def release_linked_pin(spark: SparkSession, corpus_root: str,
                       linked: "dict | str",
                       owner: str | None = DEFAULT_PIN_OWNER) -> bool:
    """Release a linked pin. With ``owner`` given, drop only that
    holder's hold: the owner's per-root holds are released
    (refcounted — a per-root pin shared with other holders keeps
    theirs), the linked doc's holders shrink, and the doc itself is
    deleted only when the LAST holder leaves. ``owner=None`` is the
    GLOBAL release — every recorded holder's per-root holds are
    dropped (ownerless on legacy docs) and the doc is deleted — and
    must be requested explicitly (the default matches
    ``pin_linked``'s, mirroring ``release_pin``, ADVICE r10).
    Idempotent: already-released parts no-op. Returns True iff the
    linked doc is gone after this call.

    Locking (ADVICE r10): every read→modify→write of the linked doc
    runs under the corpus root's writer lease with a FRESH read of
    the doc — a holder merged in by a concurrent ``pin_linked`` since
    this caller resolved ``linked`` survives, and two concurrent
    releases of different owners cannot last-writer-wins each other.
    The underlying per-root releases run BEFORE the doc shrinks (a
    crash in between leaves the holder recorded with its per-root
    holds already gone — the retry direction that heals; the reverse
    order would leak per-root pins with no record), and outside the
    lease, since ``release_pin`` takes the same non-reentrant lease
    on the corpus root."""
    doc = _resolve_linked(spark, corpus_root, linked)
    lpath = (f"{corpus_root}/{LINKED_PIN_DIR}/"
             f"{doc['linked_digest']}.json")
    lock_op = f"release_linked:{doc['linked_digest']}"

    def _release_underlying(o: str | None) -> None:
        for iroot, d in sorted(doc["index_pins"].items()):
            release_pin(spark, iroot, d, owner=o)
        release_pin(spark, corpus_root, doc["corpus_pin"], owner=o)

    if owner is not None:
        with corpus_writer_lock(spark, corpus_root, op=lock_op):
            if not path_exists(spark, lpath):
                return False
            fresh = json.loads(read_text(spark, lpath))
            if owner not in fresh.get("holders", {}):
                # not a holder (incl. legacy docs without holders):
                # owner-scoped release never destroys another's view
                return False
        _release_underlying(owner)
        with corpus_writer_lock(spark, corpus_root,
                                op=lock_op) as lease:
            if not path_exists(spark, lpath):
                # a racing global release deleted the doc between the
                # two lock blocks: the doc IS gone after this call and
                # this owner's underlying holds were released above —
                # the documented "True iff the linked doc is gone"
                # contract says True (ADVICE r11)
                return True
            fresh = json.loads(read_text(spark, lpath))
            holders = dict(fresh.get("holders", {}))
            holders.pop(owner, None)
            if holders:
                fresh["holders"] = holders
                lease.fence()
                write_text_atomic(spark, lpath,
                                  json.dumps(fresh, sort_keys=True))
                return False
            lease.fence()
            delete_path(spark, lpath)
            return True
    # global release (or legacy doc without holders): drop every
    # recorded holder's underlying holds, then ownerless for legacy
    with corpus_writer_lock(spark, corpus_root, op=lock_op):
        if path_exists(spark, lpath):
            doc = json.loads(read_text(spark, lpath))
    holders = dict(doc.get("holders", {}))
    for h in sorted(holders) or [None]:
        _release_underlying(h)
    with corpus_writer_lock(spark, corpus_root, op=lock_op) as lease:
        lease.fence()
        delete_path(spark, lpath)
    return True


def read_linked_pinned(spark: SparkSession, corpus_root: str,
                       linked: "dict | str",
                       index_root: str | None = None) -> DataFrame:
    """The pinned MULTIMODAL training frame: pinned documents
    inner-joined with their pinned embeddings (``vec_id == doc_id``)
    — what a text+embedding training build reads. The inner join
    drops pinned docs without a pinned vector (the coverage gap
    :func:`verify_linked_pin` counts — check it first if silent
    drops matter). ``index_root`` picks the embedding source when
    the linked pin covers several; with exactly one it may be
    omitted. Both sides are pinned path-selected scans, and the join
    key is the id on both — at scale this is one shuffle-or-broadcast
    equi-join, nothing else."""
    doc = _resolve_linked(spark, corpus_root, linked)
    roots = sorted(doc["index_pins"])
    if index_root is None:
        if len(roots) != 1:
            raise ValueError(
                f"linked pin {doc['linked_digest']} covers index "
                f"roots {roots} — pass index_root to choose the "
                f"embedding source")
        index_root = roots[0]
    elif index_root not in doc["index_pins"]:
        raise ValueError(
            f"linked pin {doc['linked_digest']} does not cover "
            f"index root {index_root!r} (it has {roots})")
    docs = read_corpus_pinned(spark, corpus_root, doc["corpus_pin"])
    vecs = (read_vectors_pinned(spark, index_root,
                                doc["index_pins"][index_root])
            .select("vec_id", "embedding"))
    return (docs.join(vecs, docs.doc_id == vecs.vec_id, "inner")
            .drop("vec_id"))


def verify_linked_pin(spark: SparkSession, corpus_root: str,
                      linked: "dict | str") -> dict:
    """Linked-pin fsck: every per-root pin must verify clean, and the
    PINNED id sets must agree (``vec_id == doc_id``) — the pinned
    analog of ``linkage.verify_linked``. Coverage gaps (pinned docs
    without pinned vectors, e.g. a writer landed between the two
    pins) are reported as counts; pinned ORPHAN vectors are
    violations exactly like the live fsck, since a pinned training
    join would read an embedding whose document the view does not
    contain."""
    doc = _resolve_linked(spark, corpus_root, linked)
    report: dict = {"linked_digest": doc["linked_digest"],
                    "pins": {}, "coverage": {}, "violations": []}
    try:
        cpin_rep = verify_pin(spark, corpus_root, doc["corpus_pin"])
    except ValueError:
        # underlying pin released (e.g. by a takedown with
        # release_conflicting_pins) — the linked view is dead
        report["violations"].append(
            f"{corpus_root}: underlying pin {doc['corpus_pin']} is "
            f"gone — the linked view is no longer reproducible")
        return report
    report["pins"][corpus_root] = cpin_rep
    report["violations"] += [f"{corpus_root}: {v}"
                             for v in cpin_rep["violations"]]
    # an unreadable pinned corpus (swept data / deleted manifests)
    # is already a violation above; the per-index pin fscks still
    # run, only the coverage joins are skipped — they would crash on
    # the same missing directories (read_*_pinned raises by design)
    corpus_readable = not (cpin_rep["missing_data"]
                           or cpin_rep["missing_manifests"])
    doc_ids = (read_corpus_pinned(spark, corpus_root,
                                  doc["corpus_pin"])
               .select("doc_id") if corpus_readable else None)
    from .linkage import _index_kind

    for iroot, d in sorted(doc["index_pins"].items()):
        table = ("buckets"
                 if _index_kind(spark, iroot) == "ann_lsh_incremental"
                 else "postings")
        try:
            irep = verify_pin(spark, iroot, d, table=table)
        except ValueError:
            report["violations"].append(
                f"{iroot}: underlying pin {d} is gone — the linked "
                f"view is no longer reproducible")
            continue
        report["pins"][iroot] = irep
        report["violations"] += [f"{iroot}: {v}"
                                 for v in irep["violations"]]
        if (doc_ids is None or irep["missing_data"]
                or irep["missing_manifests"]):
            continue   # unreadable side: reported, not crashed
        vec_ids = (read_vectors_pinned(spark, iroot, d)
                   .select("vec_id"))
        gap = doc_ids.join(vec_ids,
                           doc_ids.doc_id == vec_ids.vec_id,
                           "left_anti").count()
        orphans = vec_ids.join(doc_ids,
                               vec_ids.vec_id == doc_ids.doc_id,
                               "left_anti").count()
        report["coverage"][iroot] = {"docs_without_vectors": gap,
                                     "orphan_vectors": orphans}
        if orphans:
            report["violations"].append(
                f"{iroot}: {orphans} pinned vectors have no pinned "
                f"document — the linked view would leak embeddings "
                f"of documents it does not contain")
    return report


def training_build_pinned(spark: SparkSession, corpus_root: str,
                          build_root: str, weights: dict,
                          pin: "dict | str | None" = None,
                          n_shards: int = 8,
                          stratum_col: str = "source",
                          mixture_salt: str | None = None) -> dict:
    """A training build whose input is a PINNED committed corpus —
    the reproducibility loop closed end-to-end:

    1. Pin the corpus now (or reuse ``pin``): GC holds the pinned
       batches for as long as the pin exists.
    2. Run mixture → leakage-proof packing → shard export over
       :func:`read_corpus_pinned` (the SAME stage code as
       ``corpus.build_training_pipeline`` — shared via
       ``add_mixture_pack_stages``). The mixture gate is a salted
       deterministic hash, so pin + params fully determine every
       shard byte.
    3. Record ``{build_root}/build_manifest.json`` naming the
       snapshot digest and parameters — a finished build ANSWERS
       "what data was this model trained on", and two builds trained
       on the same data iff their digests match.

    The pipeline memoizes per stage; re-running the same build_root
    with a DIFFERENT pin raises instead of silently serving the old
    memoized stages under the new pin's name."""
    from .corpus import (TRAINING_MIXTURE_SALT, add_mixture_pack_stages,
                         run_training_build)
    from .pipeline import Pipeline

    salt = (TRAINING_MIXTURE_SALT if mixture_salt is None
            else mixture_salt)
    if pin is None:
        doc = pin_snapshot(spark, corpus_root,
                           note=f"training_build:{build_root}")
    else:
        doc = _resolve_pin(spark, corpus_root, pin)
    digest = doc["snapshot_digest"]

    mpath = f"{build_root.rstrip('/')}/build_manifest.json"
    if path_exists(spark, mpath):
        existing = json.loads(read_text(spark, mpath))
        if existing["snapshot_digest"] != digest:
            raise ValueError(
                f"build root {build_root} already holds a build over "
                f"snapshot {existing['snapshot_digest']} — its "
                f"memoized stages would be silently served for "
                f"snapshot {digest}. Use a fresh build root per "
                f"snapshot.")

    p = Pipeline(build_root)
    p.add("corpus",
          lambda s: read_corpus_pinned(s, corpus_root, doc))
    add_mixture_pack_stages(p, weights, stratum_col=stratum_col,
                            mixture_salt=salt)
    shards = run_training_build(spark, p, n_shards)

    manifest = {"snapshot_digest": digest,
                "corpus_root": corpus_root,
                "n_pinned_batches": len(doc["batches"]),
                "weights": dict(sorted(weights.items())),
                "stratum_col": stratum_col,
                "mixture_salt": salt,
                "n_shards": n_shards,
                "n_rows": shards.count()}
    write_text_atomic(spark, mpath,
                      json.dumps(manifest, sort_keys=True))
    return manifest


def training_build_linked_pinned(spark: SparkSession,
                                 corpus_root: str, build_root: str,
                                 weights: dict,
                                 linked: "dict | str | None" = None,
                                 index_root: str | None = None,
                                 n_shards: int = 8,
                                 stratum_col: str = "source",
                                 mixture_salt: str | None = None,
                                 owner: str = DEFAULT_PIN_OWNER
                                 ) -> dict:
    """The MULTIMODAL :func:`training_build_pinned` (VERDICT r10
    stretch #8): text AND embedding shards reproducible under ONE
    linked digest.

    - Input is :func:`read_linked_pinned` — pinned documents
      inner-joined with their pinned vectors, so only documents the
      linked view can fully represent train (the silent-drop caveat
      of the inner join applies; run :func:`verify_linked_pin`
      first when coverage matters).
    - The TEXT path is the shared mixture → leakage-proof pack →
      token-balanced shard stages (``add_mixture_pack_stages`` — the
      same code as the text-only build, so packing semantics cannot
      drift).
    - The VECTOR path exports ``{build_root}/vector_shards``: the
      pinned embeddings of exactly the documents the mixture
      sampled (each original document ONCE, however many epoch
      copies the mixture drew — the embedding is per-document
      content, not per-copy), sharded by ``pmod(doc_id, n_shards)``
      so a trainer streams text shard i and looks up vectors by the
      same key. One column-pruned semi-join against the mixture
      output; memoized like every other stage.
    - ``build_manifest.json`` names the LINKED digest (plus the
      underlying per-root pins): two multimodal builds trained on
      the same text+vectors iff their linked digests match. A build
      root holding a different linked digest refuses, mirroring the
      text-only stale-root guard."""
    from .corpus import (TRAINING_MIXTURE_SALT,
                         add_mixture_pack_stages, run_training_build)
    from .pipeline import Pipeline

    salt = (TRAINING_MIXTURE_SALT if mixture_salt is None
            else mixture_salt)
    if linked is None:
        if index_root is None:
            raise ValueError(
                "pass index_root to create the linked pin, or an "
                "existing `linked` pin")
        doc = pin_linked(spark, corpus_root, [index_root],
                         note=f"training_build:{build_root}",
                         owner=owner)
    else:
        doc = _resolve_linked(spark, corpus_root, linked)
    roots = sorted(doc["index_pins"])
    if index_root is None:
        if len(roots) != 1:
            raise ValueError(
                f"linked pin {doc['linked_digest']} covers index "
                f"roots {roots} — pass index_root to choose the "
                f"embedding source")
        index_root = roots[0]
    digest = doc["linked_digest"]

    mpath = f"{build_root.rstrip('/')}/build_manifest.json"
    if path_exists(spark, mpath):
        existing = json.loads(read_text(spark, mpath))
        if existing.get("linked_digest") != digest:
            raise ValueError(
                f"build root {build_root} already holds a build over "
                f"linked snapshot {existing.get('linked_digest')} — "
                f"its memoized stages would be silently served for "
                f"{digest}. Use a fresh build root per snapshot.")

    p = Pipeline(build_root)
    p.add("corpus",
          lambda s: read_linked_pinned(s, corpus_root, doc,
                                       index_root=index_root)
          .drop("embedding"))
    add_mixture_pack_stages(p, weights, stratum_col=stratum_col,
                            mixture_salt=salt)
    shards = run_training_build(spark, p, n_shards)

    from pyspark.sql import functions as F
    vpath = f"{build_root.rstrip('/')}/vector_shards"
    if not path_exists(spark, f"{vpath}/_SUCCESS"):
        sampled = (spark.read.parquet(p.path("mixture"))
                   .select("doc_id").distinct())
        vecs = read_vectors_pinned(
            spark, index_root, doc["index_pins"][index_root])
        (vecs.join(sampled, vecs.vec_id == sampled.doc_id,
                   "left_semi")
         .withColumn("shard", F.pmod(F.col("vec_id"),
                                     F.lit(n_shards)))
         .repartition(n_shards, F.col("shard"))
         .write.mode("overwrite").partitionBy("shard")
         .parquet(vpath))
    n_vec = spark.read.parquet(vpath).count()

    manifest = {"linked_digest": digest,
                "corpus_root": corpus_root,
                "corpus_pin": doc["corpus_pin"],
                "index_root": index_root,
                "index_pin": doc["index_pins"][index_root],
                "weights": dict(sorted(weights.items())),
                "stratum_col": stratum_col,
                "mixture_salt": salt,
                "n_shards": n_shards,
                "n_rows": shards.count(),
                "n_vector_rows": n_vec}
    write_text_atomic(spark, mpath,
                      json.dumps(manifest, sort_keys=True))
    return manifest


def verify_pin(spark: SparkSession, root: str,
               pin: "dict | str", table: str = "corpus") -> dict:
    """Pin fsck: is the snapshot still readable and UNCHANGED?

    - ``missing_data``: pinned batches whose partition directory is
      gone (and whose manifest says rows were admitted);
    - ``missing_manifests``: pinned batches whose manifest file was
      deleted (identity survives only inside the pin);
    - ``digest_drift``: pinned batches whose CURRENT manifest content
      no longer hashes to the pinned digest — a rewritten commit
      record, which manifests-are-immutable forbids;
    - ``violations``: human-readable summary; empty = reproducible.
    """
    doc = _resolve_pin(spark, root, pin)
    ms = _load_manifests(spark, root)
    missing_data, missing_manifests, drift = [], [], []
    for b in doc["batches"]:
        have_manifest = b in ms
        if not have_manifest:
            missing_manifests.append(b)
        else:
            want = doc.get("manifest_digests", {}).get(b)
            got = hashlib.sha256(
                json.dumps(ms[b], sort_keys=True)
                .encode("utf-8")).hexdigest()[:32]
            if want is not None and got != want:
                drift.append(b)
        n_admitted = ms[b].get("n_admitted") if have_manifest else None
        if n_admitted == 0:
            continue
        if not path_exists(spark, f"{root}/{table}/batch_id={b}"):
            missing_data.append(b)
    violations = []
    if missing_data:
        violations.append(f"missing_data: batches {missing_data} of "
                          f"pin {doc['snapshot_digest']} are gone")
    if missing_manifests:
        violations.append(f"missing_manifests: {missing_manifests}")
    if drift:
        violations.append(
            f"digest_drift: manifests {drift} were rewritten after "
            f"the pin — commit records are immutable by contract")
    return {"snapshot_digest": doc["snapshot_digest"],
            "n_batches": len(doc["batches"]),
            "missing_data": missing_data,
            "missing_manifests": missing_manifests,
            "digest_drift": drift,
            "violations": violations}
