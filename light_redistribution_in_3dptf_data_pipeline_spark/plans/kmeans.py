"""Deterministic distributed k-means — the coarse-quantizer TRAINER
the incremental IVF index was missing (VERDICT r10 brief #1): until
now ``init_ivf_index`` could only freeze centroids from a LABELED
frame, so on real unlabeled embeddings there was no way to stand the
index up (and ``migrate_index`` needed caller labels to re-train).

Everything is exactly reproducible — same input content ⇒ bit-equal
centroids, under ANY partitioning, any cluster size, any day:

- **Seeding**: the k rows with the smallest ``md5(vec_id)`` (the
  hash-order trick of queries/sampling.py — a deterministic uniform
  draw with no RNG state), tie-broken by vec_id. Content-determined,
  not partition-determined.
- **Lloyd iterations**: assignment is an argmin over EXACT integer
  arithmetic — embeddings become nano-unit int64 components
  (``operators.similarity._fixed_point``, the engine-wide parity
  discipline) and every vector·centroid dot product is the exact
  hi/lo-split integer fold (``queries.similarity._fixed_dot`` with
  the centroid-sum split of plans/ivf_index). The only floats are
  final per-row comparisons of exactly-derived values — IEEE
  doubles, identical on every executor. The update step is a
  per-cell SUM of int64 components + a count: exact integers, so
  associativity/commutativity make the result partition-independent.
- **Empty cells** re-seed deterministically with the rows FARTHEST
  from their assigned centroid (ties to the smaller vec_id) —
  k-means++-style spread without randomness.
- **Fixed iteration cap** plus early exit when the centroid table
  reaches a fixed point (exact integer equality, not a float
  tolerance).

Inertia (Σ‖x − mean(cell(x))‖²) is computed per iteration from the
exact per-cell identity Σ‖x−μ‖² = Σ‖x‖² − ‖Σx‖²/n, with arbitrary-
precision Python integers on the driver — so the monotone-descent
property of Lloyd's algorithm is testable without float-sum noise
(tests/test_kmeans.py pins it).

Scale shape: each iteration is ONE pass over the vectors — the k-row
centroid table is broadcast, the per-vector×centroid scores collapse
map-side (the broadcast cross join keeps a vector's k candidate rows
in its own partition, so the groupBy(vec_id) partial-aggregates to
one row per vector before the exchange), and the update is a k-row
aggregate. Per iteration: one N-row shuffle, one k-row collect.
Standard practice at 100 TB is to train on a sample
(init_ivf_index's docstring already says so) — the trainer takes any
(vec_id, embedding) frame, sampled or full.

The reference re-clusters per run with scipy k-means
(operators/similarity.write_ivf_index cites it); this module is that
step's production completion for the incremental index family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import EMB_DIM, _fixed_point
from .ivf_index import CSUM_SPLIT, _checked_dim

DEFAULT_ITERS = 10


def _centroid_frame(spark: SparkSession, cents: list) -> DataFrame:
    """The driver-held centroid list [(cell, csum ints, nv)] as the
    k-row broadcastable frame every iteration joins against — with
    the squared-mean term ``m2 = ‖μ_c‖²`` (nano²) precomputed on the
    driver from the exact integers (one float conversion per cell,
    deterministic), so argmin ‖x−μ_c‖² needs only
    ``key_c = m2_c − 2·x·μ_c`` executor-side (‖x‖² is constant per
    row and drops out of the comparison)."""
    return spark.createDataFrame(
        [(int(c), [int(s) for s in cs], int(n),
          float(sum(int(s) * int(s) for s in cs))
          / (int(n) * int(n)))
         for c, cs, n in cents],
        "cell BIGINT, csum ARRAY<BIGINT>, nv BIGINT, m2 DOUBLE")


def _assign_key():
    """The per-(vector, centroid) argmin key ‖μ‖² − 2·x·μ in nano²
    — exact integer dot, two exactly-derived doubles, one IEEE
    subtract: identical on every executor, every partitioning."""
    from ..queries.similarity import _fixed_dot

    return (F.col("m2")
            - 2.0 * (_fixed_dot("ci", "csum", split=CSUM_SPLIT)
                     .cast("double") / F.col("nv")))


def _seed_centroids(dec: DataFrame, k: int) -> list:
    """k deterministic seeds: smallest md5(vec_id) first (the
    hash-gate ordering of queries/sampling.py — uniform, content-
    keyed, partition-independent), each seed a 1-member centroid."""
    rows = (dec.select(
        "vec_id", "ci",
        F.md5(F.col("vec_id").cast("string").cast("binary"))
        .alias("hkey"))
        .orderBy("hkey", "vec_id").limit(k).collect())
    return [(j, [int(x) for x in r.ci], 1)
            for j, r in enumerate(rows)]


def _exact_inertia(stats: list) -> "tuple[object, float]":
    """(exact Fraction, float in embedding units²) of
    Σ_cell (Σ‖x‖² − ‖Σx‖²/n) from the collected per-cell exact
    integers — driver-side arbitrary precision, no float-sum order
    dependence (k terms, k driver-sized)."""
    from fractions import Fraction

    total = Fraction(0)
    for _, csum, nv, sumx2 in stats:
        total += Fraction(int(sumx2)) \
            - Fraction(sum(int(s) * int(s) for s in csum), int(nv))
    # nano² → embedding units²
    return total, float(total) / 1e18


def train_centroids(spark: SparkSession, emb: DataFrame, k: int,
                    n_iters: int = DEFAULT_ITERS,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    dim: int = EMB_DIM) -> dict:
    """Lloyd's k-means over an UNLABELED (id, embedding) frame —
    deterministic by construction (module docstring). Returns::

        {"labeled":  DataFrame(vec_id, embedding, label),
         "centroids": [(cell, csum, nv), ...],   # exact ints
         "inertia":  [float, ...],    # per completed iteration
         "reseeds":  [int, ...],      # empty cells re-seeded / iter
         "n_iters_run": int, "k": int, "converged": bool}

    ``labeled`` feeds straight into :func:`ivf_index.init_ivf_index`
    (``cell_col="label"``) — or pass ``train_k=`` there and it calls
    this trainer itself. The assignment metric is exact squared L2
    (argmin ‖x − μ_c‖², ties to the lower cell id); note the frozen
    quantizer PLACES deltas by max mean-dot (ivf_index._cell_scores)
    — the two agree on separated clusters, and the clustered recall
    fixture (tests/test_recall.py) pins that the trained quantizer
    actually probes well, which is the contract that matters."""
    from ..queries.similarity import _fixed_dot

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    dec = (emb.select(
        F.col(id_col).cast("bigint").alias("vec_id"),
        F.col(vec_col).cast("array<float>").alias("embedding"),
        _fixed_point(_checked_dim(F.col(vec_col), dim,
                                  "train_centroids")).alias("ci"))
        .withColumn("x2", _fixed_dot("ci", "ci"))
        .localCheckpoint())     # one materialization; every
    #                             iteration re-reads this, not lineage
    n = dec.count()
    if n < k:
        raise ValueError(
            f"cannot train {k} centroids from {n} vectors")

    cents = _seed_centroids(dec, k)
    inertia: list[float] = []
    reseeds: list[int] = []
    converged = False

    for _ in range(n_iters):
        cf = _centroid_frame(spark, cents)
        scored = (dec.crossJoin(F.broadcast(cf))
                  .select("vec_id", "ci", "x2", "cell",
                          _assign_key().alias("key")))
        # argmin over k candidate rows per vector; the broadcast
        # cross join keeps them in one partition, so this partial-
        # aggregates map-side to one row per vec_id pre-exchange.
        # min(key) rides along as the chosen distance term (reseed
        # ranking); ci/x2 are identical across a vector's k rows.
        assigned = (scored.groupBy("vec_id")
                    .agg(F.max_by(
                        F.col("cell"),
                        F.struct((-F.col("key")).alias("nk"),
                                 (-F.col("cell")).alias("nc")))
                        .alias("cell"),
                        F.min("key").alias("key"),
                        F.first("ci").alias("ci"),
                        F.first("x2").alias("x2")))
        stats = sorted(
            (int(r.cell), [int(s) for s in r.csum], int(r.nv),
             int(r.sumx2)) for r in
            (assigned.groupBy("cell")
             .agg(F.array(*[F.sum(F.element_at("ci", i + 1))
                            for i in range(dim)]).alias("csum"),
                  F.count("*").cast("bigint").alias("nv"),
                  F.sum("x2").alias("sumx2"))
             .collect()))
        _, iner = _exact_inertia(stats)
        inertia.append(round(iner, 9))

        new_cents = [(c, cs, nv) for c, cs, nv, _ in stats]
        empty = sorted(set(range(k)) - {c for c, _, _ in new_cents})
        reseeds.append(len(empty))
        if empty:
            # deterministic spread re-seed: the |empty| rows farthest
            # from their assigned centroid (d² = ‖x‖² + key), ties to
            # the smaller vec_id — each becomes a fresh 1-row centroid
            far = (assigned.select(
                "vec_id", "ci",
                (F.col("x2").cast("double") + F.col("key"))
                .alias("d2"))
                .orderBy(F.desc("d2"), F.asc("vec_id"))
                .limit(len(empty)).collect())
            for cell_id, r in zip(empty, far):
                new_cents.append((cell_id, [int(x) for x in r.ci], 1))
            new_cents.sort()
        if new_cents == cents:     # exact integer fixed point
            converged = True
            break
        cents = new_cents

    # final labels under the LAST centroids (one more assignment pass
    # so labels and returned centroids agree; init_ivf_index will
    # re-aggregate means from these labels — one further Lloyd
    # update, still a valid frozen quantizer)
    cf = _centroid_frame(spark, cents)
    labeled = (dec.crossJoin(F.broadcast(cf))
               .select("vec_id", "embedding", "cell",
                       _assign_key().alias("key"))
               .groupBy("vec_id")
               .agg(F.max_by(
                   F.col("cell"),
                   F.struct((-F.col("key")).alias("nk"),
                            (-F.col("cell")).alias("nc")))
                   .alias("label"),
                   F.first("embedding").alias("embedding"))
               .select("vec_id", "embedding", "label"))
    return {"labeled": labeled, "centroids": cents,
            "inertia": inertia, "reseeds": reseeds,
            "n_iters_run": len(inertia), "k": k,
            "converged": converged}
