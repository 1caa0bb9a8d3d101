"""Distributed connected components — the dedup-clustering endgame.

Near-duplicate detection (n-gram Jaccard, MinHash-LSH, embedding
cosine) emits *pairs*; deduplication needs *clusters* (if A~B and B~C,
all three are one duplicate group even when A~C was never scored) plus
a canonical survivor per cluster. This operator closes that gap with
the BSP "hash-min" label-propagation algorithm:

    label(v) ← min(label(v), min over neighbors u of label(u))

iterated to fixpoint. Each iteration is one join + one groupBy-min —
pure DataFrame ops, shuffling only the (node, label) frame, never
materializing anything per-pair beyond the input edge list.

Scale notes (the 100 TB design):

- Iterations are bounded by the graph *diameter*, and near-dup graphs
  are shallow (duplicate families are cliques or short chains — single
  digits even at corpus scale). ``max_iter`` is a safety bound, not a
  tuning knob.
- Every iteration ends in ``localCheckpoint`` — without it the lazy
  plan doubles per iteration and the job dies on lineage, a classic
  iterative-Spark failure. On a real cluster with HDFS/S3 available,
  swap for ``df.checkpoint()`` (reliable checkpoint) so executor loss
  doesn't replay the whole loop.
- The convergence probe (one ``count`` per iteration) is a tiny
  driver-side action on an N-node frame — the same reduction GraphX's
  Pregel runs per superstep.
- For graphs with huge components or long chains (adversarial, not
  near-dup-shaped), hash-min's round count grows with the component
  DIAMETER. The alternating large-star/small-star algorithm (Kiveris
  et al., "Connected Components in MapReduce and Beyond", 2014)
  converges in O(log²) rounds regardless of diameter —
  ``algorithm="star"`` selects it behind the same API, and a property
  suite (tests/test_components.py) pins its output equal to hash-min
  on random graphs, deep chains, cliques and self-loops. Hash-min
  stays the default: dedup pair graphs are shallow, and per round it
  shuffles one (node,label) frame vs star's two grouped passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         max_iter: int = 25,
                         algorithm: str = "hashmin") -> DataFrame:
    """(node BIGINT, comp BIGINT) — comp is the minimum node id
    reachable from ``node`` over the undirected pair graph; equal comp
    ⇔ same duplicate cluster. Only nodes present in ``edges`` appear.

    ``algorithm``:

    - ``"hashmin"`` (default) — diameter-bounded label propagation,
      best for shallow dedup graphs (one shuffled frame per round).
    - ``"star"`` — the O(log²)-round large-star/small-star
      alternation for high-diameter graphs.
    - ``"auto"`` — probe with hash-min for a few rounds (the cheap
      path that wins on the near-dup common case); if the fixpoint
      isn't reached, CONTRACT the graph by the current labels (each
      partial cluster collapses to its min-label node — near-dup
      cliques vanish here) and finish with star on the contracted
      edge set, whose round count is diameter-independent. The probe
      work is not wasted: star runs on the contracted graph, which is
      never larger and usually far smaller than the input.

    Identical output for all three (pinned by
    tests/test_components.py).
    """
    if algorithm == "star":
        return _star_components(edges, src, dst, max_iter)
    if algorithm == "auto":
        return _auto_components(edges, src, dst, max_iter)
    if algorithm != "hashmin":
        raise ValueError(f"unknown algorithm: {algorithm!r}")
    labels, _ = _hashmin_components(edges, src, dst, max_iter)
    return labels


def _hashmin_components(edges: DataFrame, src: str, dst: str,
                        max_iter: int) -> tuple[DataFrame, bool]:
    """Hash-min label propagation. Returns (labels, converged)."""
    # Materialize the pair list BEFORE mirroring it: the two union
    # branches project the same frame twice, and without this the
    # (possibly very expensive) upstream pair-generation plan — an
    # LSH band join, an n-gram Jaccard self-join — executes once per
    # branch (measured 2x on dx4 at sf0.1).
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
         .localCheckpoint())
    und = (e.union(e.select(F.col("v"), F.col("u")))
           .distinct()
           .localCheckpoint())  # reused every round

    # Label init = min(node, min neighbor) — EXACTLY what round 1
    # produces from identity labels (whose join against `und` is the
    # identity), for the cost of one groupBy instead of a
    # join+union+groupBy round. On the shallow graphs this operator
    # exists for (diameter 2-4), that's ~25-30% of the loop.
    #
    # Checkpoints are LAZY (eager=False, r17 — guide §5 driver-side
    # job elimination): the convergence probe right below is the
    # round's ONLY action, and materializing it also materializes
    # (and lineage-truncates) the marked label frame — ONE Spark job
    # per round where the eager checkpoint + separate probe paid two.
    # `e`/`und` above stay EAGER: their branches are read twice
    # concurrently inside one job, which would race the lazy cache
    # into recomputing the (possibly expensive) pair plan per branch.
    labels = (und.groupBy("u").agg(F.min("v").alias("mv"))
              .select(F.col("u").alias("node"),
                      F.least("u", "mv").alias("comp"))
              .localCheckpoint(eager=False))

    # Convergence probe: labels only ever DECREASE (min-propagation),
    # so the label total strictly drops on any change and Σcomp
    # equality ⇔ fixpoint. One exact decimal aggregate over the
    # checkpointed N-node frame per round — no overflow at any node-id
    # range (decimal(38,0) holds 2^63 · 10^19 rows), and cheaper than
    # the join+filter+count probe it replaces (one scan, no shuffle
    # of two label frames per round).
    def _total(frame: DataFrame) -> object:
        return frame.agg(
            F.sum(F.col("comp").cast("decimal(38,0)"))).collect()[0][0]

    converged = False
    prev_total = _total(labels)
    for _ in range(max_iter):
        prop = (und.join(labels, und["u"] == labels["node"])
                .select(F.col("v").alias("node"), F.col("comp")))
        labels = (labels.union(prop)
                  .groupBy("node")
                  .agg(F.min("comp").alias("comp"))
                  .localCheckpoint(eager=False))
        total = _total(labels)   # materializes + truncates `labels`
        if total == prev_total:
            converged = True
            break
        prev_total = total
    return labels, converged


AUTO_PROBE_ROUNDS = 4


def _auto_components(edges: DataFrame, src: str, dst: str,
                     max_iter: int,
                     probe_rounds: int = AUTO_PROBE_ROUNDS) -> DataFrame:
    """Adaptive selection: hash-min probe, star finish on the
    label-contracted graph if the probe didn't converge.

    Why contraction is sound: after k hash-min rounds each label is
    the min node id within distance k — a *coarsening* of the true
    components. Contract every edge to (label(u), label(v)); the
    contracted graph's components, with star's output labels (min
    node id per contracted component), ARE the true component minima
    because labels are themselves node ids. Final mapping is one join
    from the probe labels to the star labels; label-internal groups
    with no cross-label edge keep their (already final) probe label
    via the left join.
    """
    labels, converged = _hashmin_components(edges, src, dst,
                                            probe_rounds)
    if converged:
        return labels
    contracted = (edges.select(F.col(src).alias("u"),
                               F.col(dst).alias("v"))
                  .join(labels.select(F.col("node").alias("u"),
                                      F.col("comp").alias("lu")), "u")
                  .join(labels.select(F.col("node").alias("v"),
                                      F.col("comp").alias("lv")), "v")
                  .select("lu", "lv")
                  .filter(F.col("lu") != F.col("lv"))
                  .distinct())
    stars = _star_components(contracted, "lu", "lv", max_iter)
    return (labels.join(stars.select(F.col("node").alias("comp"),
                                     F.col("comp").alias("final")),
                        "comp", "left")
            .select("node",
                    F.coalesce("final", F.col("comp")).alias("comp")))


def _star_components(edges: DataFrame, src: str, dst: str,
                     max_iter: int) -> DataFrame:
    """Alternating large-star/small-star connected components
    (Kiveris et al. 2014, re-derived from the published operations):

    - **large-star** (per node u over the bidirected edge list):
      connect every neighbor v > u to m = min(Γ(u) ∪ {u}).
    - **small-star** (per node u over edges oriented max→min):
      connect u and every smaller neighbor to m = min(Γ₋(u) ∪ {u}).

    Both preserve connectivity; the alternation strictly shrinks a
    potential function and converges in O(log²) rounds to a forest of
    stars rooted at each component's minimum — independent of graph
    diameter, which is what hash-min cannot offer on long chains.
    Each round is two grouped aggregations + two joins over the edge
    frame only (never per-pair state), localCheckpoint'd to truncate
    lineage like the hash-min loop. Convergence probe: (edge count,
    exact decimal sum of per-edge xxhash64) fingerprint — one tiny
    aggregate per round; a fixpoint edge set ⇔ stable fingerprint
    (the hash-sum makes a count-preserving edge swap detectable).
    """
    e0 = (edges.select(F.col(src).cast("bigint").alias("u"),
                       F.col(dst).cast("bigint").alias("v"))
          .localCheckpoint())
    nodes = (e0.select(F.col("u").alias("node"))
             .union(e0.select(F.col("v").alias("node")))
             .distinct().localCheckpoint())
    e = e0.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()

    def _fingerprint(frame: DataFrame) -> tuple:
        row = frame.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64(F.least("u", "v"), F.greatest("u", "v"))
                  .cast("decimal(38,0)")).alias("h")).collect()[0]
        return (row["n"], row["h"])

    prev = _fingerprint(e)
    converged = False
    for _ in range(max_iter):
        # large-star
        bidir = e.union(e.select(F.col("v").alias("u"),
                                 F.col("u").alias("v")))
        mins = (bidir.groupBy("u").agg(F.min("v").alias("mv"))
                .select("u", F.least("u", "mv").alias("mn")))
        lg = (bidir.join(mins, "u")
              .filter(F.col("v") > F.col("u"))
              .select(F.col("v").alias("u"), F.col("mn").alias("v"))
              .filter(F.col("u") != F.col("v")).distinct())
        # small-star (lg edges are already max→min: u > mn)
        mins2 = lg.groupBy("u").agg(F.min("v").alias("mn"))
        # lazy checkpoint: the fingerprint probe is the round's only
        # action and materializes + truncates `e` in the SAME job
        # (one job/round instead of two — see the hash-min loop)
        e = (lg.join(mins2, "u")
             .select(F.col("v").alias("u"), F.col("mn").alias("v"))
             .union(mins2.select(F.col("u"), F.col("mn").alias("v")))
             .filter(F.col("u") != F.col("v")).distinct()
             .localCheckpoint(eager=False))
        fp = _fingerprint(e)
        if fp == prev:
            converged = True
            break
        prev = fp

    roots = e.select(F.col("u").alias("node"), F.col("v").alias("comp"))
    if not converged:
        # max_iter exhausted before the fingerprint fixpoint: the edge
        # set need not be a star forest yet, so a node may still carry
        # TWO parents and the left-join below would emit duplicate
        # (node, comp) rows — silently malformed output. Collapse to
        # the minimum parent: one row per node, possibly under-merged
        # (like hash-min at its cap), never structurally broken.
        roots = roots.groupBy("node").agg(F.min("comp").alias("comp"))
    return (nodes.join(roots, "node", "left")
            .select("node",
                    F.coalesce("comp", F.col("node")).alias("comp")))


def dedup_clusters(pairs: DataFrame, left: str, right: str,
                   max_iter: int = 25,
                   algorithm: str = "hashmin") -> DataFrame:
    """Pairs → duplicate clusters with keep-first survivor policy:
    (doc_id, cluster_id, cluster_size, is_canonical). cluster_id is
    the minimum doc id in the component (= the survivor).

    ``algorithm`` passes through to :func:`connected_components` —
    keep the ``hashmin`` default for near-dup pair graphs (shallow),
    ``"auto"`` when the pair source might produce long chains (e.g.
    transitive fuzzy matches over sliding windows)."""
    from pyspark.sql import Window

    comps = connected_components(pairs, src=left, dst=right,
                                 max_iter=max_iter,
                                 algorithm=algorithm)
    # Size via a partitioned window — one shuffle on the cluster key,
    # no broadcast of an O(n_clusters) frame (which wouldn't fit in
    # driver memory at corpus scale).
    size = F.count("*").over(Window.partitionBy("comp")).cast("bigint")
    return comps.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("comp").cast("bigint").alias("cluster_id"),
        size.alias("cluster_size"),
        (F.col("node") == F.col("comp")).alias("is_canonical"))
