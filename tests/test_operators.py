"""Tests for the scale-path dedup/similarity operators and sources."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from light_redistribution_in_3dptf_data_pipeline_spark.catalog import load_table
from light_redistribution_in_3dptf_data_pipeline_spark.operators import dedup, similarity
from light_redistribution_in_3dptf_data_pipeline_spark.operators.dedup import minhash_lsh_query
from light_redistribution_in_3dptf_data_pipeline_spark.queries import QUERIES
from light_redistribution_in_3dptf_data_pipeline_spark.sources import binary_catalog, robot_program

from conftest import SF_DIR


class TestMinHashLSH:
    def test_candidates_superset_of_exact_neardups(self, spark):
        """LSH candidates must contain every pair the exhaustive
        3-gram jaccard query (tx6) finds above its threshold."""
        exact = {(r.doc_a, r.doc_b)
                 for r in QUERIES["tx6_ngram_jaccard_neardup"]
                 .builder(spark, SF_DIR).collect()
                 if r.jaccard >= 0.6}
        cands = {(r.doc_a, r.doc_b)
                 for r in minhash_lsh_query(spark, SF_DIR).collect()}
        missed = exact - cands
        assert not missed, f"LSH missed high-jaccard pairs: {missed}"

    def test_deterministic(self, spark):
        a = sorted(map(tuple, minhash_lsh_query(spark, SF_DIR).collect()))
        b = sorted(map(tuple, minhash_lsh_query(spark, SF_DIR).collect()))
        assert a == b

    def test_stop_shingle_cap(self, spark):
        """max_doc_freq drops ubiquitous boilerplate shingles (the
        hot-key skew guard) while per-doc distinct shingles survive."""
        boiler = "standard footer text"
        df = spark.createDataFrame(
            [(i, f"unique words number{i} alpha{i} beta{i} {boiler}")
             for i in range(20)],
            "doc_id INT, text STRING")
        uncapped = dedup.shingles(df)
        capped = dedup.shingles(df, max_doc_freq=10)
        # the boilerplate 3-gram appears in all 20 docs → dropped
        assert uncapped.filter(
            F.col("shingle") == boiler).count() == 20
        assert capped.filter(F.col("shingle") == boiler).count() == 0
        # document-specific shingles are untouched
        assert capped.filter(
            F.col("shingle").startswith("unique words")).count() == 20

    def test_fused_plan_shape(self, spark):
        """The fused LSH near-dup plan must keep its two-shuffle shape
        (signature aggregate + final pair groupBy): no unpivot
        re-grouping, no estimate re-joins creeping back in."""
        import re

        df = minhash_lsh_query(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exchange = len(re.findall(r"Exchange hashpartitioning", plan))
        n_hashagg = len(re.findall(r"HashAggregate", plan))
        assert n_exchange <= 3, f"unexpected shuffles: {n_exchange}"
        assert n_hashagg <= 6, f"signature agg re-evaluated: {n_hashagg}"

    def test_estimate_tracks_exact(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        sh = dedup.shingles(docs)
        sig = dedup.minhash_signatures(sh)
        pairs = dedup.lsh_candidate_pairs(sig)
        est = {(r.doc_a, r.doc_b): r.est_jaccard
               for r in dedup.minhash_jaccard_estimate(sig, pairs)
               .collect()}
        exact = {(r.doc_a, r.doc_b): r.jaccard
                 for r in QUERIES["tx6_ngram_jaccard_neardup"]
                 .builder(spark, SF_DIR).collect()}
        common = set(est) & set(exact)
        assert common, "no overlapping pairs to compare"
        for p in common:
            assert abs(est[p] - exact[p]) < 0.45, (p, est[p], exact[p])


class TestSimHash:
    def test_fingerprints_deterministic_and_total(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        fp1 = simhash_rows = dedup.simhash_fingerprints(docs).collect()
        assert len(fp1) == docs.count()
        fp2 = dedup.simhash_fingerprints(docs).collect()
        assert sorted(map(tuple, fp1)) == sorted(map(tuple, fp2))

    def test_identical_text_same_fingerprint(self, spark):
        df = spark.createDataFrame(
            [(1, "spark window join table"), (2, "spark window join table"),
             (3, "completely different words here")],
            "doc_id INT, text STRING")
        rows = {r.doc_id: r.simhash
                for r in dedup.simhash_fingerprints(df).collect()}
        assert rows[1] == rows[2]
        assert rows[1] != rows[3]

    def test_band_candidates_full_recall_within_hamming(self, spark):
        # pigeonhole: with 4 bands every pair at Hamming distance <= 3
        # MUST be a candidate. Build fingerprints with known distances.
        import random
        rng = random.Random(11)

        def signed(u):  # uint64 bit pattern -> java long
            return u - (1 << 64) if u >= 1 << 63 else u

        base = rng.getrandbits(64)
        rows = [(0, signed(base))]
        # ids 1..6: distances 1,2,3 (recall-guaranteed) and 17,21,32
        for i, d in enumerate([1, 2, 3, 17, 21, 32], start=1):
            fp = base
            for bit in rng.sample(range(64), d):
                fp ^= 1 << bit
            rows.append((i, signed(fp)))
        df = spark.createDataFrame(rows, "doc_id LONG, simhash LONG")
        cands = dedup.simhash_band_candidates(df, max_hamming=3)
        got = {(r.doc_a, r.doc_b): r.hamming for r in cands.collect()}
        for i, d in [(1, 1), (2, 2), (3, 3)]:
            assert got.get((0, i)) == d, (i, d, got)
        assert all(h <= 3 for h in got.values())

    def test_band_candidates_on_fixture_duplicates(self, spark):
        docs = load_table(spark, SF_DIR, "documents")
        # inject an exact copy: hamming 0 must surface
        dup = docs.limit(1).withColumn(
            "doc_id", F.col("doc_id") + 1000000)
        fp = dedup.simhash_fingerprints(docs.unionByName(dup))
        cands = dedup.simhash_band_candidates(fp)
        zero = [r for r in cands.collect() if r.hamming == 0]
        assert any(r.doc_b - r.doc_a == 1000000 for r in zero)


class TestDeltaDedup:
    """Incremental dedup of an ingest delta against a historical
    index — the 100 TB shape where the corpus is never re-deduped."""

    def _index_docs(self, spark):
        return spark.createDataFrame(
            [(100, "the quick brown fox jumps over dogs"),
             (101, "completely different historical text here"),
             (102, "spark window join table scan filter")],
            "doc_id LONG, text STRING")

    def test_exact_delta(self, spark):
        from light_redistribution_in_3dptf_data_pipeline_spark.operators.dedup import dedup_delta_exact

        idx_docs = self._index_docs(spark)
        _, index = dedup_delta_exact(
            idx_docs, spark.createDataFrame([], "content_hash STRING"))
        assert index.count() == 3

        delta = spark.createDataFrame(
            [(1, "the quick brown fox jumps over dogs"),   # in index
             (2, "fresh delta document one"),
             (3, "fresh delta document one"),              # in-delta dup
             (4, "fresh delta document two")],
            "doc_id LONG, text STRING")
        survivors, updated = dedup_delta_exact(delta, index)
        ids = sorted(r.doc_id for r in survivors.collect())
        assert ids == [2, 4]                  # min-id wins the pair
        assert updated.count() == 5           # 3 + 2, append-only
        assert updated.distinct().count() == 5

    def test_simhash_delta(self, spark):
        from light_redistribution_in_3dptf_data_pipeline_spark.operators.dedup import (
            neardup_delta_simhash, simhash_fingerprints)

        idx_docs = self._index_docs(spark)
        index = simhash_fingerprints(idx_docs).select("simhash")

        delta = spark.createDataFrame(
            [(1, "dogs over jumps fox brown quick the"),  # token perm
             (2, "spark  window   join table scan filter"),  # ws variant
             (3, "entirely novel ingest content alpha beta"),
             (4, "entirely novel ingest content alpha beta"),  # in-delta
             (5, "unrelated gamma delta epsilon zeta words")],
            "doc_id LONG, text STRING")
        survivors, updated = neardup_delta_simhash(delta, index)
        ids = sorted(r.doc_id for r in survivors.collect())
        # 1: SimHash is token-multiset-order-independent → Hamming 0
        #    to index doc 100 → dropped. 2: whitespace variant of
        #    index doc 102 → dropped. 4: in-delta dup of 3, higher id
        #    → dropped. 3 and 5 admitted.
        assert ids == [3, 5]
        assert updated.count() == index.count() + 2
        # survivors carry fingerprint + original columns
        row = survivors.filter(F.col("doc_id") == 3).collect()[0]
        assert row.simhash is not None and row.text.startswith("entirely")

    def test_delta_banded_join_not_cartesian(self, spark):
        """The delta×index check must stay a banded equi-join — a
        Hamming filter over a cross join would be O(|delta|·|index|)
        at scale."""
        from light_redistribution_in_3dptf_data_pipeline_spark.operators.dedup import (
            neardup_delta_simhash, simhash_fingerprints)

        idx = simhash_fingerprints(self._index_docs(spark)) \
            .select("simhash")
        delta = spark.createDataFrame(
            [(1, "some delta text content")], "doc_id LONG, text STRING")
        survivors, _ = neardup_delta_simhash(delta, idx)
        plan = survivors._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestDedupAccounting:
    """The one-row candidate/verify ledgers must reconcile exactly
    with the operators they observe — same candidate generator, same
    verify rule."""

    def test_lsh_accounting_reconciles(self, spark):
        from light_redistribution_in_3dptf_data_pipeline_spark.operators.dedup import (
            lsh_candidate_pairs, lsh_dedup_accounting,
            lsh_verified_neardups, minhash_signatures, shingles)

        docs = load_table(spark, SF_DIR, "documents")
        t = 0.5
        row = lsh_dedup_accounting(docs, t).head()
        assert row.n_docs == docs.count()
        n_cand = lsh_candidate_pairs(
            minhash_signatures(shingles(docs))).count()
        assert row.n_candidate_pairs == n_cand
        n_ver = lsh_verified_neardups(docs, t).count()
        assert row.n_verified_pairs == n_ver
        assert 0 < row.n_verified_pairs <= row.n_candidate_pairs
        assert abs(row.candidate_precision
                   - n_ver / max(n_cand, 1)) < 1e-12
        assert row.n_dropped_docs == (
            lsh_verified_neardups(docs, t)
            .select("doc_b").distinct().count())
        assert row.max_candidates_per_doc >= 1

    def test_simhash_accounting_reconciles(self, spark):
        from light_redistribution_in_3dptf_data_pipeline_spark.operators.dedup import (
            simhash_band_candidates, simhash_dedup_accounting,
            simhash_fingerprints)

        docs = load_table(spark, SF_DIR, "documents")
        fp = simhash_fingerprints(docs)
        row = simhash_dedup_accounting(fp).head()
        assert row.n_docs == docs.count()
        assert row.n_verified_pairs == simhash_band_candidates(fp).count()
        assert 0 < row.n_verified_pairs <= row.n_candidate_pairs
        assert 0.0 < row.candidate_precision <= 1.0


class TestAnnLsh:
    def test_recall_vs_bruteforce(self, spark):
        """In-bucket ANN must recover a reasonable share of the true
        top-10 (8 hyperplanes on 64-dim random data keeps ~same-sign
        neighbors together)."""
        brute = [r.vec_id for r in QUERIES["sim1_sim2_cosine_topk"]
                 .builder(spark, SF_DIR).collect()]
        ann = [r.vec_id for r in QUERIES["sx1_sx2_ann_lsh_topk"]
               .builder(spark, SF_DIR).collect()]
        assert ann, "ANN returned nothing — bucket empty"
        # with Hamming-1 probing the ANN set must recover at least
        # some of the true top-10
        assert set(ann) & set(brute), (
            f"ANN recall zero: ann={ann} brute={brute}")
        emb = load_table(spark, SF_DIR, "embeddings")
        got = similarity.ann_cosine_topk(emb).collect()
        assert all(r.cosine <= 1.0001 for r in got)

    def test_lsh_buckets_rejects_wrong_dimension(self, spark):
        """zip_with NULL-pads a short vector, which would silently
        zero sign bits (mis-bucketing); the operator must raise
        instead."""
        import pytest

        bad = spark.createDataFrame(
            [(1, [0.25] * 32)], "vec_id LONG, embedding ARRAY<DOUBLE>")
        with pytest.raises(Exception, match="64-dim"):
            similarity.lsh_buckets(bad).collect()

    def test_buckets_deterministic_and_total(self, spark):
        emb = load_table(spark, SF_DIR, "embeddings")
        b1 = sorted(map(tuple, similarity.lsh_buckets(emb).collect()))
        b2 = sorted(map(tuple, similarity.lsh_buckets(emb).collect()))
        assert b1 == b2, "fixed-point LSH buckets must be deterministic"
        assert len(b1) == emb.count()

    def test_bucket_histogram_covers_all(self, spark):
        emb = load_table(spark, SF_DIR, "embeddings")
        hist = similarity.bucket_histogram(emb).collect()
        assert sum(r.n_vecs for r in hist) == emb.count()

    def test_topk_reports_true_occupancy(self, spark):
        emb = load_table(spark, SF_DIR, "embeddings")
        hist = {r.bucket: r.n_vecs
                for r in similarity.bucket_histogram(emb).collect()}
        for r in similarity.ann_cosine_topk(emb).collect():
            assert r.bucket_occupancy == hist[r.bucket]


class TestIvfSearch:
    def test_all_cells_probe_equals_bruteforce(self, spark):
        """With nprobe = every cell the probe search degenerates to
        the exact scan: top-k ids must equal the brute-force oracle."""
        emb = load_table(spark, SF_DIR, "embeddings")
        n_cells = emb.select("label").distinct().count()
        brute = [r.vec_id for r in QUERIES["sim1_sim2_cosine_topk"]
                 .builder(spark, SF_DIR).collect()]
        full = [r.vec_id for r in
                similarity.ivf_search_topk(emb, nprobe=n_cells).collect()]
        assert full == brute

    def test_nprobe_prunes_and_recalls(self, spark):
        """nprobe=2 must scan only 2 cells yet keep nonzero recall of
        the true top-10; results ordered by cosine desc."""
        emb = load_table(spark, SF_DIR, "embeddings")
        got = similarity.ivf_search_topk(emb, nprobe=2).collect()
        assert got and len({r.cell for r in got}) <= 2
        cosines = [r.cosine for r in got]
        assert cosines == sorted(cosines, reverse=True)
        brute = {r.vec_id for r in QUERIES["sim1_sim2_cosine_topk"]
                 .builder(spark, SF_DIR).collect()}
        assert {r.vec_id for r in got} & brute

    def test_deterministic(self, spark):
        emb = load_table(spark, SF_DIR, "embeddings")
        a = sorted(map(tuple, similarity.ivf_search_topk(emb).collect()))
        b = sorted(map(tuple, similarity.ivf_search_topk(emb).collect()))
        assert a == b


class TestBinaryCatalog:
    @pytest.fixture(scope="class")
    def image_dir(self, tmp_path_factory):
        """Fake capture corpus: 4 poses × 5 exposures (pose 2 missing
        one exposure), mtimes 2 s apart in-group, 30 s gap before
        pose 3 (simulating a skipped pose)."""
        d = tmp_path_factory.mktemp("images")
        t = 1_700_000_000
        for pose in range(4):
            n = 4 if pose == 2 else 5
            if pose == 3:
                t += 30
            for exp in range(n):
                p = d / f"{pose}_{exp}.JPG"
                p.write_bytes(b"\xff\xd8fakejpg" + bytes([pose, exp]))
                os.utime(p, (t, t))
                t += 2
        (d / "notes.txt").write_text("not an image")
        return str(d)

    def test_glob_scan_prunes(self, spark, image_dir):
        files = binary_catalog.scan_files(spark, image_dir, glob="*.JPG")
        assert files.count() == 19
        assert "content" not in files.columns

    def test_catalog_keys(self, spark, image_dir):
        cat = binary_catalog.file_catalog(
            binary_catalog.scan_files(spark, image_dir, glob="*.JPG"))
        rows = cat.filter(F.col("pose_id") == 1).collect()
        assert {r.exposure_idx for r in rows} == set(range(5))

    def test_exposure_groups_completeness(self, spark, image_dir):
        cat = binary_catalog.file_catalog(
            binary_catalog.scan_files(spark, image_dir, glob="*.JPG"))
        groups = {r.pose_id: r for r in
                  binary_catalog.exposure_groups(cat).collect()}
        assert groups[0].complete and groups[1].complete
        assert not groups[2].complete  # dropped exposure
        assert groups[2].n_exposures == 4

    def test_missing_pose_detection_on_files(self, spark, image_dir):
        cat = binary_catalog.file_catalog(
            binary_catalog.scan_files(spark, image_dir, glob="*.JPG"))
        res = binary_catalog.detect_missing_poses(
            cat.filter(F.col("pose_id") != 2), gap_seconds=12.0).collect()
        flagged = [r for r in res if r.gap_flag == 1]
        assert len(flagged) == 1  # the 30 s gap before pose 3

    def test_content_read_when_asked(self, spark, image_dir):
        files = binary_catalog.scan_files(spark, image_dir, glob="*.JPG",
                                          with_content=True)
        row = files.orderBy("path").first()
        assert row.content.startswith(b"\xff\xd8")


class TestRobotProgram:
    def test_roundtrip(self, spark, tmp_path):
        """Render the reference's pose lattice to LIN text, write it,
        read+parse it back, and require exact equality (3-decimal
        rendering is lossless for the lattice's values)."""
        from light_redistribution_in_3dptf_data_pipeline_spark.queries.generators import pose_grid_df

        poses = pose_grid_df(spark).select(
            F.col("gx").alias("x"), F.col("gy").alias("y"),
            F.col("gz").alias("z"), F.col("ea").alias("a"),
            F.col("eb").alias("b"), F.col("ec").alias("c"),
            "pose_id")
        text = robot_program.render_program(poses.orderBy("pose_id"))
        path = str(tmp_path / "program.src")
        text.coalesce(1).write.mode("overwrite").text(str(tmp_path / "out"))
        import glob as pyglob
        part = pyglob.glob(str(tmp_path / "out" / "part-*"))[0]
        os.rename(part, path)

        parsed = robot_program.read_program(spark, path)
        assert parsed.count() == 3125
        orig = {r.pose_id: (r.x, r.y, r.z, r.a, r.b, r.c)
                for r in poses.collect()}
        # parse order = file order = pose_id order (coalesce(1) write)
        back = {r.pose_id: (r.x, r.y, r.z, r.a, r.b, r.c)
                for r in parsed.collect()}
        assert back == orig

    def test_garbage_lines_skipped(self, spark):
        df = spark.createDataFrame(
            [("LIN {X 1.5, Y -2.0, Z 3, A 0, B 0, C 90} C_DIS",),
             ("DEF program()",), ("",), ("PTP HOME",)],
            "value STRING")
        out = robot_program.parse_program(df).collect()
        assert len(out) == 1
        assert (out[0].x, out[0].y, out[0].c) == (1.5, -2.0, 90.0)


class TestDx5RecallPremise:
    def test_fixture_has_no_risky_jaccard_band_pairs(self):
        """dx5's hash-equality with the exhaustive tx6 oracle rests on
        LSH recall == 1 at the decision threshold. With 16x2 banding
        the per-pair miss probability at jaccard j is (1-j^2)^16 —
        negligible at j >= 0.8 (< 1e-7) but material in
        [JACCARD_THRESHOLD, 0.8) (up to ~12% at 0.35). Canary: the
        fixtures must place no document pair in that band, at either
        the local-test or the driver-verification scale, so the
        equality stays deterministic under fixture regeneration."""
        import duckdb

        from light_redistribution_in_3dptf_data_pipeline_spark.queries.text import (
            JACCARD_THRESHOLD,
            NEARDUP_ORACLE,
        )

        from conftest import SF_DIR_MID

        for d in (SF_DIR, SF_DIR_MID):
            con = duckdb.connect()
            con.execute(
                "CREATE VIEW documents AS "
                f"SELECT * FROM '{d}/documents.parquet'")
            risky = con.execute(
                f"SELECT doc_a, doc_b, jaccard FROM ({NEARDUP_ORACLE}) q"
                " WHERE jaccard < 0.8").fetchall()
            con.close()
            assert not risky, (
                f"{d}: document pairs in the LSH-risky jaccard band "
                f"[{JACCARD_THRESHOLD}, 0.8) — dx5's equality with the "
                f"exhaustive oracle is no longer guaranteed: {risky}")

    def test_banding_recall_covers_every_oracle_pair(self, spark):
        """Direct recall assertion, not just the jaccard-band
        heuristic above: the production 16-band candidate generator
        must actually emit every pair the exhaustive oracle reports,
        at both fixture scales. Guards the residual hole the
        heuristic leaves open — a regenerated fixture pair at
        jaccard >= 0.8 that deterministically misses all 16 bands
        (~1e-7 per pair) would pass the band canary yet silently
        break dx4/dx5 driver parity; this test catches it by running
        the actual banding."""
        import duckdb

        from light_redistribution_in_3dptf_data_pipeline_spark.catalog import (
            load_table)
        from light_redistribution_in_3dptf_data_pipeline_spark.operators import (
            dedup)
        from light_redistribution_in_3dptf_data_pipeline_spark.queries.text import (
            NEARDUP_ORACLE)

        from conftest import SF_DIR_MID

        for d in (SF_DIR, SF_DIR_MID):
            con = duckdb.connect()
            con.execute("CREATE VIEW documents AS "
                        f"SELECT * FROM '{d}/documents.parquet'")
            oracle_pairs = {(a, b) for a, b in con.execute(
                f"SELECT doc_a, doc_b FROM ({NEARDUP_ORACLE}) q"
            ).fetchall()}
            con.close()
            assert oracle_pairs, f"{d}: oracle reports no near-dups"

            docs = load_table(spark, d, "documents")
            sig = dedup.minhash_signatures(dedup.shingles(docs))
            cand = dedup.lsh_candidate_pairs(sig, bands=16)
            cand_pairs = {(r.doc_a, r.doc_b)
                          for r in cand.select("doc_a", "doc_b")
                          .collect()}
            missed = oracle_pairs - cand_pairs
            assert not missed, (
                f"{d}: oracle near-dup pairs missed by 16-band LSH "
                f"candidates (banding recall < 1 — dx4/dx5 parity "
                f"with the exhaustive oracle is broken): {missed}")


class TestChunkPackSplit:
    def test_bucketed_running_sum_equals_global_window(self, spark):
        """The scale-out prefix-sum must equal the single-window
        cumsum exactly, including across bucket boundaries."""
        from pyspark.sql import Window

        from light_redistribution_in_3dptf_data_pipeline_spark.operators.prefix_sum import (
            bucketed_running_sum,
        )

        df = spark.range(0, 997).select(
            F.col("id").alias("k"),
            (F.pmod(F.col("id") * 37, F.lit(101))).alias("v"))
        got = {r.k: r.cs for r in bucketed_running_sum(
            df, F.floor(F.col("k") / 50), "v", ["k"], out="cs")
            .select("k", "cs").collect()}
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
        want = {r.k: r.cs for r in df.select(
            "k", F.sum("v").over(w).cast("bigint").alias("cs")).collect()}
        assert got == want

    def test_prefix_sum_tied_order_cols_documented_degradation(
            self, spark):
        """The documented unique-key contract (operators/prefix_sum
        docstrings): with TIED order_cols, per-row attribution among
        the tied rows is arbitrary, but the outputs must still be
        structurally sound — row_number emits a permutation of 1..N
        (each tie group gets exactly its contiguous rank range), and
        the running sum is EXACT at every tie-group boundary (the
        per-bucket totals never drift). This pins the degradation
        mode so a future rewrite can't silently make ties corrupting
        instead of merely unordered."""
        from light_redistribution_in_3dptf_data_pipeline_spark.operators.prefix_sum import (
            bucketed_row_number,
            bucketed_running_sum,
        )

        # 300 rows, order key k = id // 3 → every k tied 3 ways,
        # spanning bucket boundaries (bucket = k // 10).
        df = spark.range(0, 300).select(
            F.col("id").alias("uid"),
            (F.col("id") / 3).cast("bigint").alias("k"),
            (F.pmod(F.col("id") * 7, F.lit(13)) + 1).alias("v"))
        bucket = F.floor(F.col("k") / 10)

        rn = bucketed_row_number(df, bucket, ["k"], out="rn").collect()
        assert sorted(r.rn for r in rn) == list(range(1, 301))
        by_k = {}
        for r in rn:
            by_k.setdefault(r.k, []).append(r.rn)
        for k, rns in by_k.items():
            assert sorted(rns) == [3 * k + 1, 3 * k + 2, 3 * k + 3], (
                f"tie group k={k} got ranks {sorted(rns)} — ties must "
                "stay within their contiguous rank range")

        cs = bucketed_running_sum(df, bucket, "v", ["k"],
                                  out="cs").collect()
        group_v = {}
        for r in cs:
            group_v.setdefault(r.k, []).append(r.v)
        # exact boundary: max cs within tie group k == deterministic
        # prefix total through group k
        totals, run = {}, 0
        for k in sorted(group_v):
            run += sum(group_v[k])
            totals[k] = run
        by_k_cs = {}
        for r in cs:
            by_k_cs.setdefault(r.k, []).append(r.cs)
        for k, vals in by_k_cs.items():
            assert max(vals) == totals[k], (
                f"tie group k={k}: boundary cumsum {max(vals)} != "
                f"exact prefix total {totals[k]} — ties corrupted "
                "the bucket totals")

    def test_chunks_reconstruct_text(self, spark):
        """Concatenating a doc's chunks in chunk_idx order must cover
        the full text length exactly (no gap, no overlap)."""
        from light_redistribution_in_3dptf_data_pipeline_spark.queries.text import (
            CHUNK_CHARS,
        )

        docs = load_table(spark, SF_DIR, "documents")
        lens = {r.doc_id: r.n for r in docs.select(
            "doc_id", F.length("text").alias("n")).collect()}
        rows = QUERIES["tx11_chunk_pack_split"].builder(
            spark, SF_DIR).collect()
        per_doc = {}
        for r in rows:
            per_doc.setdefault(r.doc_id, []).append(r)
        for doc_id, chunks in per_doc.items():
            chunks.sort(key=lambda r: r.chunk_idx)
            assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
            assert all(c.chunk_start == c.chunk_idx * CHUNK_CHARS + 1
                       for c in chunks)
            assert sum(c.chunk_len for c in chunks) == lens[doc_id]
            assert all(c.chunk_len == CHUNK_CHARS for c in chunks[:-1])

    def test_split_is_doc_consistent_and_packing_monotone(self, spark):
        """Every chunk of a doc lands on the same split side; bin ids
        are non-decreasing in global order and bins respect the token
        budget up to one chunk of overhang (greedy span-start rule)."""
        from light_redistribution_in_3dptf_data_pipeline_spark.queries.text import (
            BIN_TOKENS,
        )

        rows = sorted(QUERIES["tx11_chunk_pack_split"].builder(
            spark, SF_DIR).collect(),
            key=lambda r: (r.shuffle_key, r.doc_id, r.chunk_idx))
        sides = {}
        prev_bin, cum = 0, 0
        bin_tokens = {}
        for r in rows:
            sides.setdefault(r.doc_id, set()).add(r.is_val)
            assert r.bin_id >= prev_bin
            prev_bin = r.bin_id
            cum += r.n_tokens
            assert r.cum_tokens == cum
            bin_tokens[r.bin_id] = bin_tokens.get(r.bin_id, 0) + r.n_tokens
        assert all(len(s) == 1 for s in sides.values())
        max_chunk = max(r.n_tokens for r in rows)
        for b, tot in bin_tokens.items():
            assert tot <= BIN_TOKENS + max_chunk
        # the 5% split is present but minoritarian on the fixture
        n_val_docs = sum(1 for s in sides.values() if True in s)
        assert 0 <= n_val_docs < len(sides) * 0.2


class TestPortableHash:
    def test_md5_hash60_matches_duckdb(self, spark):
        """The engine-portable 60-bit hash (dx2 simhash, sx1
        hyperplane derivation) must produce identical int64s in
        Spark, DuckDB, and plain hashlib, for ASCII and multi-byte
        tokens alike."""
        import hashlib

        import duckdb

        toks = ["hello", "Wort", "统计", "a b", "", "🙂", "ANN-lsh_0"]
        from light_redistribution_in_3dptf_data_pipeline_spark.operators.dedup import (
            _portable_hash60,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(t,) for t in toks], "tok STRING")
        got = {r.tok: r.h for r in df.select(
            "tok", _portable_hash60(F.col("tok")).alias("h")).collect()}
        con = duckdb.connect()
        for t in toks:
            want_py = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            want_duck = con.execute(
                "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT",
                [t]).fetchone()[0]
            assert got[t] == want_py == want_duck, t
