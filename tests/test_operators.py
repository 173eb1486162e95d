"""Curation operators: dedupe, similarity, text stats, multimodal
plumbing — semantic checks on controlled inputs."""

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
        (3, "completely different text about spark shuffles and merges here"),
        (4, "der schnelle braune fuchs springt und ist nicht mit der katze"),
        (5, "el rapido zorro marron salta sobre el perro perezoso que no se mueve"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestDedupe:
    def test_exact_dupes(self, docs):
        from filters_spark.operators.dedupe import dedupe_exact, exact_dupes

        groups = exact_dupes(docs, ["text"], "doc_id").collect()
        assert len(groups) == 1
        assert groups[0].n_copies == 2 and groups[0].keep_id == 0
        assert dedupe_exact(docs, ["text"], "doc_id").count() == 5

    def test_minhash_lsh_finds_near_dup(self, docs):
        from filters_spark.operators.dedupe import minhash_lsh_pairs

        pairs = minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=64, bands=16, shingle_k=3,
            jaccard_threshold=0.3,
        ).collect()
        found = {(p.id_a, p.id_b) for p in pairs}
        assert (0, 1) in found  # exact dup: jaccard 1.0
        assert (0, 2) in found or (1, 2) in found  # near dup
        assert not any({a, b} == {3, 4} for a, b in found)

    def test_simhash_near_dup(self, docs):
        from filters_spark.operators.dedupe import simhash_dupes

        pairs = simhash_dupes(docs, "text", "doc_id", max_hamming=10).collect()
        found = {(p.id_a, p.id_b): p.hamming for p in pairs}
        assert found.get((0, 1)) == 0  # identical text -> identical simhash

    def test_simhash_exact_dup_mode(self, docs):
        # review regression: max_hamming=0 means ONE 64-bit-wide chunk,
        # whose all-ones mask must not overflow LongType
        from filters_spark.operators.dedupe import simhash_dupes

        pairs = simhash_dupes(docs, "text", "doc_id", max_hamming=0).collect()
        assert all(p.hamming == 0 for p in pairs)
        assert any((p.id_a, p.id_b) == (0, 1) for p in pairs)

    def test_exact_dupes_member_cap(self, spark):
        from filters_spark.operators.dedupe import exact_dupes

        df = spark.createDataFrame(
            [(i, "same text") for i in range(50)] + [(99, "other")],
            "doc_id long, text string",
        )
        g = exact_dupes(df, ["text"], "doc_id", max_members=5).collect()
        assert len(g) == 1
        assert g[0].n_copies == 50 and g[0].keep_id == 0
        assert g[0].member_ids == [0, 1, 2, 3, 4]  # capped at 5 smallest

    def test_simhash_degenerate_bucket_guard(self, spark):
        # 5k near-empty docs all collapse to simhash 0: without the
        # max_bucket guard the blocking self-join is quadratic (25M
        # candidate pairs); with it the degenerate bucket is dropped
        # and the job finishes in seconds with zero pairs
        import time

        from filters_spark.operators.dedupe import simhash_dupes

        df = spark.range(5000).select(
            F.col("id").alias("doc_id"), F.lit("x").alias("text")
        )
        t0 = time.time()
        n = simhash_dupes(df, "text", "doc_id", max_hamming=3,
                          max_bucket=1000).count()
        assert n == 0
        assert time.time() - t0 < 60
        # a bucket under the cap still yields its pairs
        small = spark.range(4).select(
            F.col("id").alias("doc_id"), F.lit("x").alias("text")
        )
        assert simhash_dupes(small, "text", "doc_id", max_hamming=3).count() == 6

    def test_reliable_checkpoint_dir(self, spark, docs, tmp_path):
        # checkpoint_dir switches localCheckpoint -> reliable checkpoint:
        # same results, checkpoint files land in the given directory
        import os

        from filters_spark.operators.dedupe import dedupe_clusters, minhash_lsh_pairs

        ckpt = str(tmp_path / "ckpt")
        pairs = minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=64, bands=16, shingle_k=3,
            jaccard_threshold=0.3, checkpoint_dir=ckpt,
        )
        clusters = {
            (r.id, r.cluster_id)
            for r in dedupe_clusters(pairs, checkpoint_dir=ckpt).collect()
        }
        assert (1, 0) in clusters and (2, 0) in clusters
        assert os.path.isdir(ckpt) and len(os.listdir(ckpt)) > 0

    def test_lm_score_matches_hand_computation(self, spark):
        # tiny corpus where the unigram cross-entropy is hand-checkable:
        # model over both docs, add-1 smoothing, vocab+1 unseen class
        import math

        from filters_spark.operators.textstats import lm_score, unigram_counts

        df = spark.createDataFrame(
            [(1, "a a b"), (2, "a c")], "doc_id long, text string"
        )
        model = unigram_counts(df)  # a:3 b:1 c:1, total 5, vocab 3
        got = {r.doc_id: (r.n_tokens, r.avg_neg_logp)
               for r in lm_score(df, model).collect()}

        def p(n):  # (n + 1) / (5 + 1*(3+1))
            return (n + 1) / 9.0

        exp1 = round(-(2 * math.log(p(3)) + math.log(p(1))) / 3, 4)
        exp2 = round(-(math.log(p(3)) + math.log(p(1))) / 2, 4)
        assert got == {1: (3, exp1), 2: (2, exp2)}
        # OOV tokens score through the smoothing mass, not NaN/inf
        other = spark.createDataFrame([(9, "zz zz")], "doc_id long, text string")
        r = lm_score(other, model).collect()[0]
        assert r.n_tokens == 2 and abs(r.avg_neg_logp - round(-math.log(1 / 9.0), 4)) < 1e-9

    def test_ngram_jaccard_exact_values(self, docs):
        from filters_spark.operators.dedupe import ngram_jaccard_pairs

        pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.1).collect()
        vals = {(p.id_a, p.id_b): p.jaccard for p in pairs}
        assert vals.get((0, 1)) == 1.0

    def test_lww_dedupe(self, spark):
        from filters_spark.operators.dedupe import lww_dedupe

        df = spark.createDataFrame(
            [("k1", 1, "old"), ("k1", 2, "new"), ("k2", 5, "only")],
            "key string, seq long, val string",
        )
        out = {r.key: r.val for r in lww_dedupe(df, ["key"], [F.col("seq")]).collect()}
        assert out == {"k1": "new", "k2": "only"}


class TestSimilarity:
    def test_cosine_topk_exact(self, spark):
        from filters_spark.operators.similarity import cosine_topk

        vecs = spark.createDataFrame(
            [
                (1, [1.0, 0.0, 0.0]),
                (2, [0.9, 0.1, 0.0]),
                (3, [0.0, 1.0, 0.0]),
                (4, [-1.0, 0.0, 0.0]),
            ],
            "vec_id long, embedding array<double>",
        )
        q = spark.createDataFrame([(0, [1.0, 0.0, 0.0])], "query_id long, embedding array<double>")
        top = cosine_topk(vecs, q, k=2).collect()
        assert [r.id for r in top] == [1, 2]
        assert top[0].cosine == 1.0

    def test_lsh_ann_recall(self, spark):
        from filters_spark.operators.similarity import cosine_topk, lsh_ann_topk

        import math

        # ring of vectors; neighbors of the query are the closest angles
        rows = [(i, [math.cos(i / 50.0), math.sin(i / 50.0), 0.1]) for i in range(1, 200)]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        q = spark.createDataFrame(
            [(0, [math.cos(0.0), math.sin(0.0), 0.1])], "query_id long, embedding array<double>"
        )
        exact = {r.id for r in cosine_topk(vecs, q, k=10).collect()}
        approx_df = lsh_ann_topk(vecs, q, dim=3, k=10, bits=6, tables=6)
        approx = {r.id for r in approx_df.collect()}
        # recall@10 >= 0.5 with 6 tables on a smooth manifold
        assert len(exact & approx) >= 5
        # scale pin (round-2 verdict): ONE scan of the base side — the
        # per-table union used to rescan and re-hash it `tables` times
        from filters_spark.plans.audit import executed_plan

        plan = executed_plan(approx_df).split("== Initial Plan ==")[0]
        assert plan.count("ExistingRDD") + plan.count("Scan parquet") <= 2  # base + query

    def test_lsh_near_pairs_planted_dups(self, spark):
        import random

        from filters_spark.operators.similarity import lsh_near_pairs

        rng = random.Random(5)
        base = [[rng.gauss(0, 1) for _ in range(16)] for _ in range(50)]
        rows = [(i, v) for i, v in enumerate(base)]
        # plant near-dups: 100+i is a tiny perturbation of i
        for i in range(10):
            rows.append((100 + i, [x + 0.01 * rng.gauss(0, 1) for x in base[i]]))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        pairs = lsh_near_pairs(df, dim=16, cosine_threshold=0.95, bits=4, tables=8, seed=3)
        got = pairs.collect()
        # recall: every planted pair found (near-identical vectors agree
        # on every hyperplane with overwhelming probability)
        assert {(100 * 0 + i, 100 + i) for i in range(10)} <= {(r.id_a, r.id_b) for r in got}
        # precision is exact by construction (cosine verify)
        assert all(r.cosine >= 0.95 for r in got)
        # scale pin: signatures are computed ONCE (checkpointed) — the
        # executed plan must not contain the signature expression
        # (rh_signature's shiftleft) in any branch
        from filters_spark.plans.audit import executed_plan

        plan = executed_plan(pairs).split("== Initial Plan ==")[0]
        assert "shiftleft" not in plan

    def test_ivf_assign_nearest_cell(self, spark):
        from filters_spark.operators.similarity import ivf_assign

        vecs = spark.createDataFrame(
            [
                (1, [1.0, 0.0, 0.0]),
                (2, [0.9, 0.2, 0.0]),
                (3, [0.0, 1.0, 0.0]),
                (4, [0.1, 0.9, 0.0]),
                (5, [0.0, 0.0, 1.0]),
            ],
            "vec_id long, embedding array<double>",
        )
        cents = spark.createDataFrame(
            [(10, [1.0, 0.0, 0.0]), (20, [0.0, 1.0, 0.0]), (30, [0.0, 0.0, 1.0])],
            "cell long, centroid array<double>",
        )
        assigned = ivf_assign(vecs, cents)
        out = {r.vec_id: r.cell for r in assigned.collect()}
        assert out == {1: 10, 2: 10, 3: 20, 4: 20, 5: 30}
        # original columns preserved; the data side is map-only — no
        # window/sort over df rows (the old version windowed over all
        # columns incl. the vector). The only exchanges allowed are the
        # broadcast + the single-row centroid-side collect_list agg.
        assert set(assigned.columns) == {"vec_id", "embedding", "cell"}
        plan = assigned._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan and "SortExec" not in plan

    def test_ivf_topk_matches_exact_within_probed_cells(self, spark):
        import math

        from filters_spark.operators.similarity import cosine_topk, ivf_assign, ivf_topk

        rows = [(i, [math.cos(i / 30.0), math.sin(i / 30.0), 0.05]) for i in range(1, 120)]
        vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        cents = spark.createDataFrame(
            [
                (0, [1.0, 0.0, 0.0]),
                (1, [0.0, 1.0, 0.0]),
                (2, [-1.0, 0.0, 0.0]),
                (3, [0.7, 0.7, 0.0]),
            ],
            "cell long, centroid array<double>",
        )
        assigned = ivf_assign(vecs, cents)
        q = spark.createDataFrame(
            [(0, [math.cos(0.2), math.sin(0.2), 0.05])], "query_id long, embedding array<double>"
        )
        exact = {r.id for r in cosine_topk(vecs, q, k=10).collect()}
        approx = {r.id for r in ivf_topk(assigned, cents, q, k=10, nprobe=2).collect()}
        # query near angle 0.2 -> its cell + 1 probe cover the true neighbors
        assert len(exact & approx) >= 8

    def test_simhash_pigeonhole_recall_above_3(self, spark):
        """max_hamming > 3 must still surface pairs whose differing bits
        span >4 of the old fixed 16-bit chunks (ADVICE round 1): bits
        {0, 16, 24, 32, 48, 60} differ — one per old chunk and then
        some — at hamming distance 6."""
        from filters_spark.operators.dedupe import simhash_dupes

        base = 0x0123456789ABCDEF
        flip = (1 << 0) | (1 << 16) | (1 << 24) | (1 << 32) | (1 << 48) | (1 << 60)

        def signed(v):  # two's-complement into Spark LongType
            return v - (1 << 64) if v >= (1 << 63) else v

        df = spark.createDataFrame(
            [(0, signed(base)), (1, signed(base ^ flip)), (2, signed(~base & ((1 << 64) - 1)))],
            "doc_id long, sh long",
        )
        pairs = {(r.id_a, r.id_b): r.hamming for r in
                 simhash_dupes(df, "unused", "doc_id", max_hamming=6, hash_col="sh").collect()}
        assert pairs == {(0, 1): 6}


class TestTextStats:
    def test_profile_columns(self, docs):
        from filters_spark.operators.textstats import text_profile

        prof = text_profile(docs).collect()
        row = {r.doc_id: r for r in prof}
        assert row[0].n_tokens == 12
        assert row[0].lang_guess == "en"
        assert row[4].lang_guess == "de"
        assert row[5].lang_guess == "es"
        assert 0.0 <= row[0].quality <= 1.0
        assert row[0].fingerprint == row[1].fingerprint  # identical docs
        assert row[0].bpe_tokens_est >= row[0].n_tokens // 4

    def test_quality_penalizes_punct_soup(self, spark):
        from filters_spark.operators.textstats import quality_score

        df = spark.createDataFrame(
            [("good", "a sensible sentence with many normal readable words in it"),
             ("bad", "!!! ??? *** ### $$$ %%% ^^^ &&& !!! ???")],
            "k string, text string",
        )
        out = {r.k: r.q for r in df.select("k", quality_score(F.col("text")).alias("q")).collect()}
        assert out["good"] > out["bad"]


class TestMultimodal:
    def test_image_features_schema_and_determinism(self, spark):
        from filters_spark.operators.multimodal import decode_images, gen_media

        media = gen_media(spark, 200).filter(F.col("kind") == "image")
        feats = decode_images(media)
        rows1 = sorted([tuple(r) for r in feats.collect()])
        rows2 = sorted([tuple(r) for r in decode_images(media).collect()])
        assert rows1 == rows2  # deterministic stub
        assert feats.columns == ["media_id", "width", "height", "n_bytes", "phash", "mean_luma"]
        assert all(r[3] > 0 for r in rows1)

    def test_frame_sampling_cadence(self, spark):
        from filters_spark.operators.multimodal import gen_media, sample_frames

        media = gen_media(spark, 50).filter(F.col("kind") == "video").limit(5)
        frames = sample_frames(media, every_ms=5000)
        per = frames.groupBy("media_id").agg(
            F.count("*").alias("n"), F.max("ts_ms").alias("max_ts")
        ).collect()
        durs = {r.media_id: r.duration_ms for r in media.collect()}
        for r in per:
            assert r.n == max(durs[r.media_id] // 5000, 1)

    def test_frame_payload_ships_once_and_survives_batch_splits(self, spark):
        # payload crosses the Arrow boundary only on frame 0 of each
        # media; the decoder carries it across contiguous frame rows —
        # including across Arrow batch boundaries (forced tiny batches)
        import hashlib

        from filters_spark.operators.multimodal import sample_frames

        media = spark.createDataFrame(
            [(1, 17_000, b"vid-one"), (2, 9_000, b"vid-two"), (3, 4_000, None)],
            "media_id long, duration_ms long, payload binary",
        ).coalesce(1)  # contiguous stream through ONE partition/generator
        key = "spark.sql.execution.arrow.maxRecordsPerBatch"
        old = spark.conf.get(key, None)
        spark.conf.set(key, "2")  # split every media's frames across batches
        try:
            rows = sample_frames(media, every_ms=1000).collect()
        finally:
            if old is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, old)
        payloads = {1: b"vid-one", 2: b"vid-two", 3: b""}
        counts = {1: 17, 2: 9, 3: 4}
        assert len(rows) == sum(counts.values())
        for r in rows:
            want = hashlib.sha256(
                payloads[r.media_id] + int(r.frame_idx).to_bytes(4, "big")
            ).digest()[:16]
            assert bytes(r.frame) == want, (r.media_id, r.frame_idx)

    def test_real_decode_is_guarded(self, spark):
        from filters_spark.operators.multimodal import decode_images, gen_media

        media = gen_media(spark, 5).filter(F.col("kind") == "image")
        with pytest.raises(Exception):
            decode_images(media, decode_stub=False).collect()

    def test_decode_fn_injection_seam(self, spark):
        # the decode_stub=False contract: a real-codec callable drops in
        # via decode_fn and runs inside the Arrow UDF on executors. The
        # fake codec PARSES the payload (like PIL would parse PNG bytes)
        # instead of hashing it, proving the seam carries real bytes.
        from filters_spark.operators.multimodal import decode_images, gen_media

        def fake_codec(payload):
            b = payload or b""
            # "parse": dimensions from the parsed byte content
            return (len(b) % 100 + 1, len(set(b)) + 1, len(b) * 7, 0.5)

        media = gen_media(spark, 50).filter(F.col("kind") == "image")
        feats = decode_images(media, decode_stub=False, decode_fn=fake_codec)
        rows = {r.media_id: r for r in feats.collect()}
        raw = {r.media_id: bytes(r.payload) for r in media.collect()}
        assert rows.keys() == raw.keys() and rows
        for mid, b in raw.items():
            r = rows[mid]
            assert (r.width, r.height, r.phash, r.mean_luma) == (
                len(b) % 100 + 1, len(set(b)) + 1, len(b) * 7, 0.5
            )
            assert r.n_bytes == len(b)

    def test_frame_fn_injection_seam(self, spark):
        from filters_spark.operators.multimodal import sample_frames

        media = spark.createDataFrame(
            [(1, 3_000, b"vid-one"), (2, 2_000, b"vid-two")],
            "media_id long, duration_ms long, payload binary",
        )

        def fake_frame(payload, frame_idx, ts_ms):
            return payload + b"@" + str(ts_ms).encode()

        rows = sample_frames(
            media, every_ms=1000, decode_stub=False, frame_fn=fake_frame
        ).collect()
        got = {(r.media_id, r.frame_idx): bytes(r.frame) for r in rows}
        assert got[(1, 2)] == b"vid-one@2000"
        assert got[(2, 1)] == b"vid-two@1000"
        assert len(got) == 5


class TestDedupeClusters:
    def _pairs(self, spark, rows):
        return spark.createDataFrame(rows, "id_a long, id_b long")

    def test_components_and_representatives(self, spark):
        from filters_spark.operators.dedupe import dedupe_clusters

        # two components: a 4-chain {1-2-3-4} (diameter 3, needs real
        # propagation) and a pair {10,11}
        pairs = self._pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
        got = {(r.id, r.cluster_id) for r in dedupe_clusters(pairs).collect()}
        assert got == {(1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10)}

    def test_keep_representative_passes_untouched_rows(self, spark):
        from filters_spark.operators.dedupe import dedupe_keep_representative

        df = spark.createDataFrame([(i, f"d{i}") for i in range(6)], "doc_id long, t string")
        pairs = self._pairs(spark, [(0, 1), (1, 2), (4, 5)])
        kept = sorted(r.doc_id for r in dedupe_keep_representative(df, pairs, "doc_id").collect())
        assert kept == [0, 3, 4]  # 0 reps {0,1,2}, 4 reps {4,5}, 3 untouched

    def test_matches_exact_cc_on_random_graph(self, spark):
        import random

        from filters_spark.operators.dedupe import dedupe_clusters

        rng = random.Random(13)
        edges = sorted({tuple(sorted(rng.sample(range(60), 2))) for _ in range(70)})
        got = {r.id: r.cluster_id for r in dedupe_clusters(self._pairs(spark, edges)).collect()}

        # exact union-find oracle
        parent = list(range(60))
        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in edges:
            parent[find(a)] = find(b)
        touched = {v for e in edges for v in e}
        want = {x: min(y for y in touched if find(y) == find(x)) for x in touched}
        assert got == want

    def test_nonconvergence_raises(self, spark):
        # a diameter-5 chain cannot settle in 1 round: silent wrong
        # labels would poison keep-representative, so it must raise
        from filters_spark.operators.dedupe import dedupe_clusters

        pairs = self._pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)])
        with pytest.raises(RuntimeError, match="did not converge"):
            dedupe_clusters(pairs, max_iter=1)

    def test_string_ids_and_deep_chain(self, spark):
        # review regression: convergence must not aggregate over the id
        # TYPE (string ids + diameter-4 chain forces >2 propagation rounds)
        from filters_spark.operators.dedupe import dedupe_clusters

        pairs = spark.createDataFrame(
            [("e", "d"), ("d", "c"), ("c", "b"), ("b", "a"), ("x", "y")],
            "id_a string, id_b string",
        )
        got = {(r.id, r.cluster_id) for r in dedupe_clusters(pairs).collect()}
        assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
                       ("e", "a"), ("x", "x"), ("y", "x")}


class TestHashing:
    def test_sha64_matches_python_and_duckdb(self, spark):
        import hashlib

        import duckdb
        import pyspark.sql.functions as F

        from filters_spark.operators.hashing import sha64, sha64_sql

        vals = ["", "a", "hello world", "x" * 300, "0", "salt:gram one two"]
        df = spark.createDataFrame([(v,) for v in vals], "s string")
        got = [r.h for r in df.select(sha64(F.col("s")).alias("h")).collect()]
        want = [
            int.from_bytes(hashlib.sha256(v.encode()).digest()[:8], "big", signed=True)
            for v in vals
        ]
        assert got == want
        con = duckdb.connect()
        con.execute("CREATE TABLE t(s VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
        duck = [r[0] for r in con.execute(f"SELECT {sha64_sql('s')} FROM t").fetchall()]
        assert duck == want

    def test_sha_planes_deterministic(self):
        from filters_spark.operators.hashing import sha_planes

        a = sha_planes(8, 4, 7)
        assert a == sha_planes(8, 4, 7)
        assert a != sha_planes(8, 4, 8)
        assert all(v in (1.0, -1.0) for row in a for v in row)


class TestSampling:
    def test_hash_split_deterministic_and_weighted(self, spark):
        from filters_spark.operators.sampling import hash_split

        df = spark.range(20000).withColumnRenamed("id", "doc_id")
        w = {"train": 0.98, "val": 0.01, "test": 0.01}
        a = {r.doc_id: r.split for r in hash_split(df, "doc_id", w).collect()}
        b = {r.doc_id: r.split for r in hash_split(df, "doc_id", w).collect()}
        assert a == b  # no RNG anywhere
        from collections import Counter
        c = Counter(a.values())
        assert 0.97 < c["train"] / 20000 < 0.99
        assert 0.005 < c["val"] / 20000 < 0.02
        # a different salt reshuffles assignments
        s2 = {r.doc_id: r.split for r in hash_split(df, "doc_id", w, salt=7).collect()}
        assert s2 != a

    def test_quota_per_group(self, spark):
        from filters_spark.operators.sampling import quota_per_group

        df = spark.createDataFrame(
            [(g, i) for g in ("a", "b") for i in range(10)], "src string, doc_id long"
        )
        kept = quota_per_group(df, "src", "doc_id", 3).collect()
        by_g = {}
        for r in kept:
            by_g.setdefault(r.src, []).append(r.doc_id)
        assert {g: sorted(v) for g, v in by_g.items()} == {"a": [0, 1, 2], "b": [0, 1, 2]}

    def test_pack_sequences_contiguous(self, spark):
        from filters_spark.operators.sampling import pack_sequences

        df = spark.createDataFrame(
            [(0, 3000), (1, 2000), (2, 2000), (3, 100)], "doc_id long, toks long"
        )
        got = {r.doc_id: r.seq_id for r in pack_sequences(df, "doc_id", "toks", 4096).collect()}
        # starts: 0 -> seq 0; 3000 -> seq 0; 5000 -> seq 1; 7000 -> seq 1
        # (seq_id is a STRING in both modes — stable output type)
        assert got == {0: "0", 1: "0", 2: "1", 3: "1"}

    def test_pack_sequences_sharded(self, spark):
        from filters_spark.operators.sampling import pack_sequences

        df = spark.createDataFrame(
            [("s1", 0, 3000), ("s1", 1, 2000), ("s2", 2, 3000),
             ("s2", 3, 2000), ("s2", 4, 2000)],
            "src string, doc_id long, toks long",
        )
        packed = pack_sequences(df, "doc_id", "toks", 4096, partition_col="src")
        got = {r.doc_id: r.seq_id for r in packed.collect()}
        # per-shard packing restarts offsets: s2 starts are 0, 3000,
        # 5000 -> windows 0, 0, 1; seq ids are shard-salted
        assert got == {0: "s1-0", 1: "s1-0", 2: "s2-0", 3: "s2-0", 4: "s2-1"}
        # scale pin: the partitioned window must NOT be a global sort —
        # no SinglePartition exchange in the physical plan
        plan = packed._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan

    def test_quota_per_group_precap_equivalence(self, spark):
        from filters_spark.operators.sampling import quota_per_group

        # one hot group holding ~50% of rows: precap path must return
        # exactly the plain path's rows
        rows = [("hot", i) for i in range(200)] + [
            (f"g{i % 7}", 1000 + i) for i in range(200)
        ]
        df = spark.createDataFrame(rows, "src string, doc_id long").repartition(8)
        plain = sorted((r.src, r.doc_id) for r in quota_per_group(df, "src", "doc_id", 5).collect())
        capped = sorted(
            (r.src, r.doc_id)
            for r in quota_per_group(df, "src", "doc_id", 5, precap=True).collect()
        )
        assert plain == capped
        assert len([p for p in plain if p[0] == "hot"]) == 5


class TestEvents:
    def test_asof_join_backward_inclusive(self, spark):
        from datetime import datetime

        from filters_spark.operators.events import asof_join

        T = lambda s: datetime.fromisoformat(s)
        left = spark.createDataFrame(
            [(1, 10, T("2024-01-01T10:00:00")),
             (2, 10, T("2024-01-01T12:00:00")),
             (3, 11, T("2024-01-01T09:00:00"))],
            "event_id long, user_id long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(100, 10, T("2024-01-01T09:30:00"), 5.0),
             (101, 10, T("2024-01-01T12:00:00"), 7.0),  # equal ts: inclusive
             (102, 12, T("2024-01-01T08:00:00"), 9.0)],
            "event_id long, user_id long, ts timestamp, value double",
        )
        out = {r.event_id: (r.event_id_r, r.value_r) for r in asof_join(
            left, right, on="user_id", right_cols=["event_id", "value"],
            tiebreak="event_id").collect()}
        assert out == {1: (100, 5.0), 2: (101, 7.0), 3: (None, None)}

    def test_asof_join_tolerance_and_ties(self, spark):
        from datetime import datetime

        from filters_spark.operators.events import asof_join

        T = lambda s: datetime.fromisoformat(s)
        left = spark.createDataFrame(
            [(1, 10, T("2024-01-01T10:00:00"))],
            "event_id long, user_id long, ts timestamp",
        )
        right = spark.createDataFrame(
            # two right rows at the SAME (user, ts): highest tiebreak wins
            [(100, 10, T("2024-01-01T09:00:00"), 1.0),
             (101, 10, T("2024-01-01T09:00:00"), 2.0)],
            "event_id long, user_id long, ts timestamp, value double",
        )
        r = asof_join(left, right, on="user_id", right_cols=["event_id", "value"],
                      tiebreak="event_id").collect()[0]
        assert (r.event_id_r, r.value_r) == (101, 2.0)
        # 30-minute tolerance: the 1h-old match is nulled out
        r2 = asof_join(left, right, on="user_id", right_cols=["event_id", "value"],
                       tiebreak="event_id", tolerance_secs=1800).collect()[0]
        assert (r2.event_id_r, r2.value_r, r2.ts_r) == (None, None, None)
        # 2h tolerance keeps it
        r3 = asof_join(left, right, on="user_id", right_cols=["event_id", "value"],
                       tiebreak="event_id", tolerance_secs=7200).collect()[0]
        assert r3.event_id_r == 101

    def test_asof_join_string_tiebreak(self, spark):
        """A non-numeric tiebreak column keeps its native type: the
        regression cast it to long, NULLing out string ids and making
        the tie resolution partition-order-dependent."""
        from datetime import datetime

        from filters_spark.operators.events import asof_join

        T = lambda s: datetime.fromisoformat(s)
        left = spark.createDataFrame(
            [(1, 10, T("2024-01-01T10:00:00"))],
            "event_id long, user_id long, ts timestamp",
        )
        right = spark.createDataFrame(
            [("a", 10, T("2024-01-01T09:00:00"), 1.0),
             ("b", 10, T("2024-01-01T09:00:00"), 2.0)],
            "uid string, user_id long, ts timestamp, value double",
        )
        r = asof_join(left, right, on="user_id", right_cols=["uid", "value"],
                      tiebreak="uid").collect()[0]
        assert (r.uid_r, r.value_r) == ("b", 2.0)

    def test_asof_join_single_shuffle_no_join(self, spark):
        from datetime import datetime

        from filters_spark.operators.events import asof_join

        T = datetime.fromisoformat
        left = spark.createDataFrame(
            [(1, 10, T("2024-01-01T10:00:00"))],
            "event_id long, user_id long, ts timestamp")
        right = spark.createDataFrame(
            [(2, 10, T("2024-01-01T09:00:00"), 1.0)],
            "event_id long, user_id long, ts timestamp, value double")
        plan = asof_join(left, right, on="user_id",
                         right_cols=["value"])._jdf.queryExecution().executedPlan().toString()
        # union+window formulation: no join operator of any kind
        assert "Join" not in plan and "CartesianProduct" not in plan
        assert plan.count("Exchange hashpartitioning") == 1

    def test_sessionize_gap_boundaries(self, spark):
        from datetime import datetime

        from filters_spark.operators.events import session_stats, sessionize

        T = datetime.fromisoformat
        df = spark.createDataFrame(
            [(1, 10, T("2024-01-01T10:00:00")),
             (2, 10, T("2024-01-01T10:20:00")),   # 20min -> same session
             (3, 10, T("2024-01-01T11:00:00")),   # 40min -> new session
             (4, 10, T("2024-01-01T11:30:00")),   # exactly gap -> same (> is strict)
             (5, 11, T("2024-01-01T10:00:00"))],
            "event_id long, user_id long, ts timestamp",
        )
        sess = {r.event_id: r.session_id
                for r in sessionize(df, gap_secs=1800).collect()}
        assert sess == {1: "10-0", 2: "10-0", 3: "10-1", 4: "10-1", 5: "11-0"}
        stats = {r.session_id: (r.n_events, r.duration_secs)
                 for r in session_stats(df, gap_secs=1800).collect()}
        assert stats == {"10-0": (2, 1200), "10-1": (2, 1800), "11-0": (1, 0)}


class TestTextCuration:
    def test_top_ngram_stats(self, spark):
        from filters_spark.operators.textstats import top_ngram_stats

        df = spark.createDataFrame(
            [(1, "a b a b a b"), (2, "x y z"), (3, "q")],
            "doc_id long, text string",
        )
        out = {r.doc_id: (r.top_gram, r.top_gram_count, r.top_gram_char_frac)
               for r in top_ngram_stats(df, n=2).collect()}
        # doc 1: grams [a b, b a, a b, b a, a b] -> 'a b' x3, 3*3/11 chars
        assert out[1] == ("a b", 3, round(9 / 11, 4))
        # doc 2: all grams unique; lexicographic tiebreak picks 'x y'
        assert out[2] == ("x y", 1, round(3 / 5, 4))
        # doc 3: fewer than n tokens -> dropped
        assert 3 not in out

    def test_dup_segment_stats(self, spark):
        from filters_spark.operators.textstats import dup_segment_stats

        df = spark.createDataFrame(
            [(1, "buy now. limited offer. buy now. act fast."),
             (2, "one. two. three."),
             (3, "")],
            "doc_id long, text string",
        )
        out = {r.doc_id: (r.n_segments, r.distinct_segments, r.dup_segment_frac)
               for r in dup_segment_stats(df).collect()}
        assert out[1] == (4, 3, 0.25)
        assert out[2] == (3, 3, 0.0)
        assert out[3] == (0, 0, 0.0)

    def test_corpus_segment_dedupe(self, spark):
        from filters_spark.operators.textstats import corpus_segment_dedupe

        df = spark.createDataFrame(
            [(1, "unique one. subscribe now. more one"),
             (2, "subscribe now. unique two"),
             (3, "only original text here"),
             (4, "subscribe now")],
            "doc_id long, text string",
        )
        out = {r.doc_id: (r.n_segments, r.n_kept, r.cleaned_text)
               for r in corpus_segment_dedupe(df, min_docs=2).collect()}
        # 'subscribe now' appears in 3 distinct docs -> stripped everywhere,
        # order of survivors preserved, fully-boilerplate doc kept as ''
        assert out[1] == (3, 2, "unique one. more one")
        assert out[2] == (2, 1, "unique two")
        assert out[3] == (1, 1, "only original text here")
        assert out[4] == (1, 0, "")

    def test_corpus_segment_dedupe_within_doc_repeat_not_hot(self, spark):
        from filters_spark.operators.textstats import corpus_segment_dedupe

        # a segment repeated WITHIN one document only is not corpus
        # boilerplate (distinct-doc frequency 1) and must survive
        df = spark.createDataFrame(
            [(1, "echo. echo. echo"), (2, "other")],
            "doc_id long, text string",
        )
        out = {r.doc_id: (r.n_kept, r.cleaned_text)
               for r in corpus_segment_dedupe(df, min_docs=2).collect()}
        assert out[1] == (3, "echo. echo. echo")
        assert out[2] == (1, "other")

    def test_ngram_contamination(self, spark):
        from filters_spark.operators.textstats import ngram_contamination

        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps"),   # shares 3-gram runs w/ bench
             (2, "completely different text here")],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(9, "a quick brown fox sat")], "doc_id long, text string",
        )
        out = {r.doc_id: (r.n_grams, r.n_contaminated, r.contaminated_frac)
               for r in ngram_contamination(docs, bench, n=3).collect()}
        # doc1 3-grams: {the quick brown, quick brown fox, brown fox jumps};
        # bench: {a quick brown, quick brown fox, brown fox sat} -> 1 hit
        assert out[1] == (3, 1, round(1 / 3, 4))
        assert out[2] == (2, 0, 0.0)

    def test_interval_join_binned_pairs(self, spark):
        from datetime import datetime

        import pyspark.sql.functions as F

        from filters_spark.operators.events import interval_join

        T = datetime.fromisoformat
        # intervals (lo, lo+2h]; right rows straddle bin boundaries
        left = spark.createDataFrame(
            [(1, T("2024-01-01T23:00:00")),   # spans two day-bins
             (2, T("2024-01-03T01:00:00"))],
            "iv_id long, ts timestamp",
        )
        right = spark.createDataFrame(
            [(10, T("2024-01-01T23:30:00")),  # in iv 1, bin of day 1
             (11, T("2024-01-02T00:30:00")),  # in iv 1, bin of day 2
             (12, T("2024-01-01T23:00:00")),  # == lo: excluded (strict >)
             (13, T("2024-01-02T01:00:00")),  # > hi of iv 1? hi=01:00 -> included (<=)
             (14, T("2024-01-04T00:00:00"))], # matches nothing
            "r_id long, ts timestamp",
        )
        pairs = interval_join(
            left, right, F.col("ts"), F.col("ts") + F.expr("INTERVAL 2 HOURS"),
            bin_secs=86400,
        )
        got = sorted((r.iv_id, r._right.r_id) for r in pairs.collect())
        assert got == [(1, 10), (1, 11), (1, 13)]
        # each qualifying pair appears exactly once despite multi-bin intervals
        assert len(got) == len(set(got))
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


class TestSearch:
    def test_bm25_scores_and_ranking(self, spark):
        import math

        from filters_spark.operators.search import bm25_topk

        corpus = {1: "join join join filler", 2: "join merge", 3: "other words here"}
        df = spark.createDataFrame(
            list(corpus.items()), "doc_id long, text string")
        got = {r.doc_id: r.bm25 for r in bm25_topk(df, "join merge", k=3).collect()}

        # independent reimplementation (plain python, k1=1.2 b=0.75)
        tfs = {d: (t.split().count("join"), t.split().count("merge"))
               for d, t in corpus.items()}
        dls = {d: len(t.split()) for d, t in corpus.items()}
        n, avgdl = 3, sum(dls.values()) / 3
        dfq = [sum(1 for v in tfs.values() if v[i] > 0) for i in (0, 1)]
        exp = {}
        for d in corpus:
            s = 0.0
            for i in (0, 1):
                idf = math.log(1 + (n - dfq[i] + 0.5) / (dfq[i] + 0.5))
                tf = float(tfs[d][i])
                s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dls[d] / avgdl))
            exp[d] = round(s, 4)
        assert got == exp
        # doc 2 hits both terms -> outranks the 3x single-term doc 1
        order = [r.doc_id for r in bm25_topk(df, "join merge", k=3).collect()]
        assert order[0] == 2 and order[-1] == 3

    def test_bm25_empty_query_scores_zero(self, spark):
        """An empty/whitespace query yields 0.0 for every document
        (the regression was an unresolved-column AnalysisException)."""
        from filters_spark.operators.search import bm25_score, bm25_topk

        df = spark.createDataFrame(
            [(1, "some text"), (2, "more text")], "doc_id long, text string")
        got = {r.doc_id: r.bm25 for r in bm25_score(df, "   ").collect()}
        assert got == {1: 0.0, 2: 0.0}
        assert [r.doc_id for r in bm25_topk(df, "", k=1).collect()] == [1]

    def test_bm25_plan_is_single_scan_topk(self, spark):
        from filters_spark.operators.search import bm25_topk

        df = spark.createDataFrame(
            [(1, "a b"), (2, "b c")], "doc_id long, text string")
        plan = bm25_topk(df, "b", k=1)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestStratifiedSampling:
    def test_stratified_rates_and_determinism(self, spark):
        from filters_spark.operators.sampling import _MOD, _MULT, stratified_sample

        rows = [(i, ["a", "b", "c"][i % 3]) for i in range(600)]
        df = spark.createDataFrame(rows, "doc_id long, stratum string")
        out = stratified_sample(
            df, "stratum", {"a": 1.0, "b": 0.5}, "doc_id", default_frac=0.0
        )
        got = {(r.doc_id, r.stratum) for r in out.collect()}

        def h(i):
            return (i % _MOD) * _MULT % _MOD / _MOD

        exp = {
            (i, s)
            for i, s in rows
            if h(i) < {"a": 1.0, "b": 0.5}.get(s, 0.0)
        }
        assert got == exp
        assert not any(s == "c" for _, s in got)  # default_frac=0 drops
        assert sum(1 for _, s in got if s == "a") == 200  # frac 1.0 keeps all
        # map-only: no exchange in the plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_balance_strata_targets_min(self, spark):
        from filters_spark.operators.sampling import balance_strata

        rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, stratum string")
        out = balance_strata(df, "stratum", "doc_id").collect()
        by = {}
        for r in out:
            by.setdefault(r.stratum, 0)
            by[r.stratum] += 1
        assert by["small"] == 100  # at/under target keeps everything
        # big stratum lands near target=100 in expectation (hash test)
        assert 60 <= by["big"] <= 140
        # explicit target, deterministic across calls
        a = sorted(r.doc_id for r in balance_strata(df, "stratum", "doc_id", target=50).collect())
        b = sorted(r.doc_id for r in balance_strata(df, "stratum", "doc_id", target=50).collect())
        assert a == b

    def test_balance_strata_broadcasts_counts(self, spark):
        from filters_spark.operators.sampling import balance_strata

        df = spark.createDataFrame(
            [(i, str(i % 3)) for i in range(30)], "doc_id long, stratum string"
        )
        plan = (
            balance_strata(df, "stratum", "doc_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestTfidf:
    def test_tfidf_against_reference(self, spark):
        import math

        from filters_spark.operators.search import tfidf_topk_terms

        corpus = {
            1: "spark spark join",
            2: "join merge merge merge",
            3: "spark merge scan",
        }
        df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
        got = {
            (r.doc_id, r.term): (r.tf, r.tfidf)
            for r in tfidf_topk_terms(df, k=2, min_df=1).collect()
        }
        # reference: tf * ln(N/df), top-2 per doc by rounded score then term
        tf = {}
        for d, t in corpus.items():
            for w in t.split():
                tf[(d, w)] = tf.get((d, w), 0) + 1
        dfreq = {}
        for (d, w), _ in tf.items():
            dfreq[w] = dfreq.get(w, 0) + 1
        scored = {
            (d, w): (n, round(n * math.log(3 / dfreq[w]), 4))
            for (d, w), n in tf.items()
        }
        exp = {}
        for d in corpus:
            terms = sorted(
                ((w, v) for (dd, w), v in scored.items() if dd == d),
                key=lambda x: (-x[1][1], x[0]),
            )[:2]
            for w, v in terms:
                exp[(d, w)] = v
        assert got == exp

    def test_min_df_prunes(self, spark):
        from filters_spark.operators.search import tfidf_topk_terms

        df = spark.createDataFrame(
            [(1, "rare shared"), (2, "shared")], "doc_id long, text string"
        )
        terms = {r.term for r in tfidf_topk_terms(df, k=5, min_df=2).collect()}
        assert terms == {"shared"}


class TestLookup:
    def test_lookup_prunes_to_one_bucket(self, spark, tmp_path):
        import pyspark.sql.functions as F

        from filters_spark.lake.table import LakeTable, bucket_expr

        root = str(tmp_path / "lk")
        t = LakeTable.create(spark, root, ["repo", "path"], num_buckets=8)
        rows = [
            ("r%d" % (i % 5), "f%d.py" % i, "%012x" % i, i, "py", "blob%d" % i)
            for i in range(200)
        ]
        df = spark.createDataFrame(
            rows,
            "repo string, path string, commit string, event_seq long, "
            "lang string, content string",
        ).withColumn("content_sha", F.sha2(F.col("content"), 256)).withColumn(
            "_bucket", bucket_expr(F.col("repo"), F.col("path"), 8, 16)
        )
        touched = sorted(r._bucket for r in df.select("_bucket").distinct().collect())
        t.commit_buckets(
            df.repartition("_bucket"), touched, {b: "%012x:0" % 300 for b in touched}
        )

        got = t.lookup("r3", "f13.py").collect()
        assert len(got) == 1 and got[0]["commit"] == "%012x" % 13
        assert t.lookup("r3", "nope.py").count() == 0

        # the scan under lookup() reads ONE bucket's file list, not the
        # whole table's: its input files are a strict subset
        snap = t.snapshot()
        all_files = sum(len(v) for v in snap["buckets"].values())
        looked = t.lookup("r3", "f13.py")
        n_in = len(looked.inputFiles())
        one_bucket = max(len(v) for v in snap["buckets"].values())
        assert n_in <= one_bucket < all_files


class TestInvertedPostings:
    def test_postings_capped_sorted_and_counted(self, spark):
        from filters_spark.operators.search import inverted_postings

        docs = [(1, "a b"), (2, "b a a"), (3, "b c"), (4, "b")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.term: (r.df_count, r.postings)
            for r in inverted_postings(df, max_postings=2).collect()
        }
        # presence postings over distinct per-doc terms; cap=2 keeps the
        # two LOWEST ids but df_count still counts every doc
        assert got == {
            "a": (2, "1,2"),
            "b": (4, "1,2"),
            "c": (1, "3"),
        }

    def test_vocab_trim_and_single_exchange(self, spark):
        from filters_spark.operators.search import inverted_postings

        docs = [(i, "stop " + ("rare" if i == 0 else "mid")) for i in range(10)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = inverted_postings(df, min_df=2, max_df_frac=0.95)
        terms = {r.term for r in out.collect()}
        assert terms == {"mid"}  # 'rare' df=1 < 2; 'stop' df=10 > 9.5
        # the rank window and the groupBy share the term exchange (the
        # AQE toString repeats the plan in its "Initial Plan" section —
        # count only the executed final section)
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("Exchange hashpartitioning(term") == 1


class TestStratifiedProperties:
    def test_partition_and_batch_invariance(self, spark):
        """A row's fate is a pure function of (id, stratum): the same
        rows survive regardless of partitioning, and sampling two
        halves separately equals sampling the union — the property an
        incremental pipeline needs."""
        from filters_spark.operators.sampling import stratified_sample

        rows = [(i, ["x", "y"][i % 2]) for i in range(400)]
        df = spark.createDataFrame(rows, "doc_id long, stratum string")
        frac = {"x": 0.3, "y": 0.7}

        def ids(d):
            return sorted(
                r.doc_id for r in stratified_sample(d, "stratum", frac, "doc_id").collect()
            )

        whole = ids(df)
        assert ids(df.repartition(17, "stratum")) == whole
        lo = ids(df.filter(F.col("doc_id") < 200))
        hi = ids(df.filter(F.col("doc_id") >= 200))
        assert sorted(lo + hi) == whole


class TestPiiRedact:
    def test_redacts_and_counts(self, spark):
        from filters_spark.operators.textstats import pii_redact

        rows = [
            (0, "mail a@b.io and c.d+x@e-f.co, host 10.0.0.1, tel +1 (415) 555-0100"),
            (1, "no pii here at all"),
            (2, "ip 192.168.1.255 twice 192.168.1.255"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in pii_redact(df).collect()}
        assert out[0].n_email == 2 and out[0].n_ipv4 == 1 and out[0].n_phone == 1
        assert out[0].n_pii == 4
        assert "<EMAIL>" in out[0].redacted and "<IP>" in out[0].redacted
        assert "<PHONE>" in out[0].redacted
        assert "@" not in out[0].redacted
        assert out[1].n_pii == 0 and out[1].redacted == "no pii here at all"
        assert out[2].n_ipv4 == 2 and out[2].redacted.count("<IP>") == 2

    def test_plan_is_map_only(self, spark):
        from filters_spark.operators.textstats import pii_redact

        df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        plan = pii_redact(df)._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        assert "Exchange" not in plan and "EvalPython" not in plan


class TestChunkDocuments:
    def test_coverage_and_overlap(self, spark):
        from filters_spark.operators.sampling import chunk_documents

        text = " ".join(f"t{i}" for i in range(113))
        df = spark.createDataFrame(
            [(0, text), (1, "short doc"), (2, "")],
            "doc_id long, text string",
        )
        rows = chunk_documents(df, chunk_tokens=64, overlap=16).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        # empty doc dropped
        assert set(by_doc) == {0, 1}
        # short doc: one chunk, all tokens
        (s,) = by_doc[1]
        assert s.chunk_id == 0 and s.n_tokens == 2 and s.chunk_text == "short doc"
        # 113 tokens, step 48: ceil((113-16)/48) = 3 chunks
        chunks = sorted(by_doc[0], key=lambda r: r.chunk_id)
        assert [c.start_token for c in chunks] == [1, 49, 97]
        assert [c.n_tokens for c in chunks] == [64, 64, 17]
        # every token covered, consecutive chunks share exactly 16 tokens
        toks = text.split(" ")
        covered = set()
        for c in chunks:
            ct = c.chunk_text.split(" ")
            assert ct == toks[c.start_token - 1 : c.start_token - 1 + c.n_tokens]
            covered.update(range(c.start_token - 1, c.start_token - 1 + c.n_tokens))
        assert covered == set(range(113))
        for a, b in zip(chunks, chunks[1:]):
            shared = (a.start_token + a.n_tokens) - b.start_token
            assert shared == 16

    def test_rejects_bad_overlap(self, spark):
        from filters_spark.operators.sampling import chunk_documents

        df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=8, overlap=8)


class TestRollingFeatures:
    def test_trailing_range_semantics(self, spark):
        from filters_spark.operators.events import rolling_features

        rows = [
            # user 1: events at t=0, 100, 700 (span 600 drops t=0 by t=700)
            (1, 1, "2026-01-01 00:00:00", 10.0),
            (2, 1, "2026-01-01 00:01:40", 20.0),
            (3, 1, "2026-01-01 00:11:40", 40.0),
            # user 2: two events SHARING a timestamp -> frame peers, both
            # rows see both events (deterministic without a tiebreak)
            (4, 2, "2026-01-01 00:00:00", 1.0),
            (5, 2, "2026-01-01 00:00:00", 2.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, value double"
        ).select("event_id", "user_id", F.to_timestamp("ts").alias("ts"), "value")
        out = {
            r.event_id: (r.n_span, r.sum_span)
            for r in rolling_features(df, span_secs=600).collect()
        }
        assert out == {
            1: (1, 10.0), 2: (2, 30.0), 3: (2, 60.0),
            4: (2, 3.0), 5: (2, 3.0),
        }

    def test_subsecond_frame_edge(self, spark):
        """The frame edge is exact at microsecond precision: a pair
        whose true gap is span + 0.4s sits OUTSIDE the trailing frame
        even though the floored whole-second gap equals the span (the
        truncation bug would include it), and a pair at exactly span
        microseconds is inside (RANGE bounds are inclusive)."""
        from filters_spark.operators.events import rolling_features

        rows = [
            # user 1: gap = 600.4s > span -> second event sees only itself
            (1, 1, "2026-01-01 00:00:00.300000", 10.0),
            (2, 1, "2026-01-01 00:10:00.700000", 20.0),
            # user 2: gap = exactly 600.000000s -> inclusive edge, both
            (3, 2, "2026-01-01 00:00:00.250000", 1.0),
            (4, 2, "2026-01-01 00:10:00.250000", 2.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts string, value double"
        ).select("event_id", "user_id", F.to_timestamp("ts").alias("ts"), "value")
        out = {
            r.event_id: (r.n_span, r.sum_span)
            for r in rolling_features(df, span_secs=600).collect()
        }
        assert out == {
            1: (1, 10.0), 2: (1, 20.0),
            3: (1, 1.0), 4: (2, 3.0),
        }

    def test_single_exchange(self, spark):
        from filters_spark.operators.events import rolling_features
        from filters_spark.plans.audit import exchange_count, has_python_eval

        df = spark.createDataFrame(
            [(i, i % 5, i * 50, float(i)) for i in range(300)],
            "event_id long, user_id long, secs long, value double",
        ).select(
            "event_id", "user_id",
            F.timestamp_seconds(F.col("secs")).alias("ts"), "value",
        )
        out = rolling_features(df, span_secs=600)
        out.collect()
        assert exchange_count(out) == 1 and not has_python_eval(out)


class TestSessionWindowBatch:
    def test_gap_merge_and_boundaries(self, spark):
        from filters_spark.streaming.windows import session_event_stats

        rows = [
            (1, "2026-01-01 10:00:00", 1.0),
            (1, "2026-01-01 10:20:00", 2.0),   # within 30min -> same session
            (1, "2026-01-01 10:50:00", 4.0),   # exactly 30min: still merges (touching)
            (1, "2026-01-01 11:20:01", 16.0),  # 30min+1s -> NEW session
            (2, "2026-01-01 09:00:00", 8.0),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts string, value double"
        ).select("user_id", F.to_timestamp("ts").alias("ts"), "value")
        out = {
            (r.user_id, r.session_start.isoformat(), r.session_end.isoformat()):
                (r.n, r.sum_value)
            for r in session_event_stats(df, gap="30 minutes").collect()
        }
        assert out == {
            (1, "2026-01-01T10:00:00", "2026-01-01T11:20:00"): (3, 7.0),
            (1, "2026-01-01T11:20:01", "2026-01-01T11:50:01"): (1, 16.0),
            (2, "2026-01-01T09:00:00", "2026-01-01T09:30:00"): (1, 8.0),
        }


class TestProfile:
    def test_counts_nulls_distincts_minmax(self, spark):
        from filters_spark.operators.profile import profile

        df = spark.createDataFrame(
            [("a", 1), ("b", None), ("a", 3), (None, 3)],
            "s string, x int",
        )
        got = {r.column: (r.n_rows, r.n_null, r.n_distinct, r.min_value, r.max_value)
               for r in profile(df, ["s", "x"]).collect()}
        assert got == {
            "s": (4, 1, 2, "a", "b"),
            "x": (4, 1, 2, "1", "3"),
        }

    def test_all_null_column(self, spark):
        from filters_spark.operators.profile import profile

        df = spark.createDataFrame([(None,), (None,)], "y: string")
        r = profile(df, ["y"]).head()
        assert (r.n_rows, r.n_null, r.n_distinct, r.min_value, r.max_value) == (
            2, 2, 0, None, None,
        )

    def test_validation(self, spark):
        from filters_spark.operators.profile import profile

        df = spark.createDataFrame([(1,)], "x: int")
        import pytest as _pytest
        with _pytest.raises(ValueError):
            profile(df, [])
        with _pytest.raises(ValueError):
            profile(df, ["nope"])


class TestMixtureSample:
    def test_composition_tracks_weights(self, spark):
        from filters_spark.operators.sampling import mixture_sample

        rows = [(i, f"s{i % 4}") for i in range(8000)]
        df = spark.createDataFrame(rows, "id long, src string")
        # heavily skewed target over 4 equal sources
        w = {"s0": 0.6, "s1": 0.2, "s2": 0.15, "s3": 0.05}
        out = mixture_sample(df, "src", "id", w, out_frac=0.5)
        got = {r[0]: r[1] for r in out.groupBy("src").count().collect()}
        n = sum(got.values())
        for s, ws in w.items():
            assert abs(got.get(s, 0) / n - ws) < 0.07  # hash-sample noise

    def test_capped_source_keeps_everything(self, spark):
        from filters_spark.operators.sampling import mixture_sample

        rows = [(i, "rare") for i in range(50)] + [(1000 + i, "big") for i in range(5000)]
        df = spark.createDataFrame(rows, "id long, src string")
        # rare's target share (0.5 * 5050 * 0.5 = 1262) exceeds its 50
        # rows -> p caps at 1, everything kept
        out = mixture_sample(df, "src", "id", {"rare": 0.5, "big": 0.5}, 0.5)
        kept_rare = out.filter("src = 'rare'").count()
        assert kept_rare == 50

    def test_unweighted_sources_dropped_and_deterministic(self, spark):
        from filters_spark.operators.sampling import mixture_sample

        rows = [(i, f"s{i % 3}") for i in range(300)]
        df = spark.createDataFrame(rows, "id long, src string")
        out1 = sorted(r.id for r in mixture_sample(df, "src", "id", {"s0": 1.0}, 0.3).collect())
        out2 = sorted(r.id for r in mixture_sample(df, "src", "id", {"s0": 1.0}, 0.3).collect())
        assert out1 == out2
        assert all(i % 3 == 0 for i in out1)

    def test_validation(self, spark):
        from filters_spark.operators.sampling import mixture_sample

        df = spark.createDataFrame([(1, "a")], "id long, src string")
        with pytest.raises(ValueError):
            mixture_sample(df, "src", "id", {"a": 1.0}, 0.0)
        with pytest.raises(ValueError):
            mixture_sample(df, "src", "id", {"zzz": 1.0}, 0.5)


class TestProfileEmptyInput:
    def test_empty_input_still_reports_columns(self, spark):
        from filters_spark.operators.profile import profile

        df = spark.createDataFrame([], "s string, x int")
        got = {r.column: (r.n_rows, r.n_null, r.n_distinct, r.min_value, r.max_value)
               for r in profile(df, ["s", "x"]).collect()}
        assert got == {"s": (0, 0, 0, None, None), "x": (0, 0, 0, None, None)}


def test_scd2_history_intervals_and_gaps(spark):
    from filters_spark.operators.events import scd2_history

    rows = [
        ("r", "a", "000000000001", 1, "py", "v1", "I"),
        ("r", "a", "000000000003", 1, "py", "v2", "U"),
        ("r", "a", "000000000005", 1, None, None, "D"),
        ("r", "a", "000000000007", 1, "py", "v3", "I"),
        ("r", "b", "000000000002", 1, "go", "w1", "I"),
        ("r", "b", "000000000004", 1, None, None, "D"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, `commit` string, event_seq long, "
              "lang string, content string, op string")
    out = scd2_history(df, ["repo", "path"], ["lang", "content"],
                       ["commit", "event_seq"])
    got = [tuple(r) for r in out.orderBy("path", "valid_from_commit").collect()]
    assert got == [
        # v1 closed by v2, v2 closed by the DELETE, v3 open after the gap
        ("r", "a", "000000000001", 1, "000000000003", 1, False, "py", "v1"),
        ("r", "a", "000000000003", 1, "000000000005", 1, False, "py", "v2"),
        ("r", "a", "000000000007", 1, None, None, True, "py", "v3"),
        # key b: deleted last -> interval closed, NO current version
        ("r", "b", "000000000002", 1, "000000000004", 1, False, "go", "w1"),
    ]
    # one key-partitioned window = one shuffle
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_scd2_asof_join_point_in_time(spark):
    """Temporal join against SCD2 history (operators/events.py
    scd2_asof_join): facts pick up the version valid at their own
    (c, q) position; boundary inclusive on valid_from, exclusive on
    valid_to; delete gaps and before-first-version facts get NULL
    (left) or drop (inner)."""
    from filters_spark.operators.events import scd2_asof_join, scd2_history

    ev = spark.createDataFrame(
        [
            ("u1", 1, 1, "I", "a"),
            ("u1", 3, 1, "U", "b"),
            ("u1", 5, 1, "D", None),
            ("u1", 7, 1, "I", "c"),
            ("u2", 2, 1, "I", "z"),
        ],
        "k string, c long, q long, op string, attr string",
    )
    hist = scd2_history(ev, ["k"], ["attr"], ["c", "q"])
    facts = spark.createDataFrame(
        [
            ("u1", 0, 5, 100), ("u1", 2, 0, 101), ("u1", 3, 1, 102),
            ("u1", 4, 9, 103), ("u1", 6, 0, 104), ("u1", 8, 0, 105),
            ("u2", 2, 1, 106), ("u3", 9, 9, 107),
        ],
        "k string, c long, q long, fact_id long",
    )
    left = {
        r.fact_id: r.dim_attr
        for r in scd2_asof_join(facts, hist, ["k"], ["c", "q"]).collect()
    }
    assert left == {
        100: None, 101: "a", 102: "b", 103: "b",
        104: None, 105: "c", 106: "z", 107: None,
    }
    inner = sorted(
        r.fact_id
        for r in scd2_asof_join(facts, hist, ["k"], ["c", "q"], how="inner").collect()
    )
    assert inner == [101, 102, 103, 105, 106]
    # the op column of the version rides along (dimension payload incl.
    # non-selected history cols is prefixed)
    row = [r for r in scd2_asof_join(facts, hist, ["k"], ["c", "q"]).collect()
           if r.fact_id == 101][0]
    assert row.dim_attr == "a"

    # collision guard: a fact column spelled like a prefixed dim column
    # (or a join internal) must raise instead of yielding duplicate /
    # silently-dropped output columns
    with pytest.raises(ValueError, match="collide"):
        scd2_asof_join(
            facts.withColumn("dim_attr", F.lit("x")), hist, ["k"], ["c", "q"]
        )
    with pytest.raises(ValueError, match="collide"):
        scd2_asof_join(
            facts.withColumn("__from", F.lit(1)), hist, ["k"], ["c", "q"]
        )


def test_ngram_repetition_scores(spark):
    from filters_spark.operators.textstats import ngram_repetition

    d = spark.createDataFrame(
        [
            (1, "a b a b a b a b"),         # "a b a" x3 + "b a b" x3: all dup
            (2, "one two three four five"),  # all distinct
            (3, "x"),                        # shorter than n: 1 gram
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in ngram_repetition(d, "text", n=3).collect()}
    assert got[2].dup_fraction == 0.0 and got[2].distinct_ngrams == 3
    assert got[3].total_ngrams == 1 and got[3].dup_fraction == 0.0
    # doc 1: 6 grams, 2 distinct -> 4/6
    assert got[1].total_ngrams == 6 and got[1].distinct_ngrams == 2
    assert abs(got[1].dup_fraction - 4 / 6) < 1e-12


def test_decontaminate_flags_overlap(spark):
    from filters_spark.operators.textstats import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated text with no overlap whatsoever here now"),
            (3, "the quick brown fox jumps over the lazy dog again"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_hits, r.contaminated)
           for r in decontaminate(docs, bench, "text", n=8, min_hits=1).collect()}
    # docs 1 and 3 share the 8-gram(s) of the benchmark sentence
    assert got[1][1] and got[3][1] and not got[2][1]
    assert got[2][0] == 0 and got[1][0] >= 1
