"""Golden-frame tests for the LLM-data-pipeline operators: text analysis,
dedup (exact / MinHash-LSH / SimHash), similarity search, multimodal
plumbing, and the streaming trend twin.

These complement the DuckDB oracle checks (oracles/llm_sql.py) with
hand-computable cases — in particular they pin the MinHash salt and
SimHash bit loops, which once regressed via the two-parameter-lambda
pitfall (F.transform binding the second param to the array index).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from recon_spark.operators import dedup as DD
from recon_spark.operators import multimodal
from recon_spark.operators import similarity as SIM
from recon_spark.operators import text as T


def one(spark, text):
    return (
        spark.createDataFrame([(1, text)], "doc_id long, text string")
        .select(
            T.token_count("text").alias("n"),
            T.char_count("text").alias("c"),
            T.punct_ratio("text").alias("p"),
            T.language_guess("text").alias("lang"),
            T.quality_flags("text").alias("flags"),
            T.fingerprint("text").alias("fp"),
            T.shingles("text").alias("sh"),
        )
        .first()
    )


# --- text analysis -----------------------------------------------------------


def test_tokens_split_and_lowercase(spark):
    row = (
        spark.createDataFrame([("Hello, World!  42",)], "text string")
        .select(T.tokens("text").alias("t"))
        .first()
    )
    assert row.t == ["hello", "world", "42"]


def test_token_and_char_count(spark):
    r = one(spark, "one two three")
    assert r.n == 3 and r.c == 13


def test_null_text_yields_null_stats(spark):
    r = one(spark, None)
    assert r.n is None and r.c is None and r.p is None and r.fp is None


def test_punct_ratio(spark):
    r = one(spark, "ab!!")
    assert r.p == pytest.approx(0.5)


def test_language_guess(spark):
    assert one(spark, "the cat and the dog is here").lang == "en"
    assert one(spark, "el que de la y un").lang == "es"
    assert one(spark, "zzz qqq xxx").lang is None


def test_quality_flags(spark):
    assert one(spark, "hi").flags == ["too_few_tokens"]
    assert one(spark, "a perfectly ordinary sentence with many plain words").flags == []


def test_fingerprint_normalizes_case_and_whitespace(spark):
    a = one(spark, "Hello   World").fp
    b = one(spark, "hello world").fp
    c = one(spark, "hello there").fp
    assert a == b and a != c


def test_shingles(spark):
    assert one(spark, "a b c d").sh == ["a b c", "b c d"]
    assert one(spark, "a b").sh == ["a b"]  # shorter than k -> full join
    assert one(spark, "").sh == []


# --- dedup -------------------------------------------------------------------


def test_exact_dedup_keeps_lowest_id(spark):
    df = spark.createDataFrame(
        [(3, "Same  Text"), (1, "same text"), (2, "other text")],
        "doc_id long, text string",
    ).withColumn("fp", T.fingerprint("text"))
    kept = DD.exact_dedup(df, F.col("fp"), ["doc_id"])
    assert sorted(r.doc_id for r in kept.collect()) == [1, 2]


def test_exact_dedup_hot_safe_matches_window_twin(spark):
    """The hot-cluster-safe min_by+join form (default) must be
    value-identical to the textbook row_number window spelling —
    including a hot duplicate cluster, a NULL content key group (the
    window treats NULL as one group; a plain `=` join would drop it),
    and untouched unique rows."""
    rows = (
        [(i, "boilerplate page") for i in range(100, 200)]  # hot cluster
        + [(1, "unique one"), (2, "unique two"), (7, None), (5, None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "fp", F.when(F.col("text").isNotNull(), T.fingerprint("text"))
    )
    got = sorted(
        (r.doc_id, r.text) for r in DD.exact_dedup(df, F.col("fp"), ["doc_id"]).collect()
    )
    want = sorted(
        (r.doc_id, r.text)
        for r in DD.exact_dedup(df, F.col("fp"), ["doc_id"], hot_safe=False).collect()
    )
    assert got == want
    assert [i for i, _ in got] == [1, 2, 5, 100]


def test_minhash_salts_are_distinct(spark):
    """Regression guard: each signature slot uses a different salt, so a
    multi-shingle doc must NOT produce 12 identical hash values."""
    row = (
        spark.createDataFrame(
            [("the quick brown fox jumps over the lazy dog again and again",)],
            "text string",
        )
        .select(DD.minhash_signature("text").alias("sig"))
        .first()
    )
    assert len(row.sig) == DD.N_MINHASH
    assert len(set(row.sig)) > 1


def test_minhash_identical_docs_same_signature(spark):
    rows = (
        spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
            "doc_id long, text string",
        )
        .select(DD.minhash_signature("text").alias("sig"))
        .collect()
    )
    assert rows[0].sig == rows[1].sig


def test_minhash_lsh_finds_copy_pair(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "totally unrelated words nothing shared here at all")],
        "doc_id long, text string",
    )
    cand = DD.minhash_lsh_candidates(docs)
    verified = DD.verify_candidates(cand, docs, threshold=0.5).collect()
    assert [(r.id_a, r.id_b) for r in verified] == [(1, 2)]
    assert verified[0].est_jaccard == pytest.approx(1.0)
    assert verified[0].jaccard == pytest.approx(1.0)


def test_minhash_near_dup_survives_verification(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base), (2, base + " with extra trailing tokens")],
        "doc_id long, text string",
    )
    cand = DD.minhash_lsh_candidates(docs)
    out = DD.verify_candidates(cand, docs, threshold=0.4).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
    assert 0.4 <= out[0].jaccard < 1.0


def test_ngram_jaccard_pairs_basic(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " with extra trailing tokens"),
            (3, "totally unrelated words nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    out = DD.ngram_jaccard_pairs(docs).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
    assert 0.4 <= out[0].jaccard < 1.0


def test_ngram_jaccard_prefix_filter_is_lossless(spark):
    """Prefix filtering must find EVERY pair with Jaccard >= t — compare
    against an unfiltered all-pairs exact-Jaccard computation on a corpus
    of overlapping sentences."""
    words = "the quick brown fox jumps over a lazy dog near some old barn".split()
    rows = [
        (i, " ".join(words[i % 3 : i % 3 + 8]) + f" tail{i % 4} tok{i % 2}")
        for i in range(24)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard for r in DD.ngram_jaccard_pairs(docs).collect()
    }
    sh = docs.select(
        F.col("doc_id").alias("id"), T.shingles("text").alias("sh")
    ).filter(F.size("sh") > 0)
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    brute = {
        (r.id_a, r.id_b): r.j
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("j", DD.exact_jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("j") >= 0.4)
        .collect()
    }
    assert set(got) == set(brute)
    for pair, j in brute.items():
        assert got[pair] == pytest.approx(j)


def test_ngram_prefix_variant_matches_count_based(spark):
    """The PPJoin-style prefix+verify path (round 7, for shingle-saturated
    corpora) must emit EXACTLY the count-based form's pairs and jaccards —
    both on the overlapping-sentence corpus (real near-dup structure) and
    on a tiny-vocabulary corpus (the saturated regime it exists for)."""
    words = "the quick brown fox jumps over a lazy dog near some old barn".split()
    sent_rows = [
        (i, " ".join(words[i % 3 : i % 3 + 8]) + f" tail{i % 4} tok{i % 2}")
        for i in range(24)
    ]
    tiny_vocab = ["a", "b", "c"]
    saturated_rows = [
        (100 + i, " ".join(tiny_vocab[(i + j) % 3] for j in range(6 + i % 5)))
        for i in range(30)
    ]
    for rows in (sent_rows, saturated_rows, sent_rows + saturated_rows):
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        count_based = {
            (r.id_a, r.id_b): r.jaccard
            for r in DD.ngram_jaccard_pairs(docs).collect()
        }
        prefix = {
            (r.id_a, r.id_b): r.jaccard
            for r in DD.ngram_jaccard_pairs_prefix(docs).collect()
        }
        assert set(prefix) == set(count_based)
        for pair, j in count_based.items():
            assert prefix[pair] == pytest.approx(j)
        # the _from_shingles twins over ONE shared staged frame (the
        # graded parity-fold composition in registry.q_ngram_jaccard)
        # must agree with their self-staging public forms
        sh = DD.staged_shingles(docs)
        shared_count = {
            (r.id_a, r.id_b): r.jaccard
            for r in DD.ngram_jaccard_pairs_from_shingles(sh).collect()
        }
        shared_prefix = {
            (r.id_a, r.id_b): r.jaccard
            for r in DD.ngram_jaccard_pairs_prefix_from_shingles(sh).collect()
        }
        sh.unpersist()
        assert shared_count == count_based
        assert set(shared_prefix) == set(count_based)


def test_simhash_identical_and_range(spark):
    rows = (
        spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "wholly different terms")],
            "doc_id long, text string",
        )
        .select("doc_id", DD.simhash("text").alias("sh"))
        .collect()
    )
    by_id = {r.doc_id: r.sh for r in rows}
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[3]
    for v in by_id.values():
        assert 0 <= v < (1 << DD.SIMHASH_BITS)


def test_simhash_bands_reassemble(spark):
    row = (
        spark.createDataFrame([("alpha beta gamma delta",)], "text string")
        .select(
            DD.simhash("text").alias("sh"),
            DD.simhash_bands(DD.simhash("text")).alias("bands"),
        )
        .first()
    )
    assert [b.band_idx for b in row.bands] == [0, 1]
    lo, hi = (b.band_val for b in row.bands)
    assert lo + (hi << 16) == row.sh


# --- similarity --------------------------------------------------------------


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_ranks_by_cosine(spark):
    corpus = _vecs(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.1]),   # nearly parallel to q
            (3, [0.0, 1.0]),   # orthogonal to q
            (4, [-1.0, 0.0]),  # opposite
        ],
    )
    q = corpus.filter(F.col("vec_id") == 1)
    out = SIM.brute_force_topk(corpus, q, k=3).collect()
    assert [r.neighbor_id for r in out] == [2, 3, 4]
    assert out[0].score == pytest.approx(1.0 / math.sqrt(1.01))
    assert out[1].score == pytest.approx(0.0)
    assert out[2].score == pytest.approx(-1.0)


def test_brute_force_topk_blas_matches_fold(spark):
    """The BLAS mapInPandas variant returns the identical ranked neighbor
    list as the fold-based column-algebra path on the real test corpus
    (scores agree to float tolerance; ranked IDs exactly)."""
    from recon_spark.sources.tpch import load as load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    fold = SIM.brute_force_topk(emb, q, k=10).collect()
    blas = SIM.brute_force_topk_blas(emb, q, k=10).collect()
    assert [(r.query_id, r.neighbor_id, r.rank) for r in fold] == [
        (r.query_id, r.neighbor_id, r.rank) for r in blas
    ]
    for a, b in zip(fold, blas):
        assert b.score == pytest.approx(a.score, rel=1e-12)


def test_brute_force_topk_blas_excludes_self_and_orders(spark):
    corpus = _vecs(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.1]),
            (3, [0.0, 1.0]),
            (4, [-1.0, 0.0]),
        ],
    )
    q = corpus.filter(F.col("vec_id") == 1)
    out = SIM.brute_force_topk_blas(corpus, q, k=3).collect()
    assert [r.neighbor_id for r in out] == [2, 3, 4]
    assert out[0].score == pytest.approx(1.0 / math.sqrt(1.01))


def test_ann_lsh_scores_only_same_bucket(spark):
    dims = (0, 1)
    corpus = _vecs(
        spark,
        [
            (1, [1.0, 1.0]),
            (2, [2.0, 1.0]),    # same bucket "00"
            (3, [-1.0, 1.0]),   # bucket "10" — never scored
        ],
    )
    q = corpus.filter(F.col("vec_id") == 1)
    out = SIM.ann_topk_lsh(corpus, q, k=5, dims=dims, radius=0).collect()
    assert [r.neighbor_id for r in out] == [2]
    assert out[0].bucket == "00"


def test_flip_masks_counts_and_weights():
    masks = SIM.flip_masks(8, 2)
    assert masks[0] == 0
    assert len(masks) == 1 + 8 + 28
    assert all(bin(m).count("1") <= 2 for m in masks)
    assert len(set(masks)) == len(masks)


def test_multiprobe_reaches_adjacent_bucket(spark):
    dims = (0, 1)
    corpus = _vecs(
        spark,
        [
            (1, [1.0, 1.0]),     # bucket 0b00
            (2, [-0.1, 1.0]),    # bucket 0b01 — 1 bit away, nearly parallel
            (3, [-1.0, -1.0]),   # bucket 0b11 — 2 bits away
        ],
    )
    q = corpus.filter(F.col("vec_id") == 1)
    exact = SIM.ann_topk_lsh(corpus, q, k=5, dims=dims, radius=0).collect()
    assert exact == []  # alone in its bucket: exact-bucket LSH finds nothing
    r1 = SIM.ann_topk_lsh_multiprobe(corpus, q, k=5, dims=dims, radius=1).collect()
    assert [r.neighbor_id for r in r1] == [2]
    # the DEFAULT ann_topk_lsh surface is multi-probe radius 2
    r2 = SIM.ann_topk_lsh(corpus, q, k=5, dims=dims).collect()
    assert [r.neighbor_id for r in r2] == [2, 3]


def test_ann_recall_orders_methods(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    rows = {r.method: r for r in SIM.ann_recall(emb, queries, k=10).collect()}
    assert set(rows) == {
        "lsh", "lsh_exact", "ivf", "blas", "pq", "ivfpq", "ivfpq_rerank",
    }
    for r in rows.values():
        assert r.total == 50
        assert 0.0 <= r.recall <= 1.0
        assert r.recall == pytest.approx(r.hits / r.total)
    # the BLAS matmul twin must rank identically to the fold-based exact
    # baseline -> recall exactly 1.0 (the driver-graded parity row)
    assert rows["blas"].recall == 1.0
    # the default LSH surface (multi-probe) exists to beat exact-bucket;
    # IVF(nprobe=2) is the strongest of the three on this corpus. The
    # default-path bar is 0.2 at this tiny sf0.001 corpus (measured 0.26);
    # at the driver's sf0.01 the same path measures 0.42.
    assert rows["lsh"].recall >= rows["lsh_exact"].recall
    assert rows["lsh"].recall >= 0.2
    assert rows["ivf"].recall >= 0.5


def test_kmeans_ivf_beats_id_centroids_on_held_out_queries(spark):
    """The deterministic lowest-id quantizer looks great on the graded
    queries only because those queries (vec_id < 5) ARE centroids
    (vec_id < 8) — each probes its own cell and finds its neighborhood
    trivially. On held-out queries that artifact disappears and the
    KMeans-trained quantizer wins (measured 0.51 vs 0.32 recall@10 at
    sf0.001, deterministic seed), which is why the trained path is the
    production quantizer and lowest-id is the oracle-replayable one."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 110))
    truth = {
        (r.query_id, r.neighbor_id)
        for r in SIM.brute_force_topk(emb, q, k=10).collect()
    }
    base = {
        (r.query_id, r.neighbor_id) for r in SIM.ivf_topk(emb, q, k=10).collect()
    }
    cents = SIM.ivf_centroids_kmeans(emb)
    assert cents.columns == ["cell_id", "centroid"]
    trained = {
        (r.query_id, r.neighbor_id)
        for r in SIM.ivf_topk(emb, q, k=10, centroids=cents).collect()
    }
    base_recall = len(base & truth) / len(truth)
    trained_recall = len(trained & truth) / len(truth)
    assert trained_recall >= base_recall
    assert trained_recall >= 0.4


def test_cosine_near_dup_pairs(spark):
    corpus = _vecs(
        spark,
        [(1, [1.0, 2.0]), (2, [2.0, 4.0]), (3, [5.0, -1.0])],
    )
    out = SIM.cosine_near_dup_pairs(corpus, threshold=0.95, dims=(0, 1)).collect()
    assert [(r.id_a, r.id_b) for r in out] == [(1, 2)]
    assert out[0].score == pytest.approx(1.0)


# --- multimodal --------------------------------------------------------------


def test_attach_binary_shape(spark):
    docs = spark.createDataFrame([(7, "abc")], "doc_id long, text string")
    row = multimodal.attach_binary(docs).first()
    assert row.id == 7
    assert bytes(row.payload) == b"abc"
    assert row.meta.mime == "text/plain" and row.meta.n_bytes == 3


def test_fake_features_deterministic():
    # 8 one-byte stripes -> the byte values themselves
    assert multimodal.fake_features(b"abcdefgh") == [float(b) for b in b"abcdefgh"]
    assert multimodal.fake_features(b"") == [0.0] * multimodal.FEATURE_DIM


def test_extract_features_via_map_in_pandas(spark):
    docs = spark.createDataFrame(
        [(1, "abcdefgh"), (2, None)], "doc_id long, text string"
    )
    out = {
        r.id: r
        for r in multimodal.extract_features(
            multimodal.attach_binary(docs.filter(F.col("text").isNotNull()))
        ).collect()
    }
    assert out[1].n_bytes == 8
    assert out[1].feature == [float(b) for b in b"abcdefgh"]


def test_sample_frames_geometry(spark):
    # 200-byte payload -> 4 frames of 64; picks {0, 1, 3}
    text = "x" * 200
    docs = spark.createDataFrame([(1, text), (2, "short")], "doc_id long, text string")
    rows = sorted(
        (r.id, r.frame_idx, r.total_frames, len(bytes(r.frame)))
        for r in multimodal.sample_frames(multimodal.attach_binary(docs)).collect()
    )
    assert rows == [
        (1, 0, 4, 64),
        (1, 1, 4, 64),  # (total-1)//2 = 1
        (1, 3, 4, 8),   # last frame is the 200-192 tail
        (2, 0, 1, 5),   # short payload: single frame, de-duplicated picks
    ]


def test_resize_feature_pools_pairs(spark):
    df = spark.createDataFrame(
        [(1, [float(v) for v in (0, 2, 4, 6, 8, 10, 12, 14)])],
        "id long, feature array<float>",
    )
    out = df.select(
        multimodal.resize_feature(F.col("feature")).alias("r")
    ).collect()[0]
    assert out.r == [1.0, 5.0, 9.0, 13.0]


def test_decoders_are_stubs():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"")
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"")


# --- streaming ---------------------------------------------------------------


def test_streaming_trend_matches_batch(spark):
    """availableNow streaming run over sf0.001 events == the identical
    batch plan over the same source (exact rows, not just counts)."""
    from recon_spark.sources.tpch import load_events
    from recon_spark.streaming import trends

    sf_dir = "/root/testdata/sf0.001"
    stream_rows = sorted(
        (str(r.window_start), r.event_type, r.n, r.value_total_micros)
        for r in trends.run_to_memory(spark, sf_dir, name="t_stream_parity").collect()
    )
    batch_rows = sorted(
        (str(r.window_start), r.event_type, r.n, r.value_total_micros)
        for r in trends.windowed_event_trend(load_events(spark, sf_dir)).collect()
    )
    assert stream_rows == batch_rows and len(stream_rows) > 0


def test_bpe_token_count(spark):
    from pyspark.sql import functions as F

    from recon_spark.operators.text import bpe_token_count

    df = spark.createDataFrame(
        [
            ("hello world",),        # 2 short words -> 2
            ("extraordinarily",),    # 15 letters -> 8+7 -> 2 chunks
            ("12345",),              # 5 digits -> 3+2 -> 2 chunks
            ("a-b",),                # a, -, b -> 3
            ("",),                   # empty -> 0
        ],
        ["text"],
    )
    got = [r.n for r in df.select(bpe_token_count("text").alias("n")).collect()]
    assert got == [2, 2, 2, 3, 0]


def test_ivf_topk_recall_vs_bruteforce(spark):
    from pyspark.sql import functions as F

    from recon_spark.operators import similarity
    from recon_spark.sources.tpch import load as load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, queries, k=10).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_topk(emb, queries, k=10).collect()
    }
    assert len(approx) == 50  # 5 queries x top-10, cells are well-populated
    # coarse quantization with nprobe=2 of 8 cells should keep useful recall
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, recall


def test_chunk_documents_windows_and_overlap(spark):
    from recon_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(10))),  # 10 toks: 2 chunks
            (2, "a b c"),                                # short: 1 chunk
            (3, "   "),                                  # empty: no rows
        ],
        "doc_id long, text string",
    )
    out = T.chunk_documents(docs, chunk_tokens=6, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc
    # the start-8 window would hold only already-covered overlap tokens
    # and is not emitted; 0-6 and 4-10 cover all ten tokens
    assert [(r.tok_start, r.tok_end, r.n_tokens) for r in sorted(by_doc[1], key=lambda r: r.chunk_id)] == [
        (0, 6, 6), (4, 10, 6)
    ]
    c0, c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    # consecutive full chunks share exactly `overlap` tokens
    assert c0.chunk_text.split()[-2:] == c1.chunk_text.split()[:2]
    assert by_doc[2][0].chunk_text == "a b c"


def test_chunk_documents_covers_every_token(spark):
    """Reconstruction invariant on real corpus data: stitching chunks
    back (dropping each chunk's leading overlap) reproduces the exact
    token stream of every document."""
    from pyspark.sql import functions as F

    from recon_spark.operators import text as T

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    chunks = T.chunk_documents(docs, chunk_tokens=32, overlap=8)
    stitched = (
        chunks.withColumn(
            "piece",
            F.when(F.col("chunk_id") == 0, F.col("chunk_text")).otherwise(
                F.array_join(F.slice(F.split(F.col("chunk_text"), " "), 9, 32), " ")
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_id", "piece"))
                    ),
                    lambda s: s["piece"],
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    orig = docs.select(
        "doc_id", F.array_join(T.tokens("text"), " ").alias("orig")
    ).filter(F.col("orig") != "")
    joined = orig.join(stitched, "doc_id")
    bad = joined.filter(F.col("orig") != F.col("rebuilt")).count()
    assert bad == 0 and joined.count() == orig.count()
