"""Deterministic split / stratified sample / tf-idf / repetition ops."""

import pytest
from pyspark.sql import functions as F

from recon_spark.operators import sampling
from recon_spark.operators import text as T


def test_split_is_deterministic_and_growth_stable(spark):
    docs = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    s1 = {r.doc_id: r.split for r in sampling.with_split(docs).collect()}
    s2 = {r.doc_id: r.split for r in sampling.with_split(docs).collect()}
    assert s1 == s2
    # adding docs never relabels existing ones
    grown = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    s3 = {r.doc_id: r.split for r in sampling.with_split(grown).collect()}
    assert all(s3[k] == v for k, v in s1.items())
    # roughly 90/5/5
    from collections import Counter

    c = Counter(s1.values())
    assert c["train"] > 400 and c["val"] > 5 and c["test"] > 5


def test_stratified_sample_exact_quota(spark):
    rows = [(i, "a" if i < 70 else "b") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.stratified_sample(docs, "lang", 1, 10).collect()
    from collections import Counter

    c = Counter(r.lang for r in out)
    assert c == {"a": 7, "b": 3}  # ceil(70/10), ceil(30/10)
    # deterministic choice
    again = sampling.stratified_sample(docs, "lang", 1, 10).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in again)


def test_stratified_sample_matches_window_spelling(spark):
    """The two-phase (stratum, bucket) rank must be value-identical to
    the obvious per-stratum-window spelling — for several quota
    fractions including keep-everything, and with strata of very
    different sizes (the dominant-stratum case the distribution exists
    for)."""
    from pyspark.sql import Window

    rows = [
        (i, "en" if i % 10 < 7 else ("fr" if i % 10 < 9 else "de"))
        for i in range(500)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    b = sampling.hash_bucket("doc_id", "sample:v1")
    for num, den in ((1, 10), (3, 7), (1, 1)):
        got = sorted(
            (r.doc_id, r.lang)
            for r in sampling.stratified_sample(docs, "lang", num, den).collect()
        )
        w_cnt = Window.partitionBy("lang")
        w_rank = Window.partitionBy("lang").orderBy(b.asc(), F.col("doc_id").asc())
        want = sorted(
            (r.doc_id, r.lang)
            for r in docs.withColumn("__cnt", F.count(F.lit(1)).over(w_cnt))
            .withColumn("__rn", F.row_number().over(w_rank))
            .filter(F.col("__rn") <= F.expr(f"({num} * __cnt + {den} - 1) DIV {den}"))
            .collect()
        )
        assert got == want, (num, den)
    spark.catalog.clearCache()


def test_stratified_sample_single_stratum_spreads_buckets(spark):
    """One dominant stratum (the 40%-English-at-100TB shape) must not
    rank in one task: the quota is still exact, the rows genuinely
    occupy many coarse hash buckets, and the row-level window is
    partitioned by (stratum, bucket) — never the bare stratum."""
    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    out = sampling.stratified_sample(docs, "lang", 1, 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    row_windows = [
        l for l in plan.splitlines() if "Window" in l and "__hb" in l
    ]
    assert row_windows, "row-level window missing from plan"
    for l in row_windows:
        assert "SinglePartition" not in l
        assert "__bk" in l  # partitioned by (stratum, bucket)
    assert out.count() == (2000 + 2) // 3
    nbk = (
        docs.select(
            F.shiftright(
                sampling.hash_bucket("doc_id", "sample:v1"), sampling._STRAT_SHIFT
            ).alias("bk")
        )
        .distinct()
        .count()
    )
    assert nbk > 100  # 2000 uniform hashes really spread over ~256 buckets
    spark.catalog.clearCache()


def test_contamination_check_flags_shared_shingles(spark):
    """A test-split doc that shares a 5-shingle with a train doc is
    flagged; unrelated test docs are not."""
    # find ids landing in train/test under the real hash split
    probe = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    labels = {r.doc_id: r.split for r in sampling.with_split(probe).collect()}
    train_id = next(i for i, s in labels.items() if s == "train")
    test_ids = [i for i, s in labels.items() if s == "test"]
    assert len(test_ids) >= 2
    leak = "alpha beta gamma delta epsilon zeta"
    rows = [
        (train_id, "train doc containing " + leak),
        (test_ids[0], leak + " copied into a test doc"),
        (test_ids[1], "completely different held out words entirely unrelated"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in sampling.contamination_check(docs).collect()}
    assert test_ids[0] in out and out[test_ids[0]].n_shared >= 1
    assert test_ids[1] not in out
    # r9 fraction verdict: the leaked doc (11 tokens -> 7 5-shingles)
    # shares 2 distinct shingles -> 2/7 = 0.2857 >= 0.2
    r = out[test_ids[0]]
    assert r.n_distinct_shared == 2 and r.n_shingles == 7
    assert r.overlap_micros == 285_714 and r.contaminated is True


def test_contamination_fraction_separates_incidental_overlap(spark):
    """One shared shingle inside a long unrelated doc stays below the
    fraction threshold -> flagged as overlap but NOT contaminated."""
    probe = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    labels = {r.doc_id: r.split for r in sampling.with_split(probe).collect()}
    train_id = next(i for i, s in labels.items() if s == "train")
    test_id = next(i for i, s in labels.items() if s == "test")
    leak = "alpha beta gamma delta epsilon"  # exactly one 5-shingle
    filler = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(train_id, "train doc containing " + leak),
         (test_id, leak + " " + filler)],
        "doc_id long, text string",
    )
    r = {x.id: x for x in sampling.contamination_check(docs).collect()}[test_id]
    assert r.n_distinct_shared == 1 and r.n_shingles == 41
    assert r.contaminated is False


def test_tfidf_ranks_distinctive_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "common zebra zebra"),
            (2, "common yak yak"),
            (3, "common common common"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.rank): r.term
        for r in T.tfidf_top_terms(docs, k=2).collect()
    }
    # doc-unique terms (idf ln(2)+1) outrank the corpus-wide one (idf 1)
    assert out[(1, 1)] == "zebra" and out[(1, 2)] == "common"
    assert out[(2, 1)] == "yak"
    assert out[(3, 1)] == "common"


def test_repetition_stats(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "")],
        "doc_id long, text string",
    ).withColumn("__toks", T.tokens("text"))
    ttr, top = T.repetition_stats(F.col("__toks"))
    rows = {r.doc_id: r for r in docs.select("doc_id", ttr.alias("t"), top.alias("m")).collect()}
    assert rows[1].t == pytest.approx(0.25) and rows[1].m == pytest.approx(1.0)
    assert rows[2].t == pytest.approx(1.0) and rows[2].m == pytest.approx(0.25)
    assert rows[3].t is None and rows[3].m is None


def test_resample_to_mixture_hits_target_shares(spark):
    """Deterministic mixture enactment: achieved token shares land near
    the target weights (doc-level Bernoulli variance only), upsampling
    emits repeated copies, omitted strata drop, and the output is
    byte-identical across runs."""
    from recon_spark.operators.sampling import resample_to_mixture

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", "source", "text"
    )
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    assert len(langs) >= 3
    keep = sorted(langs)[:2]
    targets = spark.createDataFrame(
        [(keep[0], 0.75), (keep[1], 0.25)], "lang string, weight double"
    )
    out = resample_to_mixture(docs, targets, stratum_cols=("lang",))

    shares = {
        r.lang: r.toks
        for r in out.groupBy("lang").agg(F.sum("n_tokens").alias("toks")).collect()
    }
    assert set(shares) == set(keep)  # omitted strata dropped entirely
    total = sum(shares.values())
    assert abs(shares[keep[0]] / total - 0.75) < 0.05
    assert abs(shares[keep[1]] / total - 0.25) < 0.05
    # constant-volume default budget: output tokens ~ input tokens
    in_toks = sum(
        r.toks
        for r in docs.withColumn("n", F.size(F.split(F.lower("text"), "[^a-zA-Z0-9]+")))
        .groupBy().agg(F.sum("n").alias("toks")).collect()
    )
    assert abs(total - in_toks) / in_toks < 0.1
    # upsampling really repeats documents (some doc has copy_idx >= 2)
    assert out.filter(F.col("copy_idx") >= 2).count() > 0
    # determinism
    again = resample_to_mixture(docs, targets, stratum_cols=("lang",))
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


def test_temperature_mixture_matches_python_twin(spark):
    """α-temperature sampling weights (operators/sampling
    temperature_mixture, r13): micros match an independent Python twin
    computed with the SAME sorted-left-fold normalizer, zero-token
    strata get NULLs, and the weights normalize to ~1."""
    import random

    from pyspark.sql import functions as F

    rnd = random.Random(0xA1FA)
    for _trial in range(3):
        rows = [
            (f"l{i}", f"s{i%3}", rnd.choice([0, rnd.randrange(1, 10**9)]))
            for i in range(rnd.randrange(2, 14))
        ]
        per = spark.createDataFrame(rows, "lang string, source string, n_tokens long")
        got = {
            (r.lang, r.source): (r.w_alpha_micros, r.upsample_micros)
            for r in sampling.temperature_mixture(per).collect()
        }
        a = sampling.TEMPERATURE_ALPHA
        z = 0.0
        for x in sorted(float(n) for _l, _s, n in rows):
            z += x**a
        t = sum(n for _l, _s, n in rows)
        for lang, src, n in rows:
            if n == 0:
                assert got[(lang, src)] == (None, None)
                continue
            w = n**a / z
            assert got[(lang, src)] == (
                round(w * 1_000_000),
                round(w / (n / t) * 1_000_000),
            ), (lang, src, n)
        live = [v[0] for v in got.values() if v[0] is not None]
        assert abs(sum(live) - 1_000_000) <= len(live)  # rounding slack


def test_temperature_mixture_upsamples_low_resource_strata(spark):
    """The property the recipe exists for (mT5 §3.1): with α < 1 the
    small stratum's sampling weight exceeds its natural share and the
    big stratum's falls below it."""
    per = spark.createDataFrame(
        [("en", "web", 99_000_000), ("yo", "web", 1_000_000)],
        "lang string, source string, n_tokens long",
    )
    got = {r.lang: r for r in sampling.temperature_mixture(per).collect()}
    assert got["yo"].upsample_micros > 1_000_000  # drawn above natural share
    assert got["en"].upsample_micros < 1_000_000
    assert got["yo"].w_alpha_micros + got["en"].w_alpha_micros in (999999, 1000000, 1000001)


def _unimax_greedy(rows, n_epochs, budget=None):
    """Independent Python twin of unimax_mixture: the PAPER's greedy
    loop (ascending by size, equal share of the remaining budget unless
    the epoch cap binds) — deliberately NOT the closed-form prefix test
    the operator uses, so the two agree only if the closed form is
    right."""
    live = sorted(
        [(l, s, n) for l, s, n in rows if n and n > 0],
        key=lambda t: (t[2], t[0], t[1]),
    )
    out = {(l, s): (None, None, None) for l, s, n in rows}
    if not live:
        return out
    B = budget if budget is not None else sum(n for _l, _s, n in live)
    b_rem, m_rem = float(B), len(live)
    for l, s, n in live:
        share = b_rem / m_rem
        if n_epochs * n <= share:
            b = float(n_epochs * n)
            capped = 1
        else:
            b = share
            capped = 0
        out[(l, s)] = (
            round(b / float(B) * 1_000_000.0),
            round(b / float(n) * 1_000_000.0),
            capped,
        )
        b_rem -= b
        m_rem -= 1
    return out


def test_unimax_matches_python_greedy(spark):
    """UniMax allocation (operators/sampling unimax_mixture, r14):
    micros + cap verdicts match the paper's greedy loop on random
    frames, including ties, zero-token strata (NULLs), single stratum
    and an every-stratum-capped oversized budget."""
    import random

    rnd = random.Random(0x114A)
    trials = []
    for _ in range(4):
        rows = [
            (f"l{i}", f"s{i % 3}", rnd.choice([0, rnd.randrange(1, 10**7), 5_000]))
            for i in range(rnd.randrange(2, 14))
        ]
        trials.append((rows, 2, None))
    trials.append(([("en", "web", 100)], 2, None))           # single stratum
    trials.append(([("a", "x", 10), ("b", "x", 10), ("c", "x", 10)], 2, None))  # all ties
    trials.append(([("a", "x", 10), ("b", "x", 90)], 3, 1000))  # all capped
    trials.append(([("a", "x", 0), ("b", "x", 0)], 2, None))    # all zero
    for rows, n_epochs, budget in trials:
        per = spark.createDataFrame(rows, "lang string, source string, n_tokens long")
        got = {
            (r.lang, r.source): (
                r.unimax_budget_micros, r.unimax_epochs_micros, r.unimax_capped
            )
            for r in sampling.unimax_mixture(per, n_epochs=n_epochs, budget=budget).collect()
        }
        want = _unimax_greedy(rows, n_epochs, budget)
        assert got == want, (rows, n_epochs, budget)


def test_unimax_allocation_properties(spark):
    """The invariants the recipe exists for (Chung 2023): capped strata
    get exactly n_epochs epochs; uncapped strata all get the SAME
    budget (uniformity); the allocation exhausts the budget; the capped
    set is an ascending-size prefix."""
    per = spark.createDataFrame(
        [("yo", "web", 1_000), ("sw", "web", 5_000), ("de", "web", 30_000_000),
         ("fr", "web", 40_000_000), ("en", "web", 90_000_000)],
        "lang string, source string, n_tokens long",
    )
    rows = {r.lang: r for r in sampling.unimax_mixture(per, n_epochs=2).collect()}
    capped = {l for l, r in rows.items() if r.unimax_capped == 1}
    assert capped == {"yo", "sw"}  # the small prefix, not the giants
    for l in capped:
        assert rows[l].unimax_epochs_micros == 2_000_000
    unc = {rows[l].unimax_budget_micros for l in rows if l not in capped}
    assert len(unc) == 1  # uniform share across every uncapped stratum
    total = sum(r.unimax_budget_micros for r in rows.values())
    assert abs(total - 1_000_000) <= len(rows)  # rounding slack
    # epoch cap honoured everywhere: nobody repeats beyond n_epochs
    assert all(r.unimax_epochs_micros <= 2_000_000 for r in rows.values())


def test_unimax_nonvacuous_on_fixture(spark):
    """The graded fold must certify both branches: on the fixture corpus
    at the graded parameters (N=2, budget=corpus) there are capped AND
    uncapped strata."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    per = docs.groupBy("lang", "source").agg(
        F.sum(F.size(T.tokens("text"))).cast("long").alias("n_tokens")
    )
    out = sampling.unimax_mixture(per).collect()
    flags = {r.unimax_capped for r in out if r.unimax_capped is not None}
    assert flags == {0, 1}
