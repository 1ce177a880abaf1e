"""Cleaner tests: dedup determinism (D1-D3), F1 null handling, F8 key
drops (reference: src/cleaning/*; ADVICE round 1 items)."""

from __future__ import annotations

from recon_spark.operators import cleaning


def _matrix_raw(spark, rows):
    cols = [
        "Matrix Account", "Client Account", "Participant SSN", "Participant Name",
        "Participant State", "Gross Amount", "Transaction Date", "Transaction Type",
        "Tax Code", "Tax Code 2", "Tax Form", "Federal Taxing Method",
        "Distribution Type", "Transaction Id", "Fed Taxable Amount",
        "Roth Initial Contribution Year", "src_order", "src_seq",
    ]
    base = {
        "Matrix Account": "07C00001",
        "Client Account": "300004PLAT",
        "Participant SSN": "123456780",
        "Participant Name": "A B",
        "Participant State": "CA",
        "Gross Amount": 100.0,
        "Transaction Date": "2025-01-05",
        "Transaction Type": "ACH",
        "Tax Code": "7",
        "Tax Code 2": None,
        "Tax Form": "1099-R",
        "Federal Taxing Method": "Taxable",
        "Distribution Type": "Cash",
        "Transaction Id": "100",
        "Fed Taxable Amount": 50.0,
        "Roth Initial Contribution Year": None,
        "src_order": 0,
        "src_seq": 0,
    }
    data = []
    for over in rows:
        r = dict(base)
        r.update(over)
        data.append(tuple(r[c] for c in cols))
    schema = (
        "`Matrix Account` string, `Client Account` string, `Participant SSN` string, "
        "`Participant Name` string, `Participant State` string, `Gross Amount` double, "
        "`Transaction Date` string, `Transaction Type` string, `Tax Code` string, "
        "`Tax Code 2` string, `Tax Form` string, `Federal Taxing Method` string, "
        "`Distribution Type` string, `Transaction Id` string, `Fed Taxable Amount` double, "
        "`Roth Initial Contribution Year` long, src_order long, src_seq long"
    )
    return spark.createDataFrame(data, schema)


def test_clean_matrix_null_account_and_method_kept(spark):
    # ADVICE r1: NULL matrix_account / txn_method must NOT be dropped by the
    # NOT-isin exclusion (three-valued logic trap)
    raw = _matrix_raw(
        spark,
        [
            {"Matrix Account": None, "Transaction Id": "1", "Gross Amount": 101.0},
            {"Transaction Type": None, "Transaction Id": "2", "Gross Amount": 102.0},
            {"Matrix Account": "07B00442", "Transaction Id": "3", "Gross Amount": 103.0},  # excluded
            {"Transaction Type": "Account Transfer", "Transaction Id": "4", "Gross Amount": 104.0},  # excluded
            # kept: double space inside doesn't match the space-collapsed list entry
            {"Transaction Type": " ACCOUNT  transfer", "Transaction Id": "5", "Gross Amount": 105.0},
        ],
    )
    out = cleaning.clean_matrix(raw)
    ids = {r["transaction_id"] for r in out.select("transaction_id").collect()}
    assert ids == {"1", "2", "5"}


def test_clean_matrix_dedup_deterministic_tiebreak(spark):
    # same match keys, same src_order, different src_seq -> lowest seq wins
    raw = _matrix_raw(
        spark,
        [
            {"Transaction Id": "9", "src_seq": 7},
            {"Transaction Id": "8", "src_seq": 3},
        ],
    )
    out = cleaning.clean_matrix(raw).collect()
    assert len(out) == 1
    assert out[0]["transaction_id"] == "8"


def test_clean_matrix_drops_null_keys(spark):
    raw = _matrix_raw(
        spark,
        [
            {"Participant SSN": None, "Transaction Id": "1"},
            {"Transaction Date": "not-a-date", "Transaction Id": "2"},
            {"Transaction Id": "3"},
        ],
    )
    out = cleaning.clean_matrix(raw)
    ids = {r["transaction_id"] for r in out.select("transaction_id").collect()}
    assert ids == {"3"}


def _demo_raw(spark, rows):
    base = {
        "PLANID": "300004PLAT",
        "SSNUM": "123456780",
        "FIRSTNAM": "A",
        "LASTNAM": "B",
        "BIRTHDATE": "1970-01-01",
        "TERM_DATE": None,
        "src_order": 0,
        "src_seq": 0,
    }
    cols = list(base.keys())
    data = [tuple({**base, **o}[c] for c in cols) for o in rows]
    return spark.createDataFrame(
        data,
        "PLANID string, SSNUM string, FIRSTNAM string, LASTNAM string, "
        "BIRTHDATE string, TERM_DATE string, src_order long, src_seq long",
    )


def test_clean_demo_keep_last(spark):
    raw = _demo_raw(
        spark,
        [
            {"FIRSTNAM": "First", "src_order": 0, "src_seq": 1},
            {"FIRSTNAM": "Second", "src_order": 1, "src_seq": 1},
        ],
    )
    out = cleaning.clean_relius_demo(raw).collect()
    assert len(out) == 1
    assert out[0]["first_name"] == "Second"


def _basis_raw(spark, rows):
    base = {
        "PLANID": "300005R",
        "SSNUM": "123456780",
        "FIRSTNAM": "A",
        "LASTNAM": "B",
        "FIRSTTAXYEARROTH": "2010",
        "Total": 100.0,
        "src_order": 0,
        "src_seq": 0,
    }
    cols = list(base.keys())
    data = [tuple({**base, **o}[c] for c in cols) for o in rows]
    return spark.createDataFrame(
        data,
        "PLANID string, SSNUM string, FIRSTNAM string, LASTNAM string, "
        "FIRSTTAXYEARROTH string, Total double, src_order long, src_seq long",
    )


def test_clean_basis_completeness_ranked_dedup(spark):
    raw = _basis_raw(
        spark,
        [
            {"FIRSTTAXYEARROTH": None, "Total": None, "src_order": 0, "src_seq": 0},
            {"FIRSTTAXYEARROTH": "2012", "Total": None, "src_order": 1, "src_seq": 1},
            {"FIRSTTAXYEARROTH": "2011", "Total": 50.0, "src_order": 2, "src_seq": 2},
        ],
    )
    out = cleaning.clean_roth_basis(raw).collect()
    assert len(out) == 1
    assert out[0]["first_roth_tax_year"] == 2011
    assert out[0]["roth_basis_amt"] == 50.0


def test_clean_relius_validation_flags(spark):
    raw = spark.createDataFrame(
        [
            ("300004PLAT", "123456780", "A", "B", "CA", 100.0, "2025-01-01", "2025", "7", "Rollover", 0, 0),
            ("300004PLAT", "999999999", "A", "B", "CA", -5.0, "2099-01-01", "2099", "ZZ", "Cash", 0, 1),
        ],
        "PLANID_1 string, SSNUM_1 string, FIRSTNAM string, LASTNAM string, "
        "STATEADDR string, GROSSDISTRAMT double, EXPORTEDDATE string, TAXYR string, "
        "DISTR1CD string, DISTRNAM string, src_order long, src_seq long",
    )
    out = {r["ssn"]: r for r in cleaning.clean_relius(raw).collect()}
    good, bad = out["123456780"], out["999999999"]
    assert good["ssn_valid"] and good["amount_valid"] and good["date_valid"] and good["code_1099r_valid"]
    assert good["validation_issues"] == []
    assert not bad["ssn_valid"] and not bad["amount_valid"] and not bad["date_valid"]
    assert bad["validation_issues"] == [
        "ssn_invalid", "amount_invalid", "date_invalid", "code_1099r_invalid",
    ]


def test_clean_relius_date_filter(spark):
    raw = spark.createDataFrame(
        [
            ("300004PLAT", "123456780", "A", "B", "CA", 100.0, "2025-01-01", "2025", "7", "Rollover", 0, 0),
            ("300004PLAT", "123456781", "A", "B", "CA", 100.0, "2025-06-01", "2025", "7", "Rollover", 0, 1),
        ],
        "PLANID_1 string, SSNUM_1 string, FIRSTNAM string, LASTNAM string, "
        "STATEADDR string, GROSSDISTRAMT double, EXPORTEDDATE string, TAXYR string, "
        "DISTR1CD string, DISTRNAM string, src_order long, src_seq long",
    )
    out = cleaning.clean_relius(raw, date_start="2025-05-01", date_end="2025-12-31")
    assert [r["ssn"] for r in out.collect()] == ["123456781"]
