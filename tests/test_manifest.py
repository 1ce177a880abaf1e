"""Run manifest (plans/manifest.py): Observation metrics ride the sink
action — values match independently-computed counts, uncollected branches
don't block, and the instrumented run launches no extra counting jobs."""

from pyspark.sql import functions as F

from recon_spark.plans import manifest


def test_stage_metrics_match_recomputation(spark):
    df = spark.createDataFrame(
        [(1, True), (2, False), (3, False), (4, True)], "id long, ok boolean"
    )
    m = manifest.RunManifest("t1")
    out = m.stage(df, "input", n_bad=F.sum((~F.col("ok")).cast("long")))
    out = m.stage(out.filter("ok"), "kept")
    out.write.format("noop").mode("overwrite").save()

    rep = m.report()
    assert rep["run_id"] == "t1"
    assert rep["stages"]["input"] == {"collected": True, "n_rows": 4, "n_bad": 2}
    assert rep["stages"]["kept"] == {"collected": True, "n_rows": 2}


def test_unexecuted_stage_reports_uncollected_without_blocking(spark):
    df = spark.range(5)
    m = manifest.RunManifest("t2")
    executed = m.stage(df, "hot")
    m.stage(df.filter("id > 2"), "cold")  # branch never acted on
    executed.write.format("noop").mode("overwrite").save()

    rep = m.report()
    assert rep["stages"]["hot"]["n_rows"] == 5
    assert rep["stages"]["cold"] == {"collected": False}


def test_duplicate_stage_name_rejected(spark):
    m = manifest.RunManifest("t3")
    m.stage(spark.range(1), "s")
    try:
        m.stage(spark.range(1), "s")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_instrumented_engine_a_manifest(spark):
    sf_dir = "/root/testdata/sf0.001"
    out, m = manifest.instrumented_engine_a(spark, sf_dir)
    out.write.format("noop").mode("overwrite").save()
    rep = m.report()
    stages = rep["stages"]

    assert all(s["collected"] for s in stages.values())
    # the manifest's numbers equal a recomputation of the same frames
    from recon_spark.engines import match_planid
    from recon_spark.operators import cleaning
    from recon_spark.sources import fixtures

    relius = cleaning.clean_relius(fixtures.relius_raw(spark, sf_dir))
    matrix = cleaning.clean_matrix(fixtures.matrix_raw(spark, sf_dir))
    assert stages["relius_clean"]["n_rows"] == relius.count()
    assert stages["matrix_clean"]["n_rows"] == matrix.count()
    matched = match_planid.reconcile_relius_matrix(relius, matrix)
    expect_nc = matched.filter(
        F.col("match_status") == "match_needs_correction"
    ).count()
    assert stages["engine_a"]["n_needs_correction"] == expect_nc
    assert stages["engine_a"]["n_rows"] == matched.count()
    assert (
        stages["corrections"]["n_update_1099"]
        + stages["corrections"]["n_investigate"]
        == stages["corrections"]["n_rows"]
    )


def test_instrumentation_adds_no_jobs(spark):
    """The audited run costs the same as the bare run: job count with a
    fully-instrumented pipeline equals the bare pipeline's."""
    sc = spark.sparkContext
    sf_dir = "/root/testdata/sf0.001"

    from recon_spark.plans import corrections as corr
    from recon_spark.engines import match_planid
    from recon_spark.operators import cleaning
    from recon_spark.sources import fixtures

    def bare():
        relius = cleaning.clean_relius(fixtures.relius_raw(spark, sf_dir))
        matrix = cleaning.clean_matrix(fixtures.matrix_raw(spark, sf_dir))
        return corr.build_correction_df(
            match_planid.reconcile_relius_matrix(relius, matrix), sort=False
        )

    # warm both plans once (fixture parquet listing etc.)
    bare().write.format("noop").mode("overwrite").save()

    before = len(sc.statusTracker().getJobIdsForGroup(None))
    bare().write.format("noop").mode("overwrite").save()
    bare_jobs = len(sc.statusTracker().getJobIdsForGroup(None)) - before

    out, m = manifest.instrumented_engine_a(spark, sf_dir)
    before = len(sc.statusTracker().getJobIdsForGroup(None))
    out.write.format("noop").mode("overwrite").save()
    observed_jobs = len(sc.statusTracker().getJobIdsForGroup(None)) - before
    m.report()

    # AQE makes absolute job counts run-dependent; the invariant that
    # matters is that instrumentation launches no ADDITIONAL jobs (a
    # count() per counter would show up here as observed > bare)
    assert observed_jobs <= bare_jobs
