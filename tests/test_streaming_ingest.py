"""foreachBatch streaming ingestion equals the batch cleaner (availableNow)."""

from recon_spark.operators import cleaning
from recon_spark.sources import fixtures
from recon_spark.streaming import ingest

SF = "/root/testdata/sf0.001"


def test_stream_clean_matches_batch_cleaner(spark, tmp_path):
    src = str(tmp_path / "landing")
    dst = str(tmp_path / "curated")
    fixtures.matrix_raw(spark, SF).write.parquet(src)

    q = ingest.stream_clean(spark, src, dst, str(tmp_path / "ckpt"))
    q.awaitTermination()

    got = spark.read.parquet(dst)
    want = cleaning.clean_matrix(spark.read.parquet(src))
    assert got.count() == want.count()
    key = ["plan_id", "ssn", "gross_amt", "txn_date"]
    got_keys = {tuple(r) for r in got.select(*key).collect()}
    want_keys = {tuple(r) for r in want.select(*key).collect()}
    assert got_keys == want_keys
