"""Resume-from-lineage semantics: a second run must skip completed
buckets (north rule: killed job resumes without reprocessing)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tackle4losscontentextraction_spark.operators import extraction
from tackle4losscontentextraction_spark.sources import lineage, synth


@pytest.fixture()
def tmpdirs():
    d = tempfile.mkdtemp(prefix="t4l_lineage_")
    yield f"{d}/out", f"{d}/lineage"
    shutil.rmtree(d, ignore_errors=True)


def test_resume_skips_done_buckets(spark, tmpdirs):
    out_dir, lin_dir = tmpdirs
    docs = synth.synth_docs(spark, 200, partitions=4)

    r1 = lineage.run_with_resume(
        spark, docs, extraction.extract, out_dir, lin_dir, n_buckets=4
    )
    assert sorted(r1["processed"]) == [0, 1, 2, 3]
    assert r1["rows"] == 200

    r2 = lineage.run_with_resume(
        spark, docs, extraction.extract, out_dir, lin_dir, n_buckets=4
    )
    assert r2["processed"] == []
    assert sorted(r2["skipped"]) == [0, 1, 2, 3]

    total = spark.read.parquet(out_dir).count()
    assert total == 200


def test_partial_failure_resume(spark, tmpdirs):
    """Simulate a kill after 2 buckets: only the remaining 2 run."""
    out_dir, lin_dir = tmpdirs
    docs = synth.synth_docs(spark, 120, partitions=4)
    bucketed = lineage.with_bucket(docs, "doc_id", 4)

    # manually 'complete' buckets 0 and 1 (as a killed job would have)
    for b in (0, 1):
        part = extraction.extract(bucketed.where(F.col("bucket") == b))
        part.write.mode("overwrite").parquet(f"{out_dir}/bucket={b}")
        n = spark.read.parquet(f"{out_dir}/bucket={b}").count()
        spark.createDataFrame([(b, n, "done")], "bucket int, n_rows bigint, status string") \
            .write.mode("append").parquet(lin_dir)

    r = lineage.run_with_resume(
        spark, docs, extraction.extract, out_dir, lin_dir, n_buckets=4
    )
    assert sorted(r["processed"]) == [2, 3]
    assert spark.read.parquet(out_dir).count() == 120

    # every doc exactly once (no reprocessing duplicates)
    ids = spark.read.parquet(out_dir).select("doc_id")
    assert ids.distinct().count() == 120
