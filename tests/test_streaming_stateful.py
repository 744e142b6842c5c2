"""applyInPandasWithState sessionization: sessions must stitch across
micro-batches (the property stateless processing cannot provide)."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime, timedelta

import pytest

from tackle4losscontentextraction_spark.streaming import stateful

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _mk(ts_offsets_min, user=1):
    return [(user, T0 + timedelta(minutes=m)) for m in ts_offsets_min]


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="t4l_state_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_sessions_stitch_across_batches(spark, dirs):
    schema = "user_id bigint, ts timestamp"
    # batch 1: two events 5 min apart (open session)
    spark.createDataFrame(_mk([0, 5]), schema).coalesce(1).write.parquet(f"{dirs}/in/b1")
    # batch 2: one event 10 min later (same session: gap 10 < 30) then
    # one 90 min later (gap closes the first session, starts a new one)
    spark.createDataFrame(_mk([15, 105]), schema).coalesce(1).write.parquet(f"{dirs}/in/b2")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{dirs}/in/*")
    )
    out = stateful.sessionize_stream(stream)
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{dirs}/out")
        .option("checkpointLocation", f"{dirs}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.read.parquet(f"{dirs}/out").collect()
    gap_closed = [r for r in rows if r.closed_by == "gap"]
    assert len(gap_closed) == 1
    s = gap_closed[0]
    # the completed session spans BOTH micro-batches: events at 0,5,15
    assert s.n_events == 3
    dur_min = (s.session_end_us - s.session_start_us) / 60_000_000
    assert dur_min == pytest.approx(15.0)
