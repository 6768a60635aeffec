"""applyInPandasWithState streaming sessionization: in-batch closes,
timeout closes, open sessions withheld."""

from __future__ import annotations

from datetime import datetime, timezone

from rockefeller_spark import schema as S
from rockefeller_spark.stateful import sessionize_stream


def _ts(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s, tzinfo=timezone.utc)


def _row(lsn, conv, ts):
    return (lsn, "I", conv, 0, "user", "x", None, ts, ts)


def test_streaming_sessionize(spark, tmp_path):
    src = str(tmp_path / "src")
    gap = 1800  # 30 min
    # file 1: A has two events 10s apart; B one event
    f1 = [_row(1, "A", _ts(0, 0, 0)), _row(2, "A", _ts(0, 0, 10)),
          _row(3, "B", _ts(0, 5, 0))]
    # file 2: A again 2h later (closes A's first session in-batch);
    # C at 5h pushes the watermark so A2 and B close via timeout;
    # C itself stays open and must NOT be emitted
    f2 = [_row(4, "A", _ts(2, 0, 0)), _row(5, "C", _ts(5, 0, 0))]
    spark.createDataFrame(f1, S.CHANGE_EVENT_SCHEMA).coalesce(1) \
        .write.mode("overwrite").parquet(src + "/f=1")
    spark.createDataFrame(f2, S.CHANGE_EVENT_SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src + "/f=2")

    events = (spark.readStream.schema(S.CHANGE_EVENT_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(src + "/*"))
    sessions = sessionize_stream(events, gap_sec=gap)
    q = (sessions.writeStream.format("memory").queryName("sess")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()

    got = {(r.conv_id, r.session_start, r.session_end, r.n_events)
           for r in spark.sql("SELECT * FROM sess").collect()}
    naive = lambda h, m=0, s=0: _ts(h, m, s).replace(tzinfo=None)
    assert got == {
        ("A", naive(0, 0, 0), naive(0, 0, 10), 2),   # closed by next event
        ("A", naive(2, 0, 0), naive(2, 0, 0), 1),    # closed by timeout
        ("B", naive(0, 5, 0), naive(0, 5, 0), 1),    # closed by timeout
    }  # C's session is still open -> not emitted
