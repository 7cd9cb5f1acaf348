"""Structured Streaming surface tests (additive — reference has no
streaming, SURVEY §2.10). Uses a file stream over a temp parquet dir and
the memory sink; deterministic."""

import time

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:01", "2024-01-01 00:05", "2024-01-01 00:55",
                 "2024-01-01 01:40", "2024-01-01 00:07", "2024-01-01 02:00"]
            ),
            "user_id": [1, 1, 1, 1, 2, 2],
            "event_type": ["click", "view", "click", "view", "click", "view"],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(str(d / "data"))
    return str(d / "data")


def _run_stream(spark, stream_df, name, mode="complete"):
    from dask_sql_spark.streaming.core import memory_sink_query

    q = memory_sink_query(stream_df, name, output_mode=mode)
    q.processAllAvailable()
    out = spark.sql(f"SELECT * FROM {name}").collect()
    q.stop()
    return out


def test_windowed_counts(spark, stream_dir):
    from dask_sql_spark.streaming.core import windowed_counts

    src = spark.readStream.schema(
        "ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    ).parquet(stream_dir)
    agg = windowed_counts(src, window="1 hour", watermark="2 hours")
    rows = _run_stream(spark, agg, "win_counts")
    by_key = {(str(r.window_start), r.event_type): r.n for r in rows}
    assert by_key[("2024-01-01 00:00:00", "click")] == 3
    assert by_key[("2024-01-01 01:00:00", "view")] == 1


def test_sessionized(spark, stream_dir):
    from dask_sql_spark.streaming.core import sessionized

    src = spark.readStream.schema(
        "ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    ).parquet(stream_dir)
    sess = sessionized(src, gap="30 minutes")
    rows = _run_stream(spark, sess, "sessions")
    u1 = sorted(
        [(r.n_events, r.total_value) for r in rows if r.user_id == 1]
    )
    # user 1: (00:01,00:05) one session, 00:55 alone, 01:40 alone
    assert u1 == [(1, 3.0), (1, 4.0), (2, 3.0)]


def test_stream_dedup(spark, stream_dir):
    from dask_sql_spark.streaming.core import dedup_stream

    src = spark.readStream.schema(
        "ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE"
    ).parquet(stream_dir)
    dd = dedup_stream(src, ["user_id", "event_type"])
    rows = _run_stream(spark, dd, "dedup_out", mode="append")
    assert len(rows) == 4  # 2 users × 2 event types
