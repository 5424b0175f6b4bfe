"""The streaming ops must produce the SAME result via readStream as via
the batch path — Structured Streaming incrementalizes the same plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_deepfakeanalysis_spark.catalog import table
from bigdata_deepfakeanalysis_spark.streaming.batch_equiv import (
    run_stream_once,
    stream_events,
    tumbling_counts,
)

from .conftest import SF_SMALL


def test_stream_matches_batch(spark):
    batch = tumbling_counts(table(spark, SF_SMALL, "events")).toPandas()

    stream = stream_events(spark, SF_SMALL)
    assert stream.isStreaming
    run_stream_once(tumbling_counts(stream), "tumbling_sink")
    streamed = spark.table("tumbling_sink").toPandas()

    key = ["win_start", "event_type"]
    b = batch.sort_values(key).reset_index(drop=True)
    s = streamed.sort_values(key).reset_index(drop=True)
    assert len(b) == len(s) > 0
    assert (b[key + ["n"]].values == s[key + ["n"]].values).all()
    assert (abs(b.sum_value - s.sum_value) < 1e-9).all()
