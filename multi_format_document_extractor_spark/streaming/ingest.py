"""Structured Streaming ingestion path.

The reference is strictly batch (SURVEY.md §2.9); the engine adds a
streaming variant of the batch windowed aggregation so a Common-Crawl-style
feed can be processed incrementally. Semantics are identical to the batch
``F.window`` form — the streaming query is verified against the same DuckDB
``time_bucket`` oracle as the batch one.

At cluster scale this would read a Kafka/file source with a watermark and
write Iceberg via foreachBatch (exactly-once through the same idempotent
append used by the batch sink); here the file source replays the driver's
events parquet in one availableNow pass.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_event_counts(events: DataFrame) -> DataFrame:
    """Batch form: 5-minute tumbling-window counts per event type."""
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
        )
    )


def _stage_dir(sf_dir: str) -> str:
    """The file stream source requires a directory basePath; stage the
    events parquet file into a per-sf temp dir (idempotent)."""
    import hashlib
    import shutil
    import tempfile

    src = os.path.join(sf_dir, "events.parquet")
    tag = hashlib.md5(src.encode()).hexdigest()[:8]
    d = os.path.join(tempfile.gettempdir(), f"mfde_stream_events_{tag}")
    dst = os.path.join(d, "events.parquet")
    if not os.path.exists(dst):
        os.makedirs(d, exist_ok=True)
        shutil.copy(src, dst)
    return d


def streaming_event_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming form: readStream over the events parquet → tumbling-window
    aggregation → in-memory sink, drained synchronously (availableNow).
    Returns the final result as a batch DataFrame."""
    name = f"evt_win_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(EVENTS_DDL).parquet(_stage_dir(sf_dir))
    agg = windowed_event_counts(stream)
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)
