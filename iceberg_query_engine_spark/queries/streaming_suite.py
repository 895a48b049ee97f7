"""Catalog adapter for the Structured Streaming jobs (streaming/jobs.py).

Each stream is driven to completion (availableNow) and compared to a
batch-equivalent DuckDB oracle — streaming results are exact, not
rows-only, because the full replay with complete/append mode is
deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..queries.dedup_suite import STREAM_SCRUB_SQL as _STREAM_SCRUB_SQL
from ..queries.events_suite import EV_ANOMALY_SQL as _EV_ANOMALY_SQL
from ..queries.events_suite import EV_EWMA_SQL as _EV_EWMA_SQL
from ..streaming import jobs, scrub, stateful

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "stream_tumbling": jobs.stream_tumbling,
    "stream_anomaly": jobs.stream_anomaly,
    "stream_ewma": jobs.stream_ewma,
    "stream_sliding": jobs.stream_sliding,
    "stream_join": jobs.stream_join,
    "stream_static_enrich": jobs.stream_static_enrich,
    "stream_sessionize": jobs.stream_sessionize,
    "stream_dedup": jobs.stream_dedup,
    "stream_upsert_iceberg": jobs.stream_upsert_iceberg,
    "stream_stateful_counts": stateful.stream_stateful_counts,
    "stream_dedup_pipeline": scrub.stream_dedup_pipeline,
}

ORACLE: dict[str, str] = {
    "stream_tumbling": jobs.STREAM_TUMBLING_SQL,
    "stream_anomaly": _EV_ANOMALY_SQL,
    "stream_ewma": _EV_EWMA_SQL,
    "stream_sliding": jobs.STREAM_SLIDING_SQL,
    "stream_join": jobs.STREAM_JOIN_SQL,
    "stream_static_enrich": jobs.STREAM_STATIC_ENRICH_SQL,
    "stream_sessionize": jobs.STREAM_SESSIONIZE_SQL,
    "stream_dedup": jobs.STREAM_DEDUP_SQL,
    "stream_upsert_iceberg": jobs.STREAM_UPSERT_ICEBERG_SQL,
    "stream_stateful_counts": stateful.STREAM_STATEFUL_SQL,
    "stream_dedup_pipeline": _STREAM_SCRUB_SQL,
}
