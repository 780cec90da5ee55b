"""Structured Streaming surface (SURVEY.md §2.2 "Streaming").

The reference has no streaming — its closest analog is incremental
result collection over Dask futures (reference
src/cosmap/analysis/analysis.py:150-162).  Our engine exposes the events
table as a replayable file stream and provides the standard streaming
operator set: tumbling/sliding/session windows, watermarked late-data
handling, stateful dedup, watermarked stream-stream joins, and a custom stateful
operator via ``applyInPandasWithState``.  Batch twins of these aggregations live in
cosmap_spark/queries/streaming_q.py (the oracle can't run streams).
"""

from cosmap_spark.streaming.ops import (  # noqa: F401
    abtest_state,
    abtest_stream,
    category_drift_state,
    category_drift_stream,
    changepoint_stream,
    drift_alarms,
    drift_state,
    drift_stream,
    category_drift_chi2,
    enrich_with_dimension,
    events_stream,
    funnel_stream,
    heavy_hitters_stream,
    ks_state,
    ks_stream,
    monitor_report,
    store_health,
    mor_ingest_stream,
    mwu_state,
    quality_gate,
    reservoir_state,
    reservoir_stream,
    sketch_stream,
    session_counts,
    sliding_counts,
    stateful_user_counter,
    stateful_user_counter_tws,
    stream_stream_join,
    tumbling_counts,
    upsert_stream,
    windowed_dedup,
    write_incremental,
)
