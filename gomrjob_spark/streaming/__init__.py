"""Structured Streaming operators (SURVEY.md §2F streaming row).

The reference processed logs as batch files over Hadoop Streaming; the
`_HEARTBEAT_` rows in its fixtures (mrproto/protocol_test.go:14) betray the
log-stream origin. The engine makes streams first-class: file-replay
sources, watermarked tumbling/sliding/session windows, streaming dedup,
and arbitrary stateful operators via applyInPandasWithState.
"""

from gomrjob_spark.streaming.ops import (  # noqa: F401
    bloom_dedup_gate_stream,
    charset_gate_stream,
    dsir_gate_stream,
    html_gate_stream,
    incremental_dedup_stream,
    kn_gate_stream,
    langid_gate_stream,
    mime_gate_stream,
    near_dup_probe_stream,
    near_dup_store_frames,
    near_dup_store_load,
    near_dup_store_write,
    outlier_flag_stream,
    paragraph_quarantine_stream,
    quality_gate_stream,
    read_documents_stream,
    read_embeddings_stream,
    read_events_stream,
    rewind_last_commit,
    robots_gate_stream,
    semdedup_gate_stream,
    run_to_memory,
    run_to_parquet,
    search_score_stream,
    session_windows,
    sliding_counts,
    stateful_user_counts,
    stream_static_join,
    stream_stream_interval_join,
    streaming_dedup,
    streaming_dedup_within_watermark,
    tumbling_counts,
    upsert_sink,
    url_gate_stream,
    wordpiece_drift_stream,
)
