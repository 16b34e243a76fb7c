from .stream_queries import (
    stream_events,
    stream_session_windows,
    stream_sliding_counts,
    stream_tumbling_counts,
    stream_window_counts,
    stream_stateful_lww,
    stream_lww_tws,
    stream_late_data,
    stream_real_sstable_ingest,
    stream_sstable_ingest,
    stream_stream_join,
    streaming_dedup_keys,
)

__all__ = [
    "stream_events",
    "stream_session_windows",
    "stream_sliding_counts",
    "stream_tumbling_counts",
    "stream_window_counts",
    "stream_stateful_lww",
    "stream_lww_tws",
    "stream_late_data",
    "stream_real_sstable_ingest",
    "stream_sstable_ingest",
    "stream_stream_join",
    "streaming_dedup_keys",
]
